"""Log-domain math, vectorized with numpy.

Semantics mirror the reference's MathUtil (core/.../util/MathUtil.scala:9-57):
LOGZERO = -inf; ln(0) = -inf; lnsum = logaddexp skipping -inf operands;
lnproduct = plain sum (any -inf operand makes the product -inf).
"""

from __future__ import annotations

import numpy as np

LOGZERO = -np.inf


def ln(x):
    """Natural log with ln(0) == -inf, no warning (MathUtil.scala:22-27)."""
    x = np.asarray(x, dtype=np.float64)
    with np.errstate(divide="ignore"):
        return np.log(x)


def lnsum(a, b):
    """log(e^a + e^b); if either is -inf, returns the other (MathUtil.scala:29-41)."""
    return np.logaddexp(a, b)


def lnproduct(*terms):
    """Sum of log-terms; -inf propagates (MathUtil.scala:47-56)."""
    out = np.asarray(terms[0], dtype=np.float64)
    for t in terms[1:]:
        out = out + np.asarray(t, dtype=np.float64)
    return out


def lnsum_seq(values) -> float:
    """Fold lnsum over a sequence starting at LOGZERO (MathUtil.scala:43-45)."""
    acc = LOGZERO
    for v in values:
        acc = np.logaddexp(acc, v)
    return float(acc)


def logsumexp(values) -> float:
    """Numerically-stable log(Σ e^x) — breeze.linalg.softmax equivalent
    used by DBTwoStepDisambiguator.scala:194-201 for score normalization."""
    arr = np.asarray(list(values), dtype=np.float64)
    if arr.size == 0:
        return LOGZERO
    m = np.max(arr)
    if not np.isfinite(m):
        return float(m)
    return float(m + np.log(np.sum(np.exp(arr - m))))

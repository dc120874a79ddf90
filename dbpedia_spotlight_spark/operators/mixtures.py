"""Score mixtures (SURVEY.md §2.5 mixture row).

Column-expression builders replacing the reference's Mixture strategy
classes:
  * UnweightedMixture — sum of log features
    (disambiguate/mixtures/UnweightedMixture.scala:12-17); the default,
    inlined in operators/disambiguate.py
  * LinearRegressionMixture — the hard-coded trained weights
    (disambiguate/mixtures/LinearRegressionMixture.scala:15-50:
     6617.888·prior + 0.7886·ctx_norm + 0.2214)
  * OnlySimScoreMixture — context channel alone
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def unweighted_mixture(*log_features: Column) -> Column:
    """ln-product == sum of logs; -inf propagates (NIL gate relies on it)."""
    out = log_features[0]
    for fcol in log_features[1:]:
        out = out + fcol
    return out


def linear_regression_mixture(prior: Column, ctx_norm: Column) -> Column:
    """LinearRegressionMixture.scala:15-50 hard-coded coefficients."""
    return 6617.888 * prior + 0.7886 * ctx_norm + 0.2214


def only_sim_score_mixture(ctx_score: Column) -> Column:
    return ctx_score

"""Microbench: minhash-phase scaling (local[2] vs local[8]) across variants.

The scaling protocol's pair efficiency is ~the minhash phase (84% of lo
wall).  This isolates that phase and compares:

  A  baseline      — current xxhash64 explode+groupBy path, 8g heap
  B  heap24        — same plan, 24g driver heap (GC-frequency lever:
                     allocation rate at hi is 4x lo on a FIXED heap, so
                     GC pause share rises with parallelism)
  D  udfsig        — signature computed fully inside the Arrow kernel
                     (per-doc numpy min over a universal-hash family);
                     no explode, no JVM per-shingle hashing, no groupBy
                     shuffle — only the band-bucket join remains

Run:  python scripts/microbench_minhash.py [replicate] [variants...]
Prints one JSON line per (variant, level) and a final efficiency table.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module scope: pandas_udf resolves 'pd.Series' hints here

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_docs(spark, sf_dir: str, replicate: int, parts: int):
    from pyspark.sql import functions as F

    from dbpedia_spotlight_spark.plans import driver_queries as DQ

    base = DQ._docs(spark, sf_dir)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    variants = F.array(
        *[
            F.translate(F.col("text"), alpha, alpha[k:] + alpha[:k])
            for k in range(7)
        ]
    )
    docs = base.select(
        F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))).alias("rep"),
        "doc_id", "text", "source",
    ).select(
        F.concat_ws("-", "doc_id", "rep").alias("doc_id"),
        F.concat_ws(
            " ",
            F.element_at(variants, F.pmod(F.col("rep"), F.lit(7)) + 1),
            F.concat(F.lit("rep"), "rep"),
        ).alias("text"),
        "source",
    )
    docs = docs.repartition(parts * 2).cache()
    n = docs.count()
    return docs, n


def minhash_udfsig(docs, shingle_n=3, num_hashes=8, bands=4):
    """Variant D: full signature in the Arrow kernel, band join in SQL."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    import re

    split = re.compile(r"[^a-z0-9]+")
    _P = np.uint64(1000003)
    _EMPTY = int(
        pd.util.hash_array(np.array([""], dtype=object),
                           categorize=False)[0]
    )
    # universal-hash permutation family on uint64: h_i(g) = A_i*g + B_i
    # (odd A_i) — standard minwise estimator family
    rng = np.random.RandomState(0xC0FFEE)
    A = (rng.randint(1, 2**63, size=num_hashes).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
    B = rng.randint(0, 2**63, size=num_hashes).astype(np.uint64)

    @pandas_udf(ArrayType(LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        out = []
        with np.errstate(over="ignore"):
            for t in texts:
                toks = [w for w in split.split(t.lower()) if w] if t else []
                if not toks:
                    g = np.array([_EMPTY], dtype=np.uint64)
                else:
                    th = pd.util.hash_array(
                        np.array(toks, dtype=object), categorize=False
                    )
                    k = shingle_n if len(toks) >= shingle_n else len(toks)
                    g = th[: len(th) - k + 1].copy()
                    for j in range(1, k):
                        g = g * _P + th[j: len(th) - k + 1 + j]
                    g = np.unique(g)
                # (num_hashes, n_shingles) permuted, min along axis 1
                sig = (A[:, None] * g[None, :] + B[:, None]).min(axis=1)
                out.append(sig.view(np.int64).tolist())
        return pd.Series(out)

    rows_per_band = num_hashes // bands
    sig = docs.select(
        F.col("doc_id").alias("_id"), sig_udf(F.col("text")).alias("sig")
    )
    banded = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice(F.col("sig"), b * rows_per_band + 1,
                                    rows_per_band)
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")
    a = banded.select(F.col("_id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("_id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "band")
        .distinct()
    )


def run_one(variant: str, n_cores: int, sf_dir: str, replicate: int,
            parts: int) -> dict:
    from dbpedia_spotlight_spark.operators.dedup import (
        minhash_lsh_candidates,
    )
    from dbpedia_spotlight_spark.session import get_spark

    extra = {}
    want_gb = 8.0
    if "heap24" in variant:
        extra["spark.driver.memory"] = "24g"
        want_gb = 24.0
    spark = get_spark(
        app_name=f"mb-{variant}-{n_cores}",
        master=f"local[{n_cores}]",
        shuffle_partitions=parts,
        extra_conf=extra or None,
    )
    # Fail LOUDLY if the JVM heap is not what this variant's label claims.
    # The py4j gateway persists across spark.stop() within one Python
    # process, so spark.driver.memory on any session after the first is
    # silently ignored — a 'heap24' run after a 'baseline' run would
    # measure an 8g heap under a 24g label. Runtime.maxMemory() reads the
    # ACTUAL -Xmx (the conf would still claim the requested value), so
    # this check cannot be fooled by gateway reuse. maxMemory reports
    # slightly under -Xmx (survivor-space accounting) — accept 75-110%.
    actual_gb = (spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
                 .maxMemory()) / (1 << 30)
    if not (0.75 * want_gb <= actual_gb <= 1.10 * want_gb):
        spark.stop()
        raise RuntimeError(
            f"variant {variant!r} requested a {want_gb:g}g driver heap but "
            f"the JVM reports maxMemory={actual_gb:.2f}g — the py4j "
            "gateway was reused from an earlier session with a different "
            "heap. Run each variant in its own process (the default "
            "multi-variant invocation now does)."
        )
    docs, n = build_docs(spark, sf_dir, replicate, parts)
    # warm python workers outside the timed window
    if "udfsig" in variant:
        minhash_udfsig(docs.limit(512)).count()
    else:
        minhash_lsh_candidates(
            docs.limit(512), shingle_n=3, num_hashes=8, bands=4,
            hash_fn="xxhash64",
        ).count()
    t0 = time.time()
    if "udfsig" in variant:
        n_cand = minhash_udfsig(docs).count()
    else:
        n_cand = minhash_lsh_candidates(
            docs, shingle_n=3, num_hashes=8, bands=4, hash_fn="xxhash64"
        ).count()
    sec = round(time.time() - t0, 3)
    spark.stop()
    return {"variant": variant, "cores": n_cores, "sec": sec,
            "docs_per_sec": round(n / sec, 1), "n_docs": n,
            "n_cand": n_cand,
            "load1": open("/proc/loadavg").read().split()[0]}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    variants = sys.argv[2:] or ["baseline", "heap24", "udfsig"]
    if len(variants) > 1:
        # One fresh Python process per variant: the py4j gateway persists
        # across spark.stop(), so a second variant in the same process
        # inherits the first's JVM heap whatever its own conf requests
        # (run_one also asserts the actual heap, so a mislabeled run
        # fails loudly instead of recording wrong numbers).
        import subprocess

        results = []
        for v in variants:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 str(replicate), v],
                capture_output=True, text=True,
            )
            sys.stderr.write(proc.stderr)
            row = None
            for line in proc.stdout.splitlines():
                line = line.strip()
                if line.startswith("{") and "summary" not in line:
                    print(line, flush=True)
                    row = json.loads(line)
            if proc.returncode != 0 or row is None:
                raise RuntimeError(
                    f"variant {v!r} subprocess failed "
                    f"(rc={proc.returncode})"
                )
            results.append(row)
        print(json.dumps({"summary": results}), flush=True)
        return
    lo_n, hi_n = 2, 8
    parts = hi_n * 4
    results = []
    for v in variants:
        # ABA per variant: lo, hi, lo — score hi vs mean of the lo walls
        lo1 = run_one(v, lo_n, sf_dir, replicate, parts)
        hi = run_one(v, hi_n, sf_dir, replicate, parts)
        lo2 = run_one(v, lo_n, sf_dir, replicate, parts)
        lo_rate = (lo1["docs_per_sec"] + lo2["docs_per_sec"]) / 2
        eff = round(hi["docs_per_sec"] / lo_rate / (hi_n / lo_n), 3)
        row = {"variant": v, "lo1": lo1["sec"], "hi": hi["sec"],
               "lo2": lo2["sec"], "eff": eff,
               "hi_docs_per_sec": hi["docs_per_sec"],
               "n_cand": hi["n_cand"],
               "loads": [lo1["load1"], hi["load1"], lo2["load1"]]}
        print(json.dumps(row), flush=True)
        results.append(row)
    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()

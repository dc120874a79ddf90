"""Similarity search over embedding columns (driver mandate).

Two paths:
  * brute-force cosine top-k — the correctness baseline. All math stays
    JVM-side: F.zip_with products + F.aggregate sums; top-k via a
    window. Queries broadcast against the corpus (no O(n²) shuffle).
  * sign-LSH (random hyperplanes) — the scale path. Hyperplanes are a
    seeded numpy matrix broadcast to executors; bucket code computed in
    one Arrow-batched pandas UDF (matrix-vector product per batch);
    candidates are bucket-joined and exactly re-ranked by cosine. At
    10^12 rows the bucket join replaces the full cross product with
    ~n/2^bits-sized buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_expr(a, b):
    """cosine(a, b) as a pure column expression (0 when either is zero)."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(0.0)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query (self excluded when the
    ids collide). Queries are broadcast; corpus streams once."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# Above this row count, embedding_neardup(method="auto") switches from
# the exact O(n²) crossJoin to the banded sign-LSH bucket join. The exact
# path is the correctness baseline / oracle twin; at corpus scale nothing
# should ever run it (a 10^12-row cross product is 10^24 pairs).
NEARDUP_EXACT_MAX_ROWS = 100_000


def embedding_neardup_exact(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs near-dup: (id_a < id_b, cosine >= threshold).
    O(n²) by construction — small-N / oracle path only."""
    a = corpus.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_expr(F.col("va"), F.col("vb")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _band_codes_udf(planes_bc, n_bands: int, band_bits: int):
    from pyspark.sql.types import ArrayType

    @pandas_udf(ArrayType(IntegerType()))
    def codes(vectors: pd.Series) -> pd.Series:
        planes = planes_bc.value  # (n_bands*band_bits, dim)
        mat = np.stack(vectors.to_numpy())  # (batch, dim)
        signs = (mat @ planes.T > 0).reshape(-1, n_bands, band_bits)
        weights = 1 << np.arange(band_bits)
        band = (signs * weights).sum(axis=2).astype("int32")  # (batch, bands)
        return pd.Series([row.tolist() for row in band])

    return codes


def embedding_neardup_approx(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_bands: int = 8,
    band_bits: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_method: str = "udf",
    dim: int | None = None,
) -> DataFrame:
    """Banded sign-LSH near-dup: same output contract as the exact path
    but sub-quadratic — a pair is a candidate iff it agrees on ALL bits of
    at least one band (for cosine 0.9, p_bit ≈ 0.857: 8 bands × 4 bits
    give ≈ 0.998 recall), then candidates are exactly cosine-verified.

    Scale shape: one Arrow matrix product per batch for the band codes,
    an equi-join on (band, code) — bucket sizes ~n/2^band_bits per band —
    a distinct on the candidate pair, and an O(candidates) verify. No
    cross product anywhere.

    bucket_method: "udf" (Arrow matrix product — the fast path) or
    "expr" (pure column expressions over the same literal planes —
    bit-identical band codes, ANSI-SQL-expressible so the path can be
    hash-gated by the driver's DuckDB oracle, same discipline as
    lsh_topk).

    dim: embedding dimensionality. Pass it when known (it's fixed by the
    upstream embedding model) — the fallback sniffs one row, an extra
    tiny job per call."""
    spark = corpus.sparkSession
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = make_hyperplanes(dim, n_bands * band_bits, seed)
    base = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if bucket_method == "expr":
        codes = F.array(*[
            hyperplane_bucket_expr(
                F.col("v"),
                planes[b * band_bits:(b + 1) * band_bits],
            )
            for b in range(n_bands)
        ])
        coded = base.withColumn("codes", codes)
    else:
        planes_bc = spark.sparkContext.broadcast(planes)
        coded = base.withColumn(
            "codes",
            _band_codes_udf(planes_bc, n_bands, band_bits)(F.col("v")),
        )
    coded = coded.select(
        "_id", "v", F.posexplode("codes").alias("band", "code")
    )
    a = coded.select(
        F.col("_id").alias("id_a"), "band", "code"
    )
    b = coded.select(
        F.col("_id").alias("id_b"), "band", "code"
    )
    cand = (
        a.join(b, ["band", "code"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()  # a pair can collide in several bands — verify once
    )
    va = base.select(F.col("_id").alias("id_a"), F.col("v").alias("va"))
    vb = base.select(F.col("_id").alias("id_b"), F.col("v").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            cosine_expr(F.col("va"), F.col("vb")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_neardup(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
    exact_max_rows: int = NEARDUP_EXACT_MAX_ROWS,
    **approx_kw,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine) with
    cosine >= threshold.

    method: "auto" (default) runs the exact crossJoin up to
    `exact_max_rows` rows and the banded sign-LSH bucket join above it;
    "exact" / "lsh" force a path. The default is the size-gated routing —
    a user calling the near-dup API at corpus scale must never get the
    O(n²) plan (same discipline as operators/redirects.py and the
    dedup LSH family)."""
    if method == "exact":
        return embedding_neardup_exact(corpus, threshold, id_col, vec_col)
    if method == "lsh":
        return embedding_neardup_approx(
            corpus, threshold, id_col=id_col, vec_col=vec_col, **approx_kw
        )
    if method != "auto":
        raise ValueError(f"unknown method: {method!r}")
    # limit(k+1).count() — the gate only needs "is n above the cutoff",
    # so the probe stops scanning once k+1 rows are seen instead of
    # counting the full corpus (at 10^12 rows a full count is a real job)
    if corpus.limit(exact_max_rows + 1).count() <= exact_max_rows:
        return embedding_neardup_exact(corpus, threshold, id_col, vec_col)
    return embedding_neardup_approx(
        corpus, threshold, id_col=id_col, vec_col=vec_col, **approx_kw
    )


def make_hyperplanes(dim: int, n_bits: int = 12, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_bits, dim))


def hyperplane_bucket_expr(vec_col, planes: np.ndarray):
    """Sign-LSH bucket code as a pure column expression over a literal
    hyperplane matrix: bit j set iff dot(v, planes[j]) > 0.

    JVM-side twin of lsh_bucket_udf — bit-identical to it for the same
    planes, and expressible in ANSI SQL (list_dot_product in DuckDB), so
    the LSH path can be hash-gated by the driver's oracle."""
    bits = None
    for j, row in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in row])
        bit = F.when(_dot(vec_col, plane) > 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
        bits = bit if bits is None else bits + bit
    return bits.cast("int")


def lsh_bucket_udf(planes_bc):
    @pandas_udf(IntegerType())
    def bucket(vectors: pd.Series) -> pd.Series:
        planes = planes_bc.value  # (n_bits, dim)
        mat = np.stack(vectors.to_numpy())  # (batch, dim)
        signs = mat @ planes.T > 0  # (batch, n_bits)
        codes = (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1)
        return pd.Series(codes.astype("int32"))

    return bucket


# Hard ceiling on the inverted-list count: the centroid matrix lives on
# the driver and is broadcast to executors, so its footprint must stay
# bounded no matter how big the corpus is (65k lists x 4096-dim doubles
# = 2 GiB worst case; at the typical d<=1024 it is <=512 MiB). sqrt(n)
# only exceeds this above ~4.3e9 rows, where 65k lists still give
# ~n/65k-sized probe slices.
IVF_MAX_LISTS = 65_536


def ivf_topk(
    corpus: DataFrame,
    k: int = 10,
    n_lists: int | None = None,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate self top-k: partition vectors into inverted
    lists around sampled centroids (deterministic seed), probe the
    n_probe nearest lists per query, exact-cosine rerank inside probes.

    The scale path alongside sign-LSH: at 10^12 rows each list is a
    partition-pruned slice; centroid assignment is one Arrow-batched
    matrix product per batch. n_lists defaults to ~sqrt(n), capped at
    IVF_MAX_LISTS, so in-list work stays O(n^1.5) total instead of
    O(n²/const) with a fixed list count.

    Centroid selection is ENGINE-NEUTRAL and deterministic: the first
    n_lists vectors in md5(id || ':' || seed) hex order. md5 exists in
    every SQL engine (unlike xxhash64), so the whole algorithm — centroid
    CTE, nearest-list assignment, probe join, rerank — has a static
    ANSI-SQL twin and the driver's DuckDB oracle can hash-verify this
    path like any other gate. Centroid rows stream to the driver via
    toLocalIterator (bounded batches), never one big collect buffer.
    """
    spark = corpus.sparkSession
    base = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if n_lists is None:
        import math

        n_lists = max(1, min(int(math.isqrt(base.count())), IVF_MAX_LISTS))
    # deterministic engine-neutral centroid sample: first n_lists rows in
    # md5(id:seed) hex order (lowercase hex compares identically as a
    # string in Spark and DuckDB). Streamed, not collect()ed: the driver
    # holds exactly the (n_lists, dim) float64 matrix, nothing more.
    ordered = (
        base.withColumn(
            "_h",
            F.md5(F.concat(F.col("_id").cast("string"), F.lit(f":{seed}"))),
        )
        .orderBy("_h")
        .limit(n_lists)
        .select("v")
    )
    cmat = np.stack(
        [np.asarray(r["v"], dtype=np.float64)
         for r in ordered.toLocalIterator()]
    )  # (n_lists, dim)
    cmat /= np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12)
    cents_bc = spark.sparkContext.broadcast(cmat)

    def assign_udf(n: int):
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import ArrayType, IntegerType

        @pandas_udf(ArrayType(IntegerType()))
        def assign(vectors: pd.Series) -> pd.Series:
            c = cents_bc.value
            mat = np.stack(vectors.to_numpy())
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                               1e-12)
            sims = (mat / norms) @ c.T  # (batch, n_lists)
            # stable sort: cosine ties break toward the LOWER list id,
            # matching the SQL twin's ORDER BY sim DESC, list_id ASC
            top = np.argsort(-sims, axis=1, kind="stable")[:, :n]
            return pd.Series([row.astype("int32").tolist() for row in top])

        return assign

    # corpus side: each vector lives in its single nearest list
    listed = base.withColumn(
        "lists", assign_udf(1)(F.col("v"))
    ).select("_id", "v", F.explode("lists").alias("list_id"))
    # query side: probe the n_probe nearest lists
    probes = base.withColumn(
        "lists", assign_udf(n_probe)(F.col("v"))
    ).select(
        F.col("_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.explode("lists").alias("list_id"),
    )
    scored = (
        probes.join(
            listed.select(
                F.col("_id").alias("neighbor_id"),
                F.col("v").alias("cv"),
                "list_id",
            ),
            "list_id",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"),
        )
        # no distinct needed: a vector lives in exactly ONE inverted list,
        # so a (query, neighbor) pair meets at most once across probes
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_topk(
    corpus: DataFrame,
    k: int = 10,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_method: str = "udf",
    dim: int | None = None,
) -> DataFrame:
    """Approximate self top-k: bucket by hyperplane signs, exact cosine
    rerank within buckets. Recall < 1 by design (single probe).

    bucket_method: "udf" (Arrow-batched matrix product — the fast path at
    high dim) or "expr" (pure column expression — identical buckets,
    SQL-expressible for the correctness oracle).

    dim: embedding dimensionality. Pass it when known (it's fixed by the
    upstream embedding model) — the fallback sniffs one row."""
    spark = corpus.sparkSession
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = make_hyperplanes(dim, n_bits, seed)
    base = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if bucket_method == "expr":
        bucketed = base.withColumn(
            "bucket", hyperplane_bucket_expr(F.col("v"), planes)
        )
    else:
        planes_bc = spark.sparkContext.broadcast(planes)
        bucketed = base.withColumn(
            "bucket", lsh_bucket_udf(planes_bc)(F.col("v"))
        )

    a = bucketed.select(
        F.col("_id").alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    b = bucketed.select(
        F.col("_id").alias("neighbor_id"), F.col("v").alias("cv"), "bucket"
    )
    scored = (
        a.join(b, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )

"""Model build: training occurrences -> statistics DataFrames.

Spark-native re-expression of the reference's offline counting pipeline
(the external Pig jobs at bin/index_db.sh:185-193 plus
index/.../db/CreateSpotlightModel.scala:160-229, SURVEY.md §2.7):

    uriCounts        = occurrences.groupBy(uri).count()
    pairCounts       = occurrences.groupBy(sf, uri).count()
    sfAndTotalCounts = pairCounts Σ by sf  (+ seeded unlinked / lowercase)
    tokenCounts      = exploded context tokens groupBy(uri, token).count()

All aggregations are partial-aggregating groupBys (map-side combine is
automatic); redirect resolution and disambiguation-page removal are
broadcast joins. IDs are dense ranks over the sorted string domain so the
tables match the pure-Python oracle builder bit-for-bit.

Scale note: id assignment is the range-partitioned rank-stitch in
operators/ids.py (no single-partition window); fact-scale tables never
get global ids.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..fixtures.generator import MIN_SF_COUNT, MIN_TOKEN_COUNT
from ..functions.normalize import sf_normalize_expr
from ..functions.tokenize import tokenize_expr
from ..operators.ids import dense_ids
from ..operators.redirects import resolve_redirects_df


# A dimension table above this row count stops being FORCE-broadcast;
# the join is left to Catalyst/AQE (which falls back to shuffle-hash).
# ~5M rows ≈ a few hundred MB — the edge of sane executor broadcast.
BROADCAST_MAX_ROWS = 5_000_000


@dataclass
class ModelTables:
    surface_form_stats: DataFrame
    resources: DataFrame
    candidate_map: DataFrame
    tokens: DataFrame
    context_counts: DataFrame
    total_annotated_count: int
    total_token_count: int
    vocab_size: int
    broadcast_max_rows: int = BROADCAST_MAX_ROWS

    def dim_rows(self, name: str) -> int:
        """Row count of a model dimension, computed once and memoized
        (tables are cached via persist(), so the count is one cheap job)."""
        cache = self.__dict__.setdefault("_dim_rows", {})
        if name not in cache:
            cache[name] = getattr(self, name).count()
        return cache[name]

    def maybe_broadcast(self, df: DataFrame, size_of: str) -> DataFrame:
        """Broadcast-hint `df` only while the governing dimension
        (`size_of`) is small enough; above the threshold the plain frame
        is returned and AQE picks the join strategy at runtime. `df` may
        be a projection/aggregate of the named dimension — its row count
        is bounded by it."""
        if self.dim_rows(size_of) <= self.broadcast_max_rows:
            return F.broadcast(df)
        return df

    def persist(self) -> "ModelTables":
        """Cache every dimension table. The pipeline references each table
        from several joins; without caching, Catalyst re-expands the whole
        aggregation DAG at every reference (measured: 90 parquet scans in
        one annotate plan). The reference's analog is loading the stores
        into memory once (db/SpotlightModel.scala:36-62)."""
        for name in ("surface_form_stats", "resources", "candidate_map",
                     "tokens", "context_counts"):
            getattr(self, name).cache()
        return self


def _dense_id(df: DataFrame, order_col: str, id_col: str) -> DataFrame:
    return dense_ids(df, order_col, id_col)


def build_model(
    training: DataFrame,
    redirects: DataFrame,
    disambiguation_pages: DataFrame,
    unlinked_counts: DataFrame,
    lowercase_counts: DataFrame,
    stopwords: DataFrame,
    instance_types: DataFrame | None = None,
    stemmer: str | None = None,
) -> ModelTables:
    spark = training.sparkSession

    # 1. redirect closure + disambiguation-page removal
    occs = resolve_redirects_df(training, redirects)
    occs = occs.join(
        F.broadcast(disambiguation_pages), occs.uri == disambiguation_pages.uri,
        "left_anti",
    )
    occs = occs.cache()  # feeds four independent aggregations

    # 2. pairCounts c(sf, r)
    pair_counts = occs.groupBy("sf", "uri").agg(
        F.count("*").alias("pair_count")
    )

    # 3. sfAndTotalCounts with min-count pruning
    annotated = pair_counts.groupBy("sf").agg(
        F.sum("pair_count").alias("annotated_count")
    ).filter(F.col("annotated_count") >= MIN_SF_COUNT)
    sf_stats = (
        annotated.join(F.broadcast(unlinked_counts), "sf", "left")
        .join(
            F.broadcast(lowercase_counts),
            F.lower(annotated.sf) == lowercase_counts.sf_lower,
            "left",
        )
        .select(
            "sf",
            sf_normalize_expr(F.col("sf")).alias("sf_norm"),
            F.col("annotated_count").cast("long").alias("annotated_count"),
            (
                F.col("annotated_count")
                + F.coalesce(F.col("unlinked_count"), F.lit(0))
            ).cast("long").alias("total_count"),
            F.coalesce(F.col("lowercase_count"), F.lit(0))
            .cast("long").alias("lowercase_count"),
        )
    )
    sf_stats = _dense_id(sf_stats, "sf", "sf_id").select(
        "sf_id", "sf", "sf_norm", "annotated_count", "total_count",
        "lowercase_count",
    )

    # 4. uriCounts -> resources with global prior P(e)
    uri_counts = occs.groupBy("uri").agg(F.count("*").alias("support"))
    total_support = uri_counts.agg(F.sum("support")).collect()[0][0]
    if instance_types is not None:
        type_lists = instance_types.groupBy("uri").agg(
            F.array_sort(F.collect_set("type")).alias("types")
        )
        uri_counts = uri_counts.join(
            F.broadcast(type_lists), "uri", "left"
        ).withColumn(
            "types",
            F.coalesce(F.col("types"), F.array().cast("array<string>")),
        )
    else:
        uri_counts = uri_counts.withColumn(
            "types", F.array().cast("array<string>")
        )
    resources = _dense_id(uri_counts, "uri", "res_id").select(
        "res_id",
        "uri",
        F.col("support").cast("long").alias("support"),
        (F.col("support") / F.lit(float(total_support))).alias("prior"),
        "types",
    )

    # 5. candidate map keyed by ids
    candidate_map = (
        pair_counts.join(sf_stats.select("sf_id", "sf"), "sf")
        .join(resources.select("res_id", "uri"), "uri")
        .select(
            "sf_id", "res_id",
            F.col("pair_count").cast("long").alias("pair_count"),
        )
    )

    # 6. token vocabulary (stopwords dropped, min-count pruned). With a
    # stemmer configured (reference default "EnglishStemmer"), tokens are
    # Porter2-stemmed AFTER the stopword filter; Python cost is O(distinct
    # raw tokens) via the stem_tokens dictionary join, never O(corpus).
    sw = [r["word"] for r in stopwords.collect()]
    occ_tokens = occs.select(
        "uri",
        F.explode(tokenize_expr(F.col("context"))).alias("token"),
    ).filter(~F.col("token").isin(sw))
    if stemmer == "english":
        from ..functions.stem import stem_tokens

        occ_tokens = stem_tokens(occ_tokens, "token")
    elif stemmer is not None:
        raise ValueError(f"unsupported stemmer: {stemmer!r}")
    token_counts = occ_tokens.groupBy("token").agg(
        F.count("*").alias("count")
    ).filter(F.col("count") >= MIN_TOKEN_COUNT)
    tokens = _dense_id(token_counts, "token", "token_id").select(
        "token_id", "token", F.col("count").cast("long").alias("count")
    )

    # 7. per-resource context counts over the surviving vocabulary
    context_counts = (
        occ_tokens.groupBy("uri", "token").agg(F.count("*").alias("count"))
        .join(tokens.select("token_id", "token"), "token")
        .join(resources.select("res_id", "uri"), "uri")
        .select(
            "res_id", "token_id", F.col("count").cast("long").alias("count")
        )
    )

    totals = sf_stats.agg(F.sum("annotated_count")).collect()[0][0]
    tok_totals = tokens.agg(
        F.sum("count"), F.count("*")
    ).collect()[0]
    occs.unpersist()

    return ModelTables(
        surface_form_stats=sf_stats,
        resources=resources,
        candidate_map=candidate_map,
        tokens=tokens,
        context_counts=context_counts,
        total_annotated_count=int(totals),
        total_token_count=int(tok_totals[0]),
        vocab_size=int(tok_totals[1]),
    )


def model_from_fixture_dir(spark: SparkSession, fixture_dir: str,
                           persist: bool = True,
                           stemmer: str | None = None) -> ModelTables:
    """Build the model tables from a generated fixture parquet directory."""
    rd = lambda name: spark.read.parquet(f"{fixture_dir}/{name}.parquet")
    model = build_model(
        training=rd("training_occurrences"),
        redirects=rd("redirects"),
        disambiguation_pages=rd("disambiguation_pages"),
        unlinked_counts=rd("unlinked_counts"),
        lowercase_counts=rd("lowercase_counts"),
        stopwords=rd("stopwords"),
        instance_types=rd("instance_types"),
        stemmer=stemmer,
    )
    return model.persist() if persist else model

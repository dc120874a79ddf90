"""maybe_broadcast must hint small dimensions and leave oversized ones to
AQE (no ResolvedHint in the plan)."""

from pyspark.sql import functions as F

from dbpedia_spotlight_spark.plans.model_build import ModelTables


def _model(spark, max_rows):
    ctx = spark.createDataFrame(
        [(i, i, 1) for i in range(10)], "res_id int, token_id int, count long"
    )
    toks = spark.createDataFrame(
        [(i, f"t{i}", 1) for i in range(10)],
        "token_id int, token string, count long",
    )
    return ModelTables(
        surface_form_stats=None,
        resources=None,
        candidate_map=None,
        tokens=toks,
        context_counts=ctx,
        total_annotated_count=1,
        total_token_count=10,
        vocab_size=10,
        broadcast_max_rows=max_rows,
    )


def _has_hint(df) -> bool:
    return "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()


def test_small_dimension_gets_hint(spark):
    m = _model(spark, max_rows=1000)
    probe = spark.createDataFrame([(1, 1)], "res_id int, token_id int")
    joined = probe.join(
        m.maybe_broadcast(m.context_counts, "context_counts"),
        ["res_id", "token_id"],
        "left",
    )
    assert _has_hint(joined)


def test_oversized_dimension_left_to_aqe(spark):
    m = _model(spark, max_rows=5)  # context has 10 rows > 5
    probe = spark.createDataFrame([(1, 1)], "res_id int, token_id int")
    joined = probe.join(
        m.maybe_broadcast(m.context_counts, "context_counts"),
        ["res_id", "token_id"],
        "left",
    )
    assert not _has_hint(joined)


def test_dim_rows_memoized(spark):
    m = _model(spark, max_rows=5)
    assert m.dim_rows("context_counts") == 10
    # second call hits the memo (no way to observe the job count cheaply,
    # but the cached value must be stable)
    assert m.dim_rows("context_counts") == 10
    assert m.dim_rows("tokens") == 10

"""Redirect transitive closure.

Mirrors index/.../db/WikipediaToDBpediaClosure.scala:110-115 (follow
redirect chains to a fixpoint with a cycle guard). The redirects table is
a dimension table (~10^7 rows at full Wikipedia scale), so the faithful
Spark strategy is: collect → driver-side closure → broadcast map join.
Cycle members resolve deterministically to the lexicographically smallest
URI in the cycle (the reference raises and drops; we keep a stable id so
downstream clustering stays deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def close_redirects(redirect_pairs: dict[str, str]) -> dict[str, str]:
    """src -> final target for every src, chains followed to fixpoint."""
    resolved: dict[str, str] = {}
    for src in redirect_pairs:
        if src in resolved:
            continue
        chain = []
        seen: dict[str, int] = {}
        cur = src
        while cur in redirect_pairs and cur not in resolved and cur not in seen:
            seen[cur] = len(chain)
            chain.append(cur)
            cur = redirect_pairs[cur]
        if cur in resolved:
            final = resolved[cur]
        elif cur in seen:  # cycle: everything from seen[cur] onward loops
            cycle = chain[seen[cur]:]
            final = min(cycle)
            for node in cycle:
                resolved[node] = final
            chain = chain[: seen[cur]]
        else:
            final = cur
        for node in chain:
            resolved[node] = final
    return resolved


def resolve_uri_expr(spark, uri_col: Column, redirect_pairs: dict[str, str]) -> Column:
    """Broadcast map-join expression: uri -> closed redirect target."""
    closed = close_redirects(redirect_pairs)
    if not closed:
        return uri_col
    mapping = F.create_map(
        *[F.lit(x) for kv in closed.items() for x in kv]
    )
    return F.coalesce(mapping.getItem(uri_col), uri_col)


def resolve_redirects_df(occs: DataFrame, redirects: DataFrame,
                         uri_col: str = "uri_raw",
                         out_col: str = "uri") -> DataFrame:
    """Resolve a URI column through the closed redirect map (broadcast join).

    Uses an actual broadcast join rather than a literal map expression so
    the redirect table can be large (the map-literal form hits expression
    size limits beyond a few thousand entries).
    """
    pairs = {r["src_uri"]: r["dst_uri"] for r in redirects.collect()}
    closed = close_redirects(pairs)
    spark = occs.sparkSession
    if not closed:
        return occs.withColumn(out_col, F.col(uri_col))
    closure_df = spark.createDataFrame(
        list(closed.items()), schema="src_uri string, final_uri string"
    )
    return (
        occs.join(
            F.broadcast(closure_df),
            occs[uri_col] == closure_df["src_uri"],
            "left",
        )
        .withColumn(out_col, F.coalesce(F.col("final_uri"), F.col(uri_col)))
        .drop("src_uri", "final_uri")
    )

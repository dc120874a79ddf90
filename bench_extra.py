#!/usr/bin/env python
"""Extra benchmarks (guide §1.4): per-query noop-sink isolation + plan capture.

NOT the driver contract — bench.py is frozen for measurement. This file
exists so optimization work can time individual queries against the noop
sink (computation only, no sink cost), capture .explain("formatted")
output into plans/r06/, and run ad-hoc subsets without paying for the
whole headline list.

Usage:
  python bench_extra.py time  [query ...]   # noop-sink wall per query
  python bench_extra.py plan  [query ...]   # write plans/r06/<q>_<tag>.txt
  python bench_extra.py count [query ...]   # df.count() like bench.py

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32), PLAN_TAG (default "after") for plan file suffix,
BENCH_EXTRA_REPEATS (default 1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from dbpedia_spotlight_spark.plans import driver_queries as DQ
    from dbpedia_spotlight_spark.session import get_spark

    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:] or list(DQ.QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = int(os.environ.get("BENCH_EXTRA_REPEATS", "1"))
    tag = os.environ.get("PLAN_TAG", "after")

    spark = get_spark(app_name=f"bench-extra-{mode}",
                      master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    DQ.warm_session(spark, sf_dir)

    out: dict[str, list[float] | str] = {}
    for name in names:
        if mode == "plan":
            df = DQ.QUERIES[name](spark, sf_dir)
            os.makedirs("plans/r06", exist_ok=True)
            path = f"plans/r06/{name}_{tag}.txt"
            with open(path, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
            out[name] = path
            continue
        samples = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"{mode}:{name}")
            t0 = time.time()
            df = DQ.QUERIES[name](spark, sf_dir)
            if mode == "count":
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = samples
    print(json.dumps({"mode": mode, "sf_dir": sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()

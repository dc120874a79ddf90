#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total seconds), "unit": "sec",
"queries": {name: sec}, "sf", plus docs/sec throughput extras}.

Set BENCH_PROFILE=scaling to run the identical job at local[8] and
local[32] sequentially and report scaling efficiency (north_rule's
two-cluster-size evidence; see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "spot_exact_dict",
    "spot_fsa_dict",
    "prior_disambiguation",
    "er_clusters",
    "context_scores",
    "token_counts_stemmed",
    "connected_components",
    "dedup_exact",
    "dedup_minhash",
    "simhash_pairs",
    "ngram_jaccard",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "text_quality",
    "fingerprints",
]


def _load1() -> float:
    return float(open("/proc/loadavg").read().split()[0])


def _cpu_probe() -> float:
    """Wall time of a fixed single-thread workload (~0.1s on an idle
    core). load1 lags a minute and counts the bench's own decaying load,
    so it cannot distinguish 'our lo2 just finished' from 'a co-tenant is
    burning the box' — this probe runs while the bench is otherwise idle,
    so its stretch factor IS the instantaneous co-tenant pressure."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(2_000_000):
        acc += i * i
    return round(time.perf_counter() - t0, 4)


_PROBE_BASE: float | None = None


def _probe_base() -> float:
    """Per-process idle-probe calibration: min of a probe burst taken at
    startup. The sandbox migrates between hosts with very different
    single-thread clocks (run 23's host probed 0.11s idle; the run-24
    host probes ~0.26s at loadavg 0.03 with steal <0.2%), so an ABSOLUTE
    probe threshold misreads a slower-but-idle host as permanently
    hostile and parks every pair for the full gate timeout. The gate
    therefore compares each probe against this session's own baseline —
    a STRETCH factor — which measures contention, not clock speed. min()
    over the burst because co-tenant pressure only ever inflates the
    probe; the fastest observation is the closest to the bare clock."""
    global _PROBE_BASE
    if _PROBE_BASE is None:
        _PROBE_BASE = min(_cpu_probe() for _ in range(7))
    return _PROBE_BASE


def _wait_for_quiet(wait_load: float, max_wait_sec: float | None = None,
                    probe_max: float | None = None) -> None:
    """Optionally park until ambient load drops below wait_load (shared
    host: co-tenant load, not the plan, dominates loaded-window wall
    times). Bounded wait; proceeds regardless at the deadline.

    probe_max additionally gates on the instantaneous single-thread CPU
    probe (run 23's lesson: all four pairs started at load1 0.01-0.87 yet
    their per-job probes read 1.3-2.7x stretch — load1 lags a minute and
    simply cannot see a co-tenant that started seconds ago, while the
    probe measures the pressure NOW)."""
    if not wait_load and not probe_max:
        return
    if max_wait_sec is None:
        # default 15 min; overridable because "proceed regardless at the
        # deadline" is exactly how runs 22/25 started pairs inside
        # hostile ambient windows — a longer park is cheaper than a
        # polluted pair when wall-clock allows it
        max_wait_sec = float(os.environ.get("BENCH_WAIT_MAX", "900"))
    deadline = time.time() + max_wait_sec
    while time.time() < deadline:
        if wait_load and _load1() >= wait_load:
            time.sleep(30)
            continue
        # min of a short burst, not one probe: the first probe after an
        # idle sleep lands during the frequency governor's ramp-up and
        # reads 2-3x slow on an EMPTY box (measured 0.26-0.35s vs 0.11s
        # warm) — only sustained stretch across the burst is contention
        if probe_max and min(_cpu_probe() for _ in range(3)) >= probe_max:
            time.sleep(30)
            continue
        return


def run_once(master: str, sf_dir: str, shuffle_partitions: int) -> dict:
    from dbpedia_spotlight_spark.plans import driver_queries as DQ
    from dbpedia_spotlight_spark.session import get_spark

    # Bounded quiet gate for the OFFICIAL headline record (r3/r4 lesson:
    # the shared host's co-tenants inflated individual readings 5x; r4's
    # official run started at ambient load1 8 and read 26.2s for a
    # pipeline that measures 21.8s quiet). Wait up to
    # BENCH_HEADLINE_WAIT_MAX (default 300 s) for load1 below
    # BENCH_HEADLINE_WAIT_LOAD (default 4), then proceed regardless —
    # the gate trades bounded wall-clock for measuring the plan.
    # BENCH_HEADLINE_WAIT_LOAD=0 disables.
    gate_t0 = time.time()
    _wait_for_quiet(
        float(os.environ.get("BENCH_HEADLINE_WAIT_LOAD", "4")),
        max_wait_sec=float(os.environ.get("BENCH_HEADLINE_WAIT_MAX",
                                          "300")),
    )
    gate_waited = round(time.time() - gate_t0, 1)
    # clean ambient evidence: the per-query load1 samples below are taken
    # WHILE our own queries keep all cores busy (self-load dominates), so
    # the adjudicable co-tenant signal is the pre-session load/probe
    # (nothing of ours running yet) and the post-stop probe (python
    # workers and JVM threads gone)
    load_presession = _load1()
    probe_presession = _cpu_probe()
    spark = get_spark(
        app_name=f"bench-{master}",
        master=master,
        shuffle_partitions=shuffle_partitions,
    )
    n_docs = DQ._docs(spark, sf_dir).count()
    # warm the python workers (module imports, Arrow setup) and the shared
    # per-session gate inputs (corpus cache, context-model scaffolding)
    # outside the timed window — otherwise the one-time worker spinup
    # lands on whichever query hits a Python stage first (measured: 4.7s
    # vs 1.1s steady-state for the AC scan); workers are reused per
    # session
    DQ.warm_session(spark, sf_dir)
    timings: dict[str, float] = {}
    # ambient load1 observed right BEFORE each query starts — the shared
    # host's co-tenants can spike any individual timing (r3 recorded an
    # 8.3s reading for a query that re-measures at 1.6s on a quiet host),
    # so the official record carries the evidence to adjudicate that
    loads: dict[str, float] = {}
    t_all = time.time()
    for name in HEADLINE:
        loads[name] = _load1()
        t0 = time.time()
        df = DQ.QUERIES[name](spark, sf_dir)
        n = df.count()  # force full execution
        timings[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_all, 3)
    load_end = _load1()
    spark.stop()
    probe_end = _cpu_probe()
    return {
        "total_sec": total,
        "queries": timings,
        "n_docs": n_docs,
        "ambient_load1": loads,
        "ambient_load1_end": load_end,
        "gate_waited_sec": gate_waited,
        "ambient_load1_presession": load_presession,
        "cpu_probe_presession": probe_presession,
        "cpu_probe_end": probe_end,
        "cpu_probe_base": _probe_base(),
    }


def scaling_job(master: str, sf_dir: str, shuffle_partitions: int,
                replicate: int = 40) -> dict:
    """The two-parallelism scaling measure (north_rule evidence).

    One compute-bound pipeline run — AC spotting (pandas UDF), prior
    linking (broadcast joins + window), minhash signatures + bucket join,
    text quality/fingerprints — over the corpus replicated `replicate`x
    (~200k docs at sf0.1) so per-core work dominates fixed overheads.
    Identical input and plan at both parallelism levels; only the master
    and shuffle partitioning differ — the local-mode stand-in for N vs 4N
    executors.
    """
    from pyspark.sql import functions as F

    from dbpedia_spotlight_spark.operators.dedup import (
        minhash_lsh_candidates,
    )
    from dbpedia_spotlight_spark.operators.textstats import text_stats
    from dbpedia_spotlight_spark.plans import driver_queries as DQ
    from dbpedia_spotlight_spark.session import get_spark

    from pyspark.sql import Window

    from dbpedia_spotlight_spark.operators.spotting import (
        broadcast_automaton, build_automaton, spot_documents,
    )

    spark = get_spark(
        app_name=f"scaling-{master}",
        master=master,
        shuffle_partitions=shuffle_partitions,
        # 24g at BOTH levels (identical config; only the master differs).
        # The default 8g heap makes GC frequency scale with parallelism:
        # the allocation RATE at 4N threads is 4x, so on a fixed heap the
        # collector runs 4x as often and its pause share suppresses the
        # hi level only — a local-mode artifact, not a plan property (on
        # a real cluster total heap grows with executor count; a fixed
        # shared heap under-provisions hi relative to that). Measured
        # (scripts/microbench_minhash.py, 120x, quiet host): minhash
        # phase efficiency 0.655 -> 0.812 and hi wall 30.2s -> 25.4s
        # from the heap change alone. Runs >= 36 use this.
        extra_conf={
            "spark.driver.memory": os.environ.get("BENCH_DRIVER_MEM",
                                                  "24g"),
        },
    )
    base = DQ._docs(spark, sf_dir)
    # Replicas must be textually DISTINCT, not 20 near-identical copies:
    # appending one token leaves ~98% of shingles shared, so every LSH
    # bucket holds all replicas of a doc and the bucket self-join goes
    # quadratic — a blowup real corpora (rare near-dups) do not have.
    # Rotating the alphabet per replica (7 rotations x rep suffix) makes
    # replica shingles disjoint; rotation 0 keeps the dictionary words so
    # the spot/link phases still find mentions.
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
    n_docs = base.count() * replicate
    docs = docs.repartition(shuffle_partitions * 2).cache()
    docs.count()  # materialize input outside the timed window

    def spanize(d):
        return d.select(
            "doc_id",
            F.array(
                F.struct(
                    F.lit("text").alias("kind"), F.col("text").alias("text"),
                    F.lit("").alias("media_ref"),
                    F.lit(0).cast("int").alias("offset"),
                )
            ).alias("spans"),
        )

    ac_bc = broadcast_automaton(spark, build_automaton(DQ.DICTIONARY))
    # warm up every python worker (module imports) outside the timed
    # window: one spotter pass over the base corpus spread across the
    # full partition count
    spot_documents(
        spanize(
            base.select(F.col("doc_id").cast("string").alias("doc_id"),
                        "text").repartition(shuffle_partitions * 2)
        ),
        ac_bc,
    ).count()

    phases: dict[str, float] = {}
    t0 = time.time()
    mentions = spot_documents(spanize(docs), ac_bc).cache()
    n_mentions = mentions.count()
    phases["spot"] = round(time.time() - t0, 3)

    t1 = time.time()
    pc = docs.select(
        F.col("source").alias("uri"),
        F.explode(F.split("text", " ")).alias("sf"),
    ).filter(F.col("sf").isin(DQ.DICTIONARY)).groupBy("sf", "uri").count()
    best = pc.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("sf").orderBy(F.desc("count"), F.asc("uri"))
        ),
    ).filter(F.col("_rn") == 1).select("sf", "uri")
    n_linked = mentions.join(F.broadcast(best), "sf").count()
    phases["link"] = round(time.time() - t1, 3)

    t2 = time.time()
    text_stats(docs).agg(F.sum("n_tokens"), F.count("*")).collect()
    phases["textstats"] = round(time.time() - t2, 3)
    t3 = time.time()
    # xxhash64 = the LONG-typed production family (run >=27): the hex-md5
    # family is the DuckDB-oracle twin gated at sf0.01; at scale its
    # per-shingle string allocations make GC the shared bottleneck across
    # executor threads (phase scaled ~0.73 from 2->8 cores vs ~0.87 for
    # the allocation-light spot phase)
    n_cand = minhash_lsh_candidates(docs, shingle_n=3, num_hashes=8,
                                    bands=4, hash_fn="xxhash64").count()
    phases["minhash"] = round(time.time() - t3, 3)
    elapsed = time.time() - t0
    mentions.unpersist()
    spark.stop()
    return {
        "sec": round(elapsed, 3),
        # load observed when the timed window ends (the start-of-job load
        # is sampled by the caller): hostile mid-pair bursts — the one
        # failure mode the pair-start sample cannot see — become visible
        # per JOB, not just per pair
        "load1_end": _load1(),
        "probe": _cpu_probe(),
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / elapsed, 2),
        "n_mentions": n_mentions,
        "n_linked": n_linked,
        "n_minhash_candidates": n_cand,
        "phases": phases,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    profile = os.environ.get("BENCH_PROFILE", "")

    if profile == "scaling":
        # N vs 4N cores. The sandbox host is shared (ambient load shows in
        # /proc/loadavg with no local processes), so the defaults use the
        # lower 2-vs-8 pair where free cores are reliably available; set
        # BENCH_LO/BENCH_HI=8/32 to use the full machine when it is idle.
        lo_n = int(os.environ.get("BENCH_LO", "2"))
        hi_n = int(os.environ.get("BENCH_HI", str(lo_n * 4)))
        # replication so per-core work dominates fixed per-job overheads
        # (stage tails, action barriers); measured efficiency rises
        # monotonically with input size (20x: 0.66, 40x: 0.80, 60x:
        # 0.91) — the plateau, not the overhead, is the plan-shape
        # signal. 120x (~600k docs) since run 27: the xxhash64 minhash
        # kernel halved the pipeline wall, so the replicate doubles to
        # keep the lo-level job at the same ~2 min wall where the
        # plateau was measured
        rep = int(os.environ.get("BENCH_REPLICATE", "120"))
        # identical config (incl. shuffle partitioning) for both runs —
        # ONLY the master's core count differs (north_rule). The sandbox
        # host carries fluctuating ambient load from other tenants
        # (throughput at a fixed level swings ±40% across minutes), so
        # the lo/hi runs execute BACK-TO-BACK as pairs — each pair sees
        # similar ambient conditions and its ratio is stable — and the
        # reported number is the MEDIAN per-pair efficiency over
        # BENCH_TRIES pairs (default 3; median, not best-of).
        # 4 task waves per stage at the HI level (8 waves for the 2x
        # repartitioned input): a finer wave structure halves the
        # stage-tail share vs hi_n*2, the dominant residual inefficiency
        # (identical at both levels, so the ratio stays fair)
        parts = hi_n * 4
        tries = int(os.environ.get("BENCH_TRIES", "3"))
        factor = hi_n / lo_n
        # quiet-window gating for the SHARED host — ON BY DEFAULT for
        # official scaling runs since r4 (wait up to 15 min for ambient
        # load below BENCH_WAIT_LOAD before starting a pair; set
        # BENCH_WAIT_LOAD=0 to disable). The per-pair ambient load is
        # still recorded either way — this trades wall-clock for
        # measuring the plan, not the co-tenants.
        wait_load = float(os.environ.get("BENCH_WAIT_LOAD", "2"))
        # probe gate (default ON since run 24): also require the
        # single-thread CPU probe under BENCH_WAIT_PROBE_FACTOR x this
        # session's own idle baseline (default 1.3x stretch — the
        # baseline self-calibrates per host because the sandbox migrates
        # between machines with ~2.5x different single-thread clocks).
        # BENCH_WAIT_PROBE (absolute seconds) overrides if set;
        # BENCH_WAIT_PROBE=0 or _FACTOR=0 disables.
        probe_env = os.environ.get("BENCH_WAIT_PROBE")
        probe_factor = float(os.environ.get("BENCH_WAIT_PROBE_FACTOR",
                                            "1.3"))
        if probe_env is not None:
            probe_max = float(probe_env)
        elif probe_factor:
            probe_max = round(_probe_base() * probe_factor, 4)
        else:
            probe_max = 0.0
        # ABA sandwich (default ON since run 19): each trial runs
        # lo -> hi -> lo and scores the hi run against the MEAN of the
        # two surrounding lo rates. Ambient co-tenant load on this shared
        # host drifts on the minutes scale — exactly a pair's duration —
        # so a plain lo,hi pair aliases any monotone drift into the
        # ratio (run 18 recorded complementary 0.317 / 1.513 extremes
        # from one load flip). The sandwich interpolates the lo rate at
        # the hi run's midpoint, cancelling linear drift; both lo walls
        # and a load sample around every run are recorded so each pair
        # remains individually adjudicable.
        aba = os.environ.get("BENCH_ABA", "1") != "0"
        # process-level JIT warmup (runs >= 36): the FIRST pair of nearly
        # every earlier run read ~0.10 below the run's later pairs
        # (240x runs 30-35: first-pair median 0.744 vs 0.876 for later
        # pairs). Cause: all jobs share one JVM, and C2/codegen
        # compilation state accumulates across sessions — pair 1's lo2
        # runs JIT-warm while its hi is still part-cold, inflating the
        # ABA lo rate and deflating the ratio. Measured directly
        # (scripts/microbench_minhash.py): the hi job's wall drops
        # 10-16% between a process's first and second ABA sweep while
        # the lo walls move <2%. One throwaway lo+hi job at ~1/10 the
        # replicate warms the shared JVM so pair 1 measures the PLAN,
        # not compiler state. Prospective, like every protocol change.
        if os.environ.get("BENCH_WARMUP", "1") != "0":
            warm_rep = max(1, rep // 10)
            scaling_job(f"local[{lo_n}]", sf_dir, parts, warm_rep)
            scaling_job(f"local[{hi_n}]", sf_dir, parts, warm_rep)
        # lo-wall chaining (runs >= 37): consecutive pairs share the
        # boundary lo run — pair i's trailing lo2 becomes pair i+1's
        # leading lo — so every hi stays bracketed by two lo walls (the
        # sandwich's drift-cancellation is unchanged) while N pairs cost
        # N+1 lo walls instead of 2N (~5.5 min/pair marginal at 240x vs
        # ~9.8). Adjacent pair efficiencies share one lo sample — a mild
        # statistical coupling, disclosed here and in BASELINE.md; the
        # pooled median is robust to it. The chain BREAKS (fresh leading
        # lo) whenever the quiet gate actually parked: a reused lo would
        # predate the load excursion the gate just waited out.
        chain = aba and os.environ.get("BENCH_CHAIN", "1") != "0"
        # multi-hi grouping (runs >= 36): BENCH_GROUP=K runs K hi jobs
        # between each pair of lo walls and scores hi_i against the lo
        # rate LINEARLY INTERPOLATED at hi_i's wall-clock midpoint
        # between the two bracketing walls. At K=1 the midpoint sits
        # halfway between the walls, so the interpolation reduces to the
        # ABA sandwich's mean — same drift-cancellation, generalized.
        # With chaining, K pairs cost K hi + 1 lo marginally (~160 s at
        # 240x vs ~330 s), at the cost of K pairs sharing both walls
        # (coupling disclosed per pair via group_per_pair; the pooled
        # MEDIAN over many groups is robust to it). The linear-drift
        # window stretches from ~6 to ~8 min at K=3 / 240x — each hi
        # still carries its own load1/probe trace for adjudication.
        group_k = (max(1, int(os.environ.get("BENCH_GROUP", "1")))
                   if aba else 1)
        pairs = []
        prev_lo = None  # (job dict, wall-clock midpoint) of last lo wall
        done = 0
        group_idx = 0
        while done < tries:
            k = min(group_k, tries - done)
            gate_t0 = time.time()
            load_entry = _load1()
            _wait_for_quiet(wait_load, probe_max=probe_max)
            gate_waited = time.time() - gate_t0
            # chain-break budget: right after our OWN lo2 job, load1
            # carries a residue of ~1.9 that is a ghost of finished work,
            # decaying with the kernel's ~1-min time constant — a gate at
            # 0.8 parks ~60·ln(load/0.8) s on a genuinely idle box. Only
            # parking BEYOND that self-decay budget (+90 s slack for the
            # 30 s sleep granularity) indicates a real co-tenant
            # excursion the reused wall would predate.
            decay_budget = 90.0
            if wait_load and load_entry > wait_load:
                decay_budget += 60.0 * math.log(load_entry / wait_load)
            load1 = _load1()
            probe0 = _cpu_probe()
            # chain-break on DIRECT contention evidence (ADVICE r4): the
            # decay budget above cannot distinguish self-residue from a
            # co-tenant burst that ended just before the gate — but the
            # reused wall carries its OWN trace. Refuse reuse when the
            # prev lo2's post-job probe stretched beyond the quiet gate
            # (co-tenant CPU theft measured at the wall itself) or its
            # load1_end exceeded what the job's own cores plus the gate
            # headroom explain (clean post-lo2 residue reads ~lo_n).
            prev_lo_contended = False
            if prev_lo is not None:
                if probe_max and prev_lo[0].get("probe", 0.0) > probe_max:
                    prev_lo_contended = True
                if wait_load and (prev_lo[0].get("load1_end", 0.0)
                                  > lo_n + 1.0 + wait_load):
                    prev_lo_contended = True
            if (chain and prev_lo is not None and not prev_lo_contended
                    and gate_waited < decay_budget):
                lo, lo_mid = dict(prev_lo[0]), prev_lo[1]
                lo["chained_from_prev_pair"] = True
            else:
                t0 = time.time()
                lo = scaling_job(f"local[{lo_n}]", sf_dir, parts, rep)
                lo_mid = (t0 + time.time()) / 2
            his = []
            for _ in range(k):
                t0 = time.time()
                hi = scaling_job(f"local[{hi_n}]", sf_dir, parts, rep)
                his.append((hi, (t0 + time.time()) / 2))
            if aba:
                t0 = time.time()
                lo2 = scaling_job(f"local[{lo_n}]", sf_dir, parts, rep)
                lo2_mid = (t0 + time.time()) / 2
                prev_lo = (lo2, lo2_mid)
            for hi, hi_mid in his:
                lo_p = dict(lo)
                if aba:
                    span = lo2_mid - lo_mid
                    w = (min(1.0, max(0.0, (hi_mid - lo_mid) / span))
                         if span > 0 else 0.5)
                    lo_rate = (lo["docs_per_sec"] * (1 - w)
                               + lo2["docs_per_sec"] * w)
                    lo_p["docs_per_sec_second_lo"] = lo2["docs_per_sec"]
                    lo_p["sec_second_lo"] = lo2["sec"]
                    lo_p["lo_weight"] = round(w, 3)
                    # per-JOB load trace (group-start, after-lo, after-hi,
                    # after-lo2): a co-tenant burst confined to one job —
                    # invisible to the group-start sample — shows exactly
                    # where it landed (wall samples shared within a group)
                    job_loads = [load1, lo["load1_end"], hi["load1_end"],
                                 lo2["load1_end"]]
                    probes = [probe0, lo["probe"], hi["probe"],
                              lo2["probe"]]
                else:
                    lo_rate = lo["docs_per_sec"]
                    job_loads = [load1, lo["load1_end"], hi["load1_end"]]
                    probes = [probe0, lo["probe"], hi["probe"]]
                eff = (hi["docs_per_sec"] / lo_rate) / factor
                pairs.append((round(eff, 3), lo_p, hi, load1, _load1(),
                              job_loads, probes, group_idx))
            done += k
            group_idx += 1
        pairs.sort(key=lambda p: p[0])
        eff, lo, hi, _ld, _ld_end, _jl, _pr, _gi = pairs[len(pairs) // 2]
        out = {
            "metric": f"scaling_pipeline_sec_local{hi_n}",
            "value": hi["sec"],
            "unit": "sec",
            "queries": {f"pipeline_local{lo_n}": lo["sec"],
                        f"pipeline_local{hi_n}": hi["sec"],
                        **({f"pipeline_local{lo_n}_second": lo["sec_second_lo"]}
                           if "sec_second_lo" in lo else {})},
            "sf": sf,
            "n_docs": hi["n_docs"],
            f"docs_per_sec_local{lo_n}": lo["docs_per_sec"],
            f"docs_per_sec_local{hi_n}": hi["docs_per_sec"],
            f"scaling_efficiency_{lo_n}_to_{hi_n}": eff,
            "efficiency_per_pair": [p[0] for p in pairs],
            "ambient_load1_per_pair": [p[3] for p in pairs],
            "ambient_load1_per_pair_end": [p[4] for p in pairs],
            # [start, after-lo, after-hi, after-lo2] per pair
            "load1_per_job": [p[5] for p in pairs],
            # single-thread probe wall sec at [start, after-lo, after-hi,
            # after-lo2]: the instantaneous co-tenant pressure at each job
            # boundary (2x stretch vs cpu_probe_base = half the core was
            # stolen). cpu_probe_base is THIS host's idle calibration —
            # read stretch = probe / base, not the absolute seconds (the
            # sandbox migrates between hosts with ~2.5x clock spread).
            "cpu_probe_per_job": [p[6] for p in pairs],
            "cpu_probe_base": _probe_base(),
            "cpu_probe_gate": probe_max,
            "methodology": ("aba_chained" if chain else
                            "aba_sandwich" if aba else "lo_hi_pair"),
            # True where the pair's LEADING lo was the previous pair's
            # trailing lo (see chaining note above)
            "chained_per_pair": [bool(p[1].get("chained_from_prev_pair"))
                                 for p in pairs],
            # pairs sharing a group index share both lo walls (the
            # BENCH_GROUP coupling disclosed above); lo_weight is the
            # interpolation weight of the trailing wall at this hi's
            # midpoint (0.5 = classic sandwich mean)
            "group_k": group_k,
            "group_per_pair": [p[7] for p in pairs],
            "lo_weight_per_pair": [p[1].get("lo_weight") for p in pairs],
            "n_mentions": hi["n_mentions"],
            # per-phase wall at both levels for the MEDIAN pair, plus the
            # implied per-phase efficiency — pinpoints which stage of the
            # pipeline loses parallel efficiency instead of averaging the
            # loss across the whole run
            "phases_lo": lo.get("phases", {}),
            "phases_hi": hi.get("phases", {}),
            "phase_efficiency": {
                k: round(lo["phases"][k] / hi["phases"][k] / factor, 3)
                for k in lo.get("phases", {})
                if hi.get("phases", {}).get(k)
            },
        }
    else:
        # the bounded quiet gate + pre/post ambient probes live inside
        # run_once (BENCH_HEADLINE_WAIT_LOAD / _MAX control the gate)
        res = run_once(f"local[{cpus}]", sf_dir, int(cpus))
        out = {
            "metric": "headline_total_sec",
            "value": res["total_sec"],
            "unit": "sec",
            "queries": res["queries"],
            "sf": sf,
            "docs_per_sec": round(res["n_docs"] / res["total_sec"], 2),
            "ambient_load1": res["ambient_load1"],
            "ambient_load1_end": res["ambient_load1_end"],
            "gate_waited_sec": res["gate_waited_sec"],
            "ambient_load1_presession": res["ambient_load1_presession"],
            # single-thread probe wall sec before the session and after
            # spark.stop(): the per-query load1 above is self-contaminated
            # (our own 32 threads), so co-tenant pressure is adjudicated
            # from these two bracketing samples as stretch vs probe_base
            "cpu_probe_presession": res["cpu_probe_presession"],
            "cpu_probe_end": res["cpu_probe_end"],
            "cpu_probe_base": res["cpu_probe_base"],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark: index-build throughput (turns/sec) + query latencies.

Env:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  BENCH_TURNS          synthetic transcript turns for the build benchmark
                       (default 100_000)

Prints ONE JSON line:
  {"metric": ..., "value": <build seconds>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": ...,
   "build": {"turns": N, "turns_per_sec": ..., "postings_rows": ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_turns = int(os.environ.get("BENCH_TURNS", "100000"))

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"ex_elasticlunr_spark-bench-{cpus}")
        # shuffle partitions sized for TASK MEMORY, not core count: the
        # clustering sorts carry positions arrays, and at 2M turns a
        # cores-count partitioning puts ~1.4M array rows (hundreds of MB)
        # in each sort task — two overlapped cluster jobs then exceed the
        # execution-memory pool and every task spills, which measured as
        # 3-4x CPU inflation and NEGATIVE 4->16 scaling of the cluster
        # phase. 4x cores (>= 32) keeps per-task sort state ~tens of MB;
        # AQE's advisory size still coalesces the small stages.
        .config("spark.sql.shuffle.partitions",
                os.environ.get("BENCH_SHUFFLE_PARTS",
                               str(max(cpus * 4, 32))))
        .config("spark.sql.adaptive.enabled", "true")
        # save() overlaps independent stages from multiple threads; FAIR
        # lets the small stats/ordinals jobs interleave with the wide
        # ingest/cluster stages instead of queueing behind them (FIFO)
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "32g"))
        # many concurrent parquet writers in one local JVM thrash GC with
        # the default 128MB row-group buffer; 16MB keeps write scaling
        # linear (measured: 37.5s -> 8.2s for 11M rows at local[32])
        .config("spark.hadoop.parquet.block.size", "16777216")
        # AQE's 64MB advisory coalesce shrinks the segment-encode stage
        # below the core count at bench scale; 8MB keeps it CPU-bound
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # parquet scans bin-pack files to 128MB splits — at bench input
        # sizes that caps the flat-scan (cluster map side) and the
        # segment-encode stage at ~6-12 tasks REGARDLESS of core count,
        # flattening 4->16 scaling; 16MB splits (= the parquet row-group
        # size above) keep scan stages at >= core-count tasks. At real
        # 100TB scale the default is fine — files outnumber cores.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        # the sandbox VM's virtio disk has multi-second latency spikes
        # (load-average inflation with idle CPUs); shuffle spill to
        # tmpfs isolates the CPU/parallelism scaling we are measuring
        .config("spark.local.dir", os.environ.get(
            "BENCH_LOCAL_DIR",
            "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ex_elasticlunr_spark import Index
    from ex_elasticlunr_spark.sources.transcripts import (
        distributed_transcripts_df,
        with_docid,
    )
    import __spark_entry__ as entry_mod

    # ---- index-build throughput over synthetic transcripts --------------
    # timed region = build + WRITE the durable index (the spark-submit
    # job's work), then reload for serving — not an in-memory cache fill
    import shutil
    import tempfile

    def cpu_times():
        # host-wide jiffies from /proc/stat: (busy=user+nice+system,
        # idle+iowait, steal). Steal during the timed region exposes
        # hypervisor contention — the sandbox VM shows episodic phases
        # where every Spark stage uniformly slows 5-15x while pinned
        # CPU/memory-bandwidth probes run clean between episodes.
        with open("/proc/stat") as f:
            p = f.readline().split()[1:]
        u, n, s, i, w, irq, sirq, st = (int(x) for x in p[:8])
        return u + n + s, i + w, st

    n_convs = max(n_turns // 8, 1)
    tx = with_docid(
        distributed_transcripts_df(spark, n_convs, turns_per_conv=8,
                                   partitions=max(cpus, 8) * 2)
    )
    tx = tx.persist()
    actual_turns = tx.count()  # materialize input outside the timed region

    bench_tmp = os.environ.get(
        "BENCH_TMPDIR",
        "/dev/shm" if os.path.isdir("/dev/shm") else None)
    out_dir = tempfile.mkdtemp(prefix="bench_index_", dir=bench_tmp)
    stage_timings = {}
    cpu0 = cpu_times()
    t0 = time.perf_counter()
    idx = Index(name="bench").add_field("text").add_field("tool")
    # transcripts key on (conv_id, turn_idx) -> docids unique by
    # construction; skip the duplicate-guard full-text shuffle
    idx.add_documents(tx, docid_col="docid", dedupe=False)
    idx.inverted.save(out_dir, timings=stage_timings)
    build_sec = time.perf_counter() - t0
    cpu1 = cpu_times()
    hz = os.sysconf("SC_CLK_TCK")
    ncpu_host = os.cpu_count() or 1
    wall_jiffies = max(build_sec * hz * ncpu_host, 1.0)
    host_cpu = {
        # fraction of ALL host cpu-time in the timed region (this run is
        # pinned to `cpus` cores, so busy_frac ~ cpus/ncpu_host when the
        # host is quiet and the job is CPU-saturated)
        "busy_frac": round((cpu1[0] - cpu0[0]) / wall_jiffies, 4),
        "steal_frac": round((cpu1[2] - cpu0[2]) / wall_jiffies, 4),
        # absolute busy CPU seconds over the whole timed build — the
        # scaling criterion's cpu-time denominator (turns / cpu-sec is
        # parallelism-overhead-sensitive but DRAM/noise-stall-blind,
        # complementing wall-clock efficiency)
        "build_cpu_sec": round((cpu1[0] - cpu0[0]) / hz, 2),
    }

    idx = Index.load(spark, out_dir, name="bench")
    idx.inverted.term_stats.cache().count()
    idx.inverted.field_stats.cache().count()
    idx.inverted.docs.cache().count()
    postings_rows = idx.inverted.postings.count()

    # ---- query latencies -------------------------------------------------
    queries = {}

    def timed(name, fn):
        t = time.perf_counter()
        fn()
        queries[name] = round(time.perf_counter() - t, 4)

    if os.environ.get("BENCH_SKIP_QUERIES"):
        out = {
            "metric": "index-build turns/sec (local[%d])" % cpus,
            "value": round(build_sec, 4),
            "unit": "sec",
            "queries": {},
            "sf": sf_dir,
            "cpus": cpus,
            "build": {
                "turns": actual_turns,
                "build_sec": round(build_sec, 4),
                "turns_per_sec": round(actual_turns / build_sec, 2),
                "postings_turns_per_sec": round(
                    actual_turns
                    / stage_timings.get("postings_write_sec", build_sec), 2),
                "stages": stage_timings,
                "host_cpu": host_cpu,
                "postings_rows": postings_rows,
            },
        }
        print(json.dumps(out))
        shutil.rmtree(out_dir, ignore_errors=True)
        return

    timed("q1_bm25_topk", lambda: idx.search_bm25(
        "elixir tool run quick", top_k=10).collect())
    timed("q2_match_and", lambda: idx.search(
        {"query": {"match": {"text": {"query": "elixir tool",
                                       "operator": "and"}}}},
        top_k=10).collect())
    # full bool shape: since the negative-clause WAND landed, search()
    # auto-routes must+must_not+should (must -> required clause,
    # must_not -> pruning-exempt negative clause) — measured ~2x the
    # exhaustive plan, rank-identical (EX_SPARK_NO_WAND_ROUTE compares)
    timed("q3_bool", lambda: idx.search(
        {"query": {"bool": {"must": {"match": {"text": "elixir"}},
                              "must_not": {"match": {"text": "dog"}},
                              "should": [{"match": {"tool": "search"}}]}}},
        top_k=10).collect())
    timed("q4_expand", lambda: idx.search(
        {"query": {"terms": {"text": {"value": "pro", "expand": True}}}},
        top_k=10).collect())
    timed("q5_fuzzy", lambda: idx.search(
        {"query": {"terms": {"text": {"value": "elixor", "fuzziness": 1}}}},
        top_k=10).collect())
    # block-max WAND fast path (first call: binds the durable segments
    # written by save() — codec v2 reads, no re-encode)
    timed("q6_wand_build_and_query", lambda: idx.search_wand(
        "elixir tool run quick", "text", top_k=10).collect())
    timed("q7_wand_warm", lambda: idx.search_wand(
        "index search stream", "text", top_k=10).collect())
    # positional path on the LOADED index: scans the term-clustered
    # positions table with the pushed In(term, ...) predicate (v5)
    timed("q8_phrase", lambda: idx.search(
        {"query": {"match_phrase": {"text": "elixir tool"}}},
        top_k=10).collect())
    # selective phrase: the terms' summed df fits under
    # PHRASE_DRIVER_MAX_ROWS, so this rides the driver-serve fast path
    # (one Arrow collect of the pruned positions scan + numpy adjacency)
    # instead of the checkpoint/agg pipeline q8's high-df terms require
    timed("q8b_phrase_selective", lambda: idx.search(
        {"query": {"match_phrase": {"text": "compress ipsum"}}},
        top_k=10).collect())
    # q2's query shape on the WAND fast path: operator="and" rides the
    # block-granular coverage prune (every term must be present at the
    # doc's block_id) instead of the exhaustive msm plan
    timed("q9_wand_and", lambda: idx.search_wand(
        "elixir tool", "text", top_k=10, mode="elasticlunr",
        operator="and").collect())
    # q1's query shape (the bare string-search sugar, every field) on
    # the multi-field WAND fast path: one segments pass, clause sums
    timed("q10_wand_text", lambda: idx.search_wand_text(
        "elixir tool run quick", top_k=10).collect())
    # q3's bool shape WITHOUT must_not auto-routed through the
    # required-clause WAND (must -> required clause, shoulds optional);
    # compare against q3 (must_not keeps it on the exhaustive plan)
    timed("q11_wand_bool", lambda: idx.search(
        {"query": {"bool": {"must": {"match": {"text": "elixir"}},
                              "should": [{"match": {"tool": "search"}}]}}},
        top_k=10).collect())

    # sf-dir operator benches (documents/embeddings tables); skippable
    # for build-scaling runs (BENCH_SKIP_SF=1)
    if not os.environ.get("BENCH_SKIP_SF"):
        q = entry_mod.queries()
        # the shared per-sf-dir index cache fills on first use; time the
        # one-time build+materialize as ITS OWN line so the first sf
        # query measures the query, not the cache fill
        timed("sf_index_build", lambda: entry_mod._index(spark, sf_dir))
        # match_phrase on the documents corpus exercises the
        # conjunctive phrase route (docs-with-all-terms driver serve /
        # pruned distributed) that the transcripts corpus' dense
        # vocabulary keeps off — the twin of q8 the router chooses on
        # selective conjunctions
        for name in ("match_or", "bm25_topk", "search_many",
                     "match_phrase", "dedup_minhash_lsh",
                     "ann_brute_topk", "text_quality"):
            timed(f"sf_{name}", lambda n=name: q[n](spark, sf_dir).collect())

    # ---- top-10 rank-identity rates over the reference query set on a
    # transcripts corpus: engine results vs the pure-Python oracle
    # (tests/oracle/core.py). "bm25" is the BASELINE.json headline
    # metric (BM25 top-10 rank-identity); "elasticlunr" is reference-
    # formula parity (tf*idf^2*flnorm, the reference's own scorer). The
    # full per-query assertions live in tests/test_spark_engine.py and
    # tests/test_random_queries.py; here the RATES are measured so every
    # BENCH_r{N}.json carries them.
    rank_identity = None
    if not os.environ.get("BENCH_SKIP_RANK"):
        try:
            from tests.oracle import OracleIndex
            from tests.oracle.core import search as oracle_search
            from tests.oracle.query_set import (
                TRANSCRIPT_QUERIES,
                reference_query_set,
            )
            from ex_elasticlunr_spark.sources.transcripts import transcripts_df

            t_ri = time.perf_counter()
            src = with_docid(transcripts_df(spark, n_convs=60,
                                            turns_per_conv=5))
            ridx = Index(name="rank_id").add_field("text").add_field("tool")
            ridx.add_documents(src, docid_col="docid", dedupe=False)
            ridx.materialize()
            oidx = OracleIndex().add_field("text").add_field("tool")
            oidx.add_documents(
                [{"id": r["docid"], "text": r["text"], "tool": r["tool"]}
                 for r in src.select("docid", "text", "tool").collect()])

            qset = reference_query_set("text") + TRANSCRIPT_QUERIES
            rank_identity = {}
            for mode, oview in (("bm25", oidx.bm25()),
                                ("elasticlunr", oidx)):
                t_m = time.perf_counter()
                matched = 0
                for qd in qset:
                    got = [(r["docid"], r["score"])
                           for r in ridx.search(qd, top_k=10,
                                                mode=mode).collect()]
                    want = [(r["ref"], r["score"])
                            for r in oracle_search(oview, qd, top_k=10)]
                    ok = ([g[0] for g in got] == [w[0] for w in want]
                          and all(abs(g[1] - w[1]) <= 1e-9
                                  for g, w in zip(got, want)))
                    matched += int(ok)
                rank_identity[mode] = {
                    "rate": round(matched / len(qset), 4),
                    "matched": matched,
                    "queries": len(qset),
                    "top_k": 10,
                    "sec": round(time.perf_counter() - t_m, 2),
                }
            rank_identity["sec"] = round(time.perf_counter() - t_ri, 2)
        except ImportError:
            # tests/ not shipped alongside bench.py in this deployment
            rank_identity = None

    shutil.rmtree(out_dir, ignore_errors=True)
    out = {
        "metric": "index-build turns/sec + query sec (local[%d])" % cpus,
        "value": round(build_sec, 4),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "cpus": cpus,
        "rank_identity": rank_identity,
        "build": {
            "turns": actual_turns,
            "build_sec": round(build_sec, 4),
            "turns_per_sec": round(actual_turns / build_sec, 2),
            "postings_turns_per_sec": round(
                actual_turns / stage_timings.get("postings_write_sec", build_sec), 2),
            "stages": stage_timings,
            "host_cpu": host_cpu,
            "postings_rows": postings_rows,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())

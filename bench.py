"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

The extraction queries synthesize their transcript corpus shard-locally
(deterministic, seeded by conv/turn — TESTDATA seed discipline), so the
benchmark measures the full scan→classify→extract→aggregate path.
Extra keys: turns/sec for the extraction headline (the north metric) and
corpus sizes.  Scaling-efficiency evidence (N vs 4N cores) is produced by
tools/scaling_bench.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from mineru_spark.pipeline import get_spark, synthesize_transcripts
    import __spark_entry__ as em

    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.1

    spark = get_spark(app="mineru_spark_bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    queries = em.queries()
    bench_names = [
        "q01_pricing_summary", "q05_nation_revenue", "q_sessionize_events",
        "q_asof_prior_view", "q_window_top_order_per_cust",
        "q_minhash_lsh_buckets", "q_simhash", "q_jaccard_pairs",
        "q_embed_cosine_topk", "x_docwrap_roundtrip",
    ]

    timings: dict[str, float] = {}
    for name in bench_names:
        t0 = time.perf_counter()
        _force(queries[name](spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    # extraction headline (north metric): materialize the deterministic
    # corpus once, then time the scan→classify→extract path — the shape of
    # the real job (Iceberg scan → extraction), not corpus synthesis.
    from mineru_spark.datagen.transcripts import n_convs_for_sf
    import hashlib
    import mineru_spark.datagen.transcripts as dgmod
    gen_ver = hashlib.md5(open(dgmod.__file__, "rb").read()).hexdigest()[:8]
    n_convs = n_convs_for_sf(sf)
    corpus = os.path.join(
        os.environ.get("SPARK_GRAFT_TMP", "/tmp"),
        f"mineru_spark_bench_corpus_sf{sf}_{gen_ver}")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        synthesize_transcripts(spark, n_convs).write \
            .mode("overwrite").parquet(corpus)
        # flush dirty pages NOW: ~GB of async writeback otherwise
        # competes with the timed reps' reads (measured 2-3x inflation
        # on the first post-materialization rep)
        os.sync()
    src = spark.read.parquet(corpus)
    n_turns = src.count()
    # measured optimum for 10-100 KB payload rows (BENCH/BASELINE.md)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "32")
    # warm-up (page cache + python workers), then best of 3 timed reps —
    # sandbox timing noise is ±30% cold vs warm and the shared host loads
    # up unpredictably.  The timed shape is the SHIPPED pipeline —
    # extract_finalized(...) (single fused kernel pass + cross-turn
    # finalize), exactly what queries()['x_transcripts_extract'] serves —
    # not the cheaper bare extract (round-2 review #3).
    from mineru_spark.pipeline import extract_finalized
    # full-file page-cache warm (JVM-only column read touches every
    # parquet byte; limit(2000) alone leaves the tail cold), then a
    # kernel warm-up for python workers + JIT
    src.selectExpr("sum(length(text))").collect()
    _force(extract_finalized(src.limit(2000)))
    dt = None
    for _ in range(3):
        t0 = time.perf_counter()
        _force(extract_finalized(src))
        rep = time.perf_counter() - t0
        dt = rep if dt is None else min(dt, rep)
    timings["x_transcripts_extract"] = round(dt, 3)
    turns_per_sec = round(n_turns / dt, 1)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extraction_turns": n_turns,
        "extraction_turns_per_sec": turns_per_sec,
        "cpus": CPUS,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

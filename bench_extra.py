"""Optimization-round isolation bench (guide §1.4): times individual
queries with the noop sink in a fresh session shaped exactly like
bench.py's (local[$SPARK_GRAFT_CPUS], shuffle=cpus), labels jobs, and
optionally dumps .explain("formatted") to plans/.

Usage:
  python bench_extra.py q01_pricing_summary [more ...] [--reps 3] [--plan out.txt]
  python bench_extra.py --all            # every bench.py headline query

bench.py itself is FROZEN for driver measurement; numbers cited in
OPTIMIZATION_r06.md for single-query experiments come from here.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_NAMES = [
    "q01_pricing_summary", "q05_nation_revenue", "q_sessionize_events",
    "q_asof_prior_view", "q_window_top_order_per_cust",
    "q_minhash_lsh_buckets", "q_simhash", "q_jaccard_pairs",
    "q_embed_cosine_topk", "x_docwrap_roundtrip",
]


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    args = [a for a in sys.argv[1:]]
    reps = 3
    plan_out = None
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1]); del args[i:i + 2]
    if "--plan" in args:
        i = args.index("--plan")
        plan_out = args[i + 1]; del args[i:i + 2]
    names = BENCH_NAMES if "--all" in args else args

    from mineru_spark.pipeline import get_spark
    import __spark_entry__ as em

    spark = get_spark(app="bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    queries = em.queries()

    out = {}
    for name in names:
        samples = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.perf_counter()
            _force(queries[name](spark, SF_DIR))
            samples.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = samples
        if plan_out:
            df = queries[name](spark, SF_DIR)
            with open(plan_out if len(names) == 1
                      else plan_out.replace(".txt", f"_{name}.txt"),
                      "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
        print(json.dumps({name: samples}), flush=True)
    print(json.dumps({"all": out, "sf_dir": SF_DIR, "cpus": CPUS}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf"}.

Execution is measured with the `noop` sink — full plan execution on
executors, no driver-side result transfer. One small warmup query
first so JVM/JIT/codegen warmup isn't billed to the first headline
query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from azure_data_engineering_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q_top_orders",
    "q_orders_per_nation",
    "q_broadcast_join",
    "q_upsert_merge",
    "q_window_running",
    "q_sessionize",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_ngram_jaccard",
    "q_embedding_topk",
    "q_text_stats",
    "q_multimodal_meta",
    "q_stream_tumbling",
    "q_tpch_q5_style",
    "q_grouped_map",
    "q_user_profile_builtin",
    "q_salted_agg",
    "q_ann_lsh",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # warmup: JIT, parquet footers, shuffle machinery, Python workers
    # (mapInPandas fork+Arrow init is ~10s once, reused afterwards)
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    qs["q_multimodal_meta"](spark, sf_dir).limit(10).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        # best of 2: the first run pays one-off plan compilation /
        # codegen; steady-state throughput is what scales to the
        # cluster. Construction is timed too — q_stream_tumbling
        # executes its streaming query inside the constructor.
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Time individual queries with the bench methodology (noop sink,
best-of-N, warm session) without running the whole suite.

Usage: python tools/time_queries.py [--runs N] q_a q_b ...
Prints one JSON line {query: best_sec, ..., "_canary_spark": sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from azure_data_engineering_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    runs = 2
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time-queries")
    # warmup: small query so JVM/codegen warmup isn't billed to query 1
    entrymod.q1_pricing_summary(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    import bench

    out = {"_canary_spark": round(bench._canary_spark(spark), 3)}
    for name in args:
        spark.sparkContext.setJobDescription(name)
        best = None
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                getattr(entrymod, name)(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
            out[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001
            out[name] = f"ERROR {type(exc).__name__}: {exc}"[:200]
        spark.sparkContext.setJobDescription(None)
    out["_canary_spark_end"] = round(bench._canary_spark(spark), 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Capture .explain("formatted") for named queries into plans/<dir>/.

Usage: python tools/capture_plans.py <outdir> <query> [query ...]
       python tools/capture_plans.py <outdir> --headline   (all bench HEADLINE)

Writes plans/<outdir>/<query>_<suffix>.txt where suffix is the last
path component of <outdir> convention-free; callers pass e.g.
plans/r12 and files land as <query>_before.txt / _after.txt depending
on --suffix (default "before").

Plan capture is driver-side only (no job execution) EXCEPT for queries
whose builder itself runs jobs (streaming gates, persisted-artifact
builders); those still terminate quickly at sf0.001.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from azure_data_engineering_spark.session import get_spark


def main() -> int:
    outdir = sys.argv[1]
    suffix = "before"
    args = sys.argv[2:]
    if args and args[0] == "--suffix":
        suffix = args[1]
        args = args[2:]
    if args and args[0] == "--headline":
        import bench

        names = list(bench.HEADLINE)
    else:
        names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture-plans")
    failed = []
    for name in names:
        try:
            df = getattr(entrymod, name)(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: {exc}", file=sys.stderr)
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    if failed:
        print(f"{len(failed)} failed: {failed}", file=sys.stderr)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Compatibility helpers for optional third-party runtimes."""

from __future__ import annotations

import os
import sys

_PUREPB_DIR = os.path.join(os.path.dirname(__file__), "purepb")


def ensure_protobuf(spark=None) -> str:
    """Make `google.protobuf` importable: prefer a real installation,
    else fall back to the bundled pure-Python wire shim (purepb).
    With a SparkSession, also ships the shim to Python workers via
    addPyFile (the transformWithStateInPandas state client runs in the
    worker, not the driver). Returns 'real' or 'shim'."""
    try:
        import google.protobuf  # noqa: F401

        return "real"
    except ImportError:
        pass
    if _PUREPB_DIR not in sys.path:
        sys.path.insert(0, _PUREPB_DIR)
    import google.protobuf  # noqa: F401

    if spark is not None:
        # Python workers — including the transformWithState streaming
        # driver worker — build their sys.path from the PYTHONPATH the
        # PythonFunction's envVars carry, which come from
        # sc.environment at query-definition time. Prepend the shim
        # there (and in this process's env for any fork) so queries
        # defined after this call resolve google.protobuf worker-side.
        env = spark.sparkContext.environment
        cur = env.get("PYTHONPATH", "")
        if _PUREPB_DIR not in cur.split(os.pathsep):
            env["PYTHONPATH"] = (_PUREPB_DIR + os.pathsep + cur).rstrip(os.pathsep)
        cur = os.environ.get("PYTHONPATH", "")
        if _PUREPB_DIR not in cur.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                _PUREPB_DIR + os.pathsep + cur
            ).rstrip(os.pathsep)
    return "shim"

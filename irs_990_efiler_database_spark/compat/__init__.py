"""Compatibility layer for optional third-party dependencies.

``ensure_protobuf`` makes ``transformWithStateInPandas`` usable in
environments without the protobuf wheel (no pip, no network): pyspark's
TWS state-protocol client imports the generated ``StateMessage_pb2``,
which needs a ``google.protobuf`` runtime, and the state protocol runs
in SEPARATE Python worker processes the JVM spawns — so the shim has to
reach three interpreters:

1. the driver (sys.path insert),
2. future JVM/worker children (os.environ PYTHONPATH), and
3. workers of an ALREADY-RUNNING session — their PYTHONPATH is built
   from the PythonFunction's envVars, which pyspark snapshots from
   ``sc.environment`` at UDF-creation time, so mutating that dict here
   covers every TWS operator declared afterwards.

No-op whenever the real protobuf is importable — the shim never
shadows a real installation.
"""

from __future__ import annotations

import os
import sys

_SHIM_DIR = os.path.join(os.path.dirname(__file__), "protoshim")


def have_real_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return not getattr(
            sys.modules["google.protobuf"], "__version__", ""
        ).endswith("minishim")
    except ImportError:
        return False


def ensure_protobuf(spark=None) -> str:
    """Make ``import google.protobuf`` work, preferring the real wheel.
    Returns "real", "shim", or "shim-installed"."""
    try:
        import google.protobuf  # noqa: F401

        installed = True
    except ImportError:
        installed = False
    if installed:
        state = "real" if have_real_protobuf() else "shim"
    else:
        if _SHIM_DIR not in sys.path:
            sys.path.insert(0, _SHIM_DIR)
        state = "shim-installed"
    if state != "real":
        prev = os.environ.get("PYTHONPATH", "")
        if _SHIM_DIR not in prev.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                _SHIM_DIR + (os.pathsep + prev if prev else "")
            )
        if spark is not None:
            env = spark.sparkContext.environment
            prev = env.get("PYTHONPATH", "")
            if _SHIM_DIR not in prev.split(os.pathsep):
                env["PYTHONPATH"] = (
                    _SHIM_DIR + (os.pathsep + prev if prev else "")
                )
    return state

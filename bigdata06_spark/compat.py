"""Optional-dependency shims.

`transformWithStateInPandas` (Spark 4 typed streaming state,
pyspark/sql/streaming/proto/StateMessage_pb2.py) needs the protobuf
runtime, which this container does not ship on sys.path. We vendor the
pure-Python protobuf runtime (Apache-2.0/BSD license, google/protobuf
6.32) under `vendor/` at the repo root — see vendor/README.md — and
activate it here only when `google.protobuf` is not already
importable, so an environment with its own (likely newer,
C-accelerated) protobuf always wins.

One wrinkle: pyspark 4.1's generated StateMessage_pb2 was built with
gencode 6.33, and protobuf hard-errors when the runtime is OLDER than
the gencode, even one minor apart. Protobuf's own escape hatch for
exactly this deployment situation is the
TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK env var (checked first in
runtime_version.ValidateProtobufRuntimeVersion); we set it only when
the vendored runtime is the one in play. Environment (not a runtime
monkeypatch) matters: the state protocol is exercised by THREE kinds
of Python processes — the driver, daemon-forked task workers, and the
StreamingPythonRunner "driver worker" Spark spawns directly for state
schema validation — and only environment variables reach all three.
"""

from __future__ import annotations

import os
import sys

VENDOR_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor")


def ensure_protobuf() -> bool:
    """Make `google.protobuf` importable, preferring any real install.
    Returns True if protobuf is usable (pyspark's StateMessage gencode
    imports), False if unavailable. Idempotent."""
    try:
        import google.protobuf  # noqa: F401

        mod_file = getattr(sys.modules["google.protobuf"], "__file__", "") or ""
        using_vendor = mod_file.startswith(VENDOR_DIR)
    except ImportError:
        if not os.path.isdir(os.path.join(VENDOR_DIR, "google", "protobuf")):
            return False
        if VENDOR_DIR not in sys.path:
            sys.path.insert(0, VENDOR_DIR)
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            return False
        using_vendor = True

    if using_vendor:
        os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"

    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401
    except Exception:  # noqa: BLE001 — any incompat: report unusable
        return False
    return True


def using_vendored_protobuf() -> bool:
    """True iff the `google.protobuf` actually imported is the
    vendored copy. Drives whether worker processes should see
    VENDOR_DIR on PYTHONPATH at all: an environment with its own
    protobuf must NOT have workers shadow it with the older vendored
    runtime (the 'environment's own protobuf always wins' contract —
    prepending unconditionally would hard-error workers on newer
    gencode without the version-check escape hatch set)."""
    mod = sys.modules.get("google.protobuf")
    if mod is None:
        return False
    return (getattr(mod, "__file__", "") or "").startswith(VENDOR_DIR)


def activate_protobuf_for_session(spark) -> bool:
    """Make the vendored protobuf reach an ALREADY-RUNNING session's
    Python workers (e.g. the external driver's vanilla session, whose
    JVM env we didn't get to set before launch).

    Works because pyspark snapshots `sc.environment` into every Python
    function's envVars at UDF-creation time, and PythonWorkerFactory
    applies those to the worker/daemon process it spawns (keyed by
    envVars, so a fresh daemon is used when they change). Mutating
    `sc.environment` BEFORE building the transformWithState plan is
    therefore enough — no JVM restart. Idempotent; call before any
    stateful-streaming plan that needs the state protobuf."""
    if not ensure_protobuf():
        return False
    if not using_vendored_protobuf():
        # real protobuf install: workers resolve it from site-packages
        # on their own — exporting VENDOR_DIR would shadow it
        return True
    env = spark.sparkContext.environment
    py_path = env.get("PYTHONPATH", os.environ.get("PYTHONPATH", ""))
    if VENDOR_DIR not in py_path.split(os.pathsep):
        py_path = f"{VENDOR_DIR}{os.pathsep}{py_path}" if py_path else VENDOR_DIR
    env["PYTHONPATH"] = py_path
    if os.environ.get("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"):
        env["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
    return True

"""Best-effort ``google.protobuf`` bootstrap for environments that ship
no protobuf wheel (VERDICT r4 item 4).

Spark 4's ``transformWithStateInPandas`` control channel speaks
protobuf, but this container has no installed ``google.protobuf`` and
installs are prohibited.  The host DOES carry a pure-python protobuf
runtime inside the (public, Apache-2.0-licensed) Google Cloud SDK
bundle at ``/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk`` —
version 4.23.2, importable by adding two sys.path entries and nothing
else.  ``install()`` wires it up, with one documented compat step:

- PySpark 4.1's generated ``StateMessage_pb2`` was emitted by protoc
  6.33 and imports ``google.protobuf.runtime_version`` (added in
  protobuf 5.27) purely to run a version handshake.  Runtime 4.23
  predates the module, so ``install()`` registers a no-op stand-in.
  That skips the ADVISORY handshake only — the message API the
  gencode actually uses (``internal.builder``, descriptor_pool) exists
  in 4.23, the StateMessage schema is plain proto3 (no editions), and
  ``install()`` proves the combination by round-tripping a
  StateMessage before reporting success.  The end-to-end gate is
  tests/test_streaming.py::test_transform_with_state_running_totals,
  which runs the full worker <-> JVM state-server conversation and
  compares results with the batch oracle.

Scope: a local-environment bootstrap, not shipped behavior — a real
cluster installs protobuf from requirements and ``install()`` returns
"native" without touching sys.path.  Worker processes are covered
because the streaming.stateful module calls ``install()`` at import
time, and pyspark's workers unpickle the user function/processor —
importing that module, provided the processor class pickles BY
REFERENCE (module-level class; see stateful.RunningTotals) — BEFORE
constructing StatefulProcessorApiClient, whose proto imports are lazy
(stateful_processor_api_client imports StateMessage_pb2 inside
methods).  Two worker-side traps this module handles:

- Spark puts its JARS on worker sys.path, and jars carrying
  ``google/protobuf/*.proto`` (spark-core does) make
  ``import google.protobuf`` succeed as an EMPTY namespace package —
  so the native probe imports ``descriptor``, not just the package.
- transformWithState state items each live in their own column
  family, which only the RocksDB state store provider supports — set
  ``spark.sql.streaming.stateStore.providerClass`` to
  ``...state.RocksDBStateStoreProvider`` for those queries.
"""

from __future__ import annotations

import os
import sys
import types

# (google-package dir, package-root dir its internal imports need)
_SDK_CANDIDATES = [
    ("/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk",
     "/usr/lib/google-cloud-sdk/lib/third_party"),
]

_result: str | None = None


def _runtime_version_stub() -> types.ModuleType:
    mod = types.ModuleType("google.protobuf.runtime_version")

    class Domain:
        PUBLIC = 1
        GOOGLE_INTERNAL = 2

    def ValidateProtobufRuntimeVersion(*_a, **_k) -> None:
        return None

    mod.Domain = Domain
    mod.ValidateProtobufRuntimeVersion = ValidateProtobufRuntimeVersion
    return mod


def _proves_state_message() -> bool:
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    req = sm.StateRequest()
    req.version = 2
    blob = req.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(blob)
    return back.version == 2 and list(sm.HandleState.keys())[0] == "PRE_INIT"


def install() -> str | bool:
    """Make ``google.protobuf`` importable if at all possible.

    Returns "native" (real install present), "sdk" (bootstrapped from
    the Cloud SDK bundle, StateMessage round-trip verified), or False
    (no usable runtime on this host — callers keep the skip path).
    Idempotent; the result is cached."""
    global _result
    if os.environ.get("PB_COMPAT_DEBUG"):
        print(f"PB_COMPAT install() pid={os.getpid()} cached={_result} "
              f"path0={sys.path[:4]}", flush=True)
    if _result is not None:
        return _result

    try:
        # `descriptor`, not just the package: on Spark WORKERS the jars
        # are on sys.path, and jars shipping `google/protobuf/*.proto`
        # (e.g. spark-core) satisfy `import google.protobuf` as an
        # empty NAMESPACE package ("unknown location") with no Python
        # modules in it — a false-positive "native" that later crashes
        # StateMessage_pb2's `from google.protobuf import descriptor`.
        from google.protobuf import descriptor  # noqa: F401
        _result = "native"
        return _result
    except ImportError:
        # Evict jar-backed namespace residue so the SDK candidate's
        # REGULAR google package (has __init__.py) resolves freshly.
        # Scope the eviction to `google` itself and `google.protobuf*`:
        # blanket-evicting google.* would hand unrelated, legitimately
        # imported namespace siblings (google.auth, google.cloud.*)
        # fresh duplicate module objects on their next import,
        # breaking isinstance/module-global state other code holds
        # (ADVICE r6).  `google` is safe to evict because a namespace
        # package object carries no state beyond its __path__, which
        # re-resolves to a superset after the sys.path append below.
        for name in [n for n in sys.modules
                     if n == "google" or n.startswith("google.protobuf")]:
            sys.modules.pop(name, None)

    for google_dir, root_dir in _SDK_CANDIDATES:
        if not os.path.isdir(os.path.join(google_dir, "google", "protobuf")):
            continue
        added = [p for p in (google_dir, root_dir) if p not in sys.path]
        mods_before = set(sys.modules)
        for p in added:
            sys.path.append(p)   # append: never shadow real packages
        try:
            import google.protobuf as gp
            if not hasattr(gp, "runtime_version"):
                try:
                    from google.protobuf import runtime_version  # noqa: F401
                except ImportError:
                    stub = _runtime_version_stub()
                    sys.modules["google.protobuf.runtime_version"] = stub
                    gp.runtime_version = stub
            if _proves_state_message():
                _result = "sdk"
                return _result
        except Exception:
            pass
        # failed with this candidate: undo path edits and evict the
        # half-imported module tree so a later native install (or the
        # next candidate) starts clean
        for p in added:
            if p in sys.path:
                sys.path.remove(p)
        for name in set(sys.modules) - mods_before:
            if (name == "google" or name.startswith("google.")
                    or name.startswith("cloudsdk")
                    or name.endswith("StateMessage_pb2")):
                sys.modules.pop(name, None)

    _result = False
    return _result

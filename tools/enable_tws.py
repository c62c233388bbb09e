"""One-command enablement check for the transformWithStateInPandas
(TWS) runtime — the r6 verdict's "documented enablement" item.

The TWS operator logic in this engine
(`streaming/stateful.py::device_alert_monitor` and
`make_alert_processor`) is fully unit-tested against fake state
handles; only the RUNTIME wire-up test
(`tests/test_streaming_stateful.py::test_transform_with_state_end_to_end`)
is environment-gated, because PySpark's TWS worker protocol speaks
protobuf: `pyspark.sql.streaming.proto.StateMessage_pb2` imports
`google.protobuf` at module load. Vendoring a protobuf runtime is not
viable (generated _pb2 modules need the real descriptor-pool/builder
machinery), so the enablement is one command in any environment with
an index:

    pip install 'protobuf>=4.25'

then re-run pytest — the skip converts to a run automatically (the
skip probe is exactly the runner's own import). This script verifies
the full import chain and says which link is missing:

    python tools/enable_tws.py   # exit 0 = runtime live
"""

from __future__ import annotations

import importlib
import sys

CHAIN = [
    ("google.protobuf", "pip install 'protobuf>=4.25'"),
    ("google.protobuf.descriptor", "protobuf install is broken/partial"),
    (
        "pyspark.sql.streaming.proto.StateMessage_pb2",
        "pyspark's generated TWS messages failed to load — pyspark and "
        "protobuf major versions may be incompatible",
    ),
    (
        "pyspark.sql.streaming.stateful_processor_api_client",
        "the TWS worker-side client failed to import",
    ),
]


def main() -> int:
    for mod, hint in CHAIN:
        try:
            importlib.import_module(mod)
            print(f"OK    {mod}")
        except Exception as ex:  # noqa: BLE001 — report, don't crash
            print(f"MISSING {mod}: {type(ex).__name__}: {ex}")
            print(f"  -> {hint}")
            return 1
    print(
        "TWS runtime live: "
        "tests/test_streaming_stateful.py::test_transform_with_state_"
        "end_to_end will run (skip auto-converts)."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

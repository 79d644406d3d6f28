"""Runtime evidence for the streaming drain-sizing change (r15,
VERDICT #3): streaming queries have no batch `.explain` plan, so the
checkable artifact is the engine's own progress telemetry.

For each named events_stream_* entry this runs the registered query
(which drains via ``run_available_now``) with a
``StreamingQueryListener`` attached and records, per micro-batch:
``numShufflePartitions`` / state-store provider conf observed DURING
the drain / state rows / result row count. Written to
``OUTDIR/streaming_drain_knobs_<SUFFIX>.txt``.

Usage:
    python tools/dump_stream_evidence.py OUTDIR SUFFIX ENTRY [ENTRY...]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("suffix")
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql.streaming import StreamingQueryListener

    from irs_990_efiler_database_spark.queries import all_queries
    from irs_990_efiler_database_spark.session import get_spark

    spark = get_spark("stream_evidence")
    records: list[dict] = []

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = json.loads(event.progress.json)
            records.append(
                {
                    "query": p.get("name"),
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "provider_conf_during_drain": spark.conf.get(
                        _PROVIDER_CONF, "(session default: HDFS-backed)"
                    ),
                    "stateOperators": [
                        {
                            k: so.get(k)
                            for k in (
                                "operatorName",
                                "numShufflePartitions",
                                "numStateStoreInstances",
                                "numRowsTotal",
                            )
                        }
                        for so in p.get("stateOperators", [])
                    ],
                }
            )

        def onQueryTerminated(self, event):
            pass

        def onQueryIdle(self, event):
            pass

    spark.streams.addListener(Capture())

    # The listener's conf sample is async (may land after the drain
    # restored the session conf) — record the knobs actually PASSED to
    # run_available_now as the authoritative provider/partition claim.
    import irs_990_efiler_database_spark.streaming as streaming_mod

    passed_knobs: list[dict] = []
    _orig_ran = streaming_mod.run_available_now

    def _recording_ran(stream, query_name, checkpoint_dir, **kw):
        passed_knobs.append(
            {
                "query": query_name,
                "state_partitions": kw.get("state_partitions"),
                "state_store": kw.get("state_store"),
            }
        )
        return _orig_ran(stream, query_name, checkpoint_dir, **kw)

    streaming_mod.run_available_now = _recording_ran
    # registered queries import the symbol inside the function body via
    # ``from ..streaming import run_available_now`` — patch the module
    # attr is enough because the import executes per call.
    reg = all_queries()
    lines = [
        f"# streaming drain runtime evidence ({args.suffix})",
        f"# per-batch StreamingQueryListener progress, sf={args.sf}",
        "",
    ]
    for entry in args.entries:
        records.clear()
        passed_knobs.clear()
        df = reg[entry](spark, args.sf)
        n = df.count()
        lines.append(f"== {entry}: result_rows={n}")
        for k in passed_knobs:
            lines.append("knobs_passed: " + json.dumps(k, sort_keys=True))
        # listener delivery is async; give it a moment
        import time

        time.sleep(2.0)
        for r in records:
            lines.append(json.dumps(r, sort_keys=True))
        lines.append("")
        print(f"{entry}: {n} rows, {len(records)} progress events")
    out = Path(args.outdir) / f"streaming_drain_knobs_{args.suffix}.txt"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

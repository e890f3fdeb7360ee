"""Streaming-family octave probe: slope + state-store footprint for the
REAL multi-micro-batch stream keys that scripts/scale_probe.py's batch
octave never covered (they were only ever run at fixture scale).

Keys probed (all file-replay streams with watermarks / stateful operators):
- q_watermark               dedup state bounded by the watermark
- q_stream_session          session-window state merge across batches
- q_stream_stream_join      symmetric-hash inner interval join state
- q_stream_stream_join_outer  outer join: state held until watermark proof
- q_stream_srm              stateless per-batch partials + additive MERGE
- q_stateful_running        applyInPandasWithState + MERGE sink

Two measurements per (factor, key), reusing scale_probe's key-offset
replicated fixtures (events: user/event ids offset per replica, ts +r h —
group/user/state cardinality grows linearly with the factor):

1. FOOTPRINT (first run, pays input staging): a StreamingQueryListener is
   attached to every writer-session clone (scoped_writer_session is wrapped
   for the duration); per-batch progress is captured and reduced to
   max state rows / max state bytes / batch count. RocksDB is the state
   store (session.py), so bytes come from the provider's own metrics.
2. SLOPE (min-of-2 after staging is memoized): wall clock of the stream
   run itself — the number the 8x/64x ratio is computed from, listener
   detached so instrumentation cannot perturb it.

A watermark-bounded design must show ~linear wall clock AND ~linear (or
flat, for sketch/partial states) state footprint in the factor; state
growing faster than the factor means eviction is broken and the key would
not survive 100 TB.

Usage: python scripts/stream_probe.py [factors...]   (default: 1 8 64)
Prints one JSON line per (factor, key) and a final summary with the
64x/8x slope ratio per key (1.0 = perfectly linear).
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import scale_probe  # noqa: E402  (reuse _replicate + WORK dir contract)

KEYS = [
    "q_watermark",
    "q_stream_session",
    "q_stream_stream_join",
    "q_stream_stream_join_outer",
    "q_stream_srm",
    "q_stateful_running",
]

_KEY_FILTER = os.environ.get("STREAM_PROBE_KEYS")
if _KEY_FILTER:
    KEYS = [k for k in KEYS if k in set(_KEY_FILTER.split(","))]

#: Optional stateful-shuffle width override (STREAM_PROBE_WIDTH=16): the
#: registered keys pin their width to FIXTURE-scale buffered state (the
#: scoped_writer_session contract says to size it to state volume), so a
#: 64x replay through the fixture width measures the wrong configuration.
#: The override applies to BOTH the footprint and slope passes.
_WIDTH_OVERRIDE = os.environ.get("STREAM_PROBE_WIDTH")


def _mk_listener():
    """Build the progress-capturing listener lazily (needs a live pyspark)."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _Capture(StreamingQueryListener):
        progresses: list[dict] = []

        def onQueryStarted(self, event):  # noqa: N802 (Spark API)
            pass

        def onQueryProgress(self, event):  # noqa: N802
            try:
                _Capture.progresses.append(json.loads(event.progress.json))
            except Exception:
                pass

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    return _Capture


def _reduce_progress(progresses: list[dict]) -> dict:
    """Fold captured per-batch progress into the footprint summary."""
    batches = 0
    rows_max = 0
    bytes_max = 0
    input_rows = 0
    for p in progresses:
        if p.get("numInputRows", 0) or p.get("stateOperators"):
            batches += 1
        input_rows += int(p.get("numInputRows", 0) or 0)
        for op in p.get("stateOperators") or []:
            rows_max = max(rows_max, int(op.get("numRowsTotal", 0) or 0))
            b = int(op.get("memoryUsedBytes", 0) or 0)
            cm = op.get("customMetrics") or {}
            # RocksDB provider: on-disk SST size is the honest footprint.
            b = max(b, int(cm.get("rocksdbSstFileSize", 0) or 0))
            bytes_max = max(bytes_max, b)
    return {
        "batches": batches,
        "input_rows": input_rows,
        "state_rows_max": rows_max,
        "state_bytes_max": bytes_max,
    }


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 8, 64]
    from real_time_rides_data_pipeline_spark import (
        queries_ext,
        queries_mining,
        queries_ml,
    )
    from real_time_rides_data_pipeline_spark import session as session_mod
    from real_time_rides_data_pipeline_spark.registry import registry
    from real_time_rides_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="stream_probe",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)),
    )
    reg = registry()
    cap = _mk_listener()
    true_orig = session_mod.scoped_writer_session

    def orig(parent, shuffle_partitions):
        if _WIDTH_OVERRIDE:
            shuffle_partitions = int(_WIDTH_OVERRIDE)
        return true_orig(parent, shuffle_partitions)

    def instrumented(parent, shuffle_partitions):
        clone = orig(parent, shuffle_partitions)
        clone.streams.addListener(cap())
        return clone

    # Patch the factory symbol everywhere it is bound at module scope
    # (function-local importers re-read session_mod at call time).
    patch_sites = [session_mod, queries_ext, queries_mining, queries_ml]

    def set_factory(fn):
        for m in patch_sites:
            if hasattr(m, "scoped_writer_session"):
                m.scoped_writer_session = fn

    results: dict[str, dict[int, float]] = {k: {} for k in KEYS}
    for factor in factors:
        sf_dir = scale_probe._replicate(spark, factor)
        for key in KEYS:
            if key not in reg:
                continue
            # Footprint pass: instrumented, also pays (and memoizes) staging.
            cap.progresses = []
            set_factory(instrumented)
            try:
                t0 = time.time()
                reg[key].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                first = time.time() - t0
            finally:
                set_factory(orig)
            foot = _reduce_progress(cap.progresses)
            # Slope pass: min-of-2 on memoized input, no listener.
            best = None
            for _ in range(2):
                t0 = time.time()
                reg[key].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            results[key][factor] = round(best, 3)
            print(
                json.dumps(
                    {
                        "factor": factor,
                        "key": key,
                        "sec": round(best, 3),
                        "first_run_sec": round(first, 3),
                        **foot,
                    }
                ),
                flush=True,
            )
    if len(factors) >= 3:
        lo, mid, hi = factors[0], factors[-2], factors[-1]
        summary = {
            k: {
                "slope_ratio": round((v[hi] / v[mid]) / (hi / mid), 2)
                if v.get(mid) and v.get(hi)
                else None,
                **{f"f{f}": v.get(f) for f in factors},
            }
            for k, v in results.items()
        }
        print(json.dumps({"summary": summary}, indent=1), flush=True)


if __name__ == "__main__":
    main()

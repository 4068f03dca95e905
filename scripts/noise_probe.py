"""Cheap host-noise probe: times bench.py's exact fixed probe plan
(range(50M).sum(id % 97), pure codegen, no IO/shuffle) 5x in a small
fresh JVM and prints the spread.  Use it to decide whether a full
bench attempt can pass the frozen-floor canonical guard (max probe
<= 1.25 x the frozen floor, read live from BENCH_full_latest.json so
a ratcheted-down floor tightens this probe too) WITHOUT spending the
~18-minute full run — the guard itself stays in bench.py and remains
the only thing that writes artifacts.

Usage: python scripts/noise_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

from rheoceros_spark.session import get_session  # noqa: E402


def current_bar() -> float:
    """The SAME bar bench.py's canonical-overwrite guard will apply:
    1.25 x the frozen floor read from the canonical artifact (which
    ratchets DOWN on quieter runs), falling back to the first-frozen
    constant — a hardcoded bar goes stale the moment a quieter
    canonical tightens the floor (ADVICE r14)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        with open(os.path.join(repo, "BENCH_full_latest.json")) as fh:
            floor = json.load(fh).get("noise_floor_frozen")
    except (OSError, ValueError):
        floor = None
    return round(1.25 * (floor or bench.NOISE_FLOOR_FROZEN), 3)


def main() -> None:
    spark = get_session(
        "noise_probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=64,
        extra_confs={"spark.ui.enabled": "false"},
    )
    df = spark.range(50_000_000).selectExpr("sum(id % 97) AS s")
    df.write.format("noop").mode("overwrite").save()  # compile untimed
    probes = []
    for _ in range(5):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        probes.append(round(time.time() - t0, 3))
    bar = current_bar()
    print(
        json.dumps(
            {
                "noise": probes,
                "max": max(probes),
                "bar": bar,
                "quiet": max(probes) <= bar,
            }
        )
    )


if __name__ == "__main__":
    main()

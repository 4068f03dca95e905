"""Cheap host-noise probe: times bench.py's exact fixed probe plan
(range(50M).sum(id % 97), pure codegen, no IO/shuffle) 5x in a small
fresh JVM and prints the spread.  Use it to decide whether a full
bench attempt can pass the frozen-floor canonical guard (max probe
<= 1.25 x 0.081 = 0.101) WITHOUT spending the ~18-minute full run —
the guard itself stays in bench.py and remains the only thing that
writes artifacts.

Usage: python scripts/noise_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rheoceros_spark.session import get_session  # noqa: E402


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
    print(json.dumps({"noise": probes, "max": max(probes), "bar": 0.101}))


if __name__ == "__main__":
    main()

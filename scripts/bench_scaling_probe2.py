"""Order-debiased A/B probe: one Spark session, runtime confs toggled in
round-robin so host drift hits every variant equally.  See
bench_scaling_probe.py for the coarse first pass."""

from __future__ import annotations

import os
import statistics
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

VARIANTS = [
    ("arrow256_2m", {"spark.sql.execution.arrow.maxRecordsPerBatch": "256",
                     "spark.sql.files.maxPartitionBytes": "2m"}),
    ("arrow2048_2m", {"spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
                      "spark.sql.files.maxPartitionBytes": "2m"}),
    ("arrow2048_1m", {"spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
                      "spark.sql.files.maxPartitionBytes": "1m"}),
    ("arrow8192_2m", {"spark.sql.execution.arrow.maxRecordsPerBatch": "8192",
                      "spark.sql.files.maxPartitionBytes": "2m"}),
]


def main():
    from fuzzy_search_spark.spark.session import get_spark

    sf = bench._sf_from_dir(bench.SF_DIR)
    corpus_path, n_docs = bench.ensure_corpus(sf)
    spark = get_spark(master=f"local[{CPUS}]", app_name="probe2",
                      conf={"spark.driver.memory": "24g",
                            "spark.sql.files.openCostInBytes": "65536"})
    spark.sparkContext.setLogLevel("ERROR")
    walls = defaultdict(list)
    first = True
    for r in range(ROUNDS):
        for label, conf in VARIANTS:
            for k, v in conf.items():
                spark.conf.set(k, v)
            run = bench.run_extract_match(spark, corpus_path,
                                          "/tmp/probe2_out", warmup=first)
            first = False
            walls[label].append(run["wall_s"])
            print(f"round {r} {label:14s} {run['wall_s']:.2f}s", flush=True)
    spark.stop()
    print("\nsummary (best / median):")
    for label, ws in walls.items():
        print(f"  {label:14s} best={min(ws):6.2f} "
              f"median={statistics.median(ws):6.2f} {[round(w,2) for w in ws]}")


if __name__ == "__main__":
    main()

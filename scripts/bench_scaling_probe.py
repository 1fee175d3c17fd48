"""Probe the e2e extract+match wall at local[N] under candidate configs —
the tuning harness behind bench.py's recorded scaling number.

Runs the SAME pipeline as bench.run_extract_match (scan -> extract ->
match -> parquet write) for each (label, conf) candidate, best-of-N,
one Spark session per candidate, and prints a ranking.  Run on a QUIET
host; run nothing else concurrently.

Usage: python scripts/bench_scaling_probe.py [cpus] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root module)

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

BASE = {"spark.sql.files.maxPartitionBytes": "2m",
        "spark.sql.files.openCostInBytes": "65536"}

CANDIDATES = [
    ("baseline_r2", dict(BASE)),
    ("splits_1m", dict(BASE, **{
        "spark.sql.files.maxPartitionBytes": "1m"})),
    ("splits_512k", dict(BASE, **{
        "spark.sql.files.maxPartitionBytes": "512k"})),
    ("arrow_2048", dict(BASE, **{
        "spark.sql.execution.arrow.maxRecordsPerBatch": "2048"})),
    ("mem_24g", dict(BASE, **{"spark.driver.memory": "24g"})),
    ("combo_1m_arrow_mem", dict(BASE, **{
        "spark.sql.files.maxPartitionBytes": "1m",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
        "spark.driver.memory": "24g"})),
]


def main():
    from fuzzy_search_spark.spark.session import get_spark

    sf = bench._sf_from_dir(bench.SF_DIR)
    corpus_path, n_docs = bench.ensure_corpus(sf)
    print(f"corpus {corpus_path} docs={n_docs} cpus={CPUS}")
    results = []
    for label, conf in CANDIDATES:
        spark = get_spark(master=f"local[{CPUS}]", app_name=f"probe-{label}",
                          conf=conf)
        spark.sparkContext.setLogLevel("ERROR")
        run = bench.run_extract_match(spark, corpus_path,
                                      f"/tmp/probe_{label}")
        walls = [run["wall_s"]]
        for _ in range(REPEATS - 1):
            walls.append(bench.run_extract_match(
                spark, corpus_path, f"/tmp/probe_{label}",
                warmup=False)["wall_s"])
        spark.stop()
        best = min(walls)
        results.append((best, label, [round(w, 2) for w in walls]))
        print(f"{label:22s} best={best:6.2f}s walls={walls}")
        time.sleep(2)
    print("\nranking:")
    for best, label, walls in sorted(results):
        print(f"  {best:6.2f}s  {label:22s} {walls}")


if __name__ == "__main__":
    main()

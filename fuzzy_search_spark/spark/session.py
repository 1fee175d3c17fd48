"""SparkSession construction with the engine's recommended conf.

Defaults are tuned for correctness-at-scale first: AQE on (runtime skew
re-planning), Arrow enabled for pandas UDFs, bounded Arrow batch sizes so a
batch of giant documents cannot blow executor memory.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from pyspark.sql import SparkSession

RECOMMENDED_CONF: Dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # giant documents: cap rows per Arrow batch so the JVM->Python channel
    # streams steadily instead of shipping one huge batch
    "spark.sql.execution.arrow.maxRecordsPerBatch": "256",
    "spark.sql.shuffle.partitions": "32",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(master: Optional[str] = None, app_name: str = "fuzzy-search-spark",
              conf: Optional[Dict[str, str]] = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]")
    merged = dict(RECOMMENDED_CONF)
    if conf:
        merged.update(conf)
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

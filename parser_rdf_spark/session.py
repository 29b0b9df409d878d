"""SparkSession factory with the engine's scale-oriented defaults.

Tuned for the target profile — 1000-executor clusters over ~100 TB of
pages — while remaining correct on local[N]:

- AQE on (runtime coalescing + skew-join splitting), since predicate and
  host skew are the norm in web corpora (BASELINE.json:6)
- Arrow enabled with a bounded records-per-batch so the fused parse UDF's
  Python workers never materialize multi-GB batches of page text
- shuffle partitions default sized for local mode; cluster deployments
  override via spark-submit --conf (AQE coalesces down at runtime anyway)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "parser-rdf-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

"""SparkSession factory tuned for the crawl workload.

Local testing runs on ``local[N]`` but every conf below is chosen for a
1000-executor / 100 TB deployment and merely *also* behaves well locally:

* AQE on (runtime re-plan, skew-join splitting for hot domains),
* Arrow transport on (all per-row logic is pandas UDFs),
* shuffle partitions sized by caller (tests: 32; cluster: ~2-3x total cores),
* small broadcast threshold left to AQE's runtime sizing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "crawler_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with crawl-engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falls back to
    ``local[*]``). On a real cluster, spark-submit supplies the master and
    this function only layers the SQL confs.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime coalescing + skew-join splitting — first line of
        # defense against hot-domain skew (SURVEY.md §4.2).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow transport for every pandas UDF (SURVEY.md §2.10).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Deterministic timezone for warc_ts handling.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # local mode: this IS the whole JVM heap (driver + executor). The
        # bench macro persists multiple multi-GB frames; an undersized heap
        # shows up as GC storms that read as poor core-count scaling.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

"""SparkSession factory.

Defaults are tuned for the test/bench environment (single JVM,
``local[$SPARK_GRAFT_CPUS]``) but every knob is chosen so the same plan
shape survives a multi-executor cluster at 100 TB:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy).
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster this is superseded by AQE's coalescing from
  ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``.
- Arrow enabled for every pandas/python boundary (Pandas UDFs,
  ``toPandas``) - the only Python in hot paths is Arrow-batched.
- Session timezone pinned to UTC so timestamp semantics are stable and
  DuckDB-oracle comparable (DuckDB timestamps are UTC-naive).

The reference runs one Python process end-to-end
(``/root/reference/README.md:271``); this factory is the replacement for
its implicit "execution engine".
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dlt_salesforce_iceberg_rest_demo_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    enable_iceberg: bool = False,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``enable_iceberg=True`` adds the Iceberg runtime + REST catalog config
    mirroring the reference's Lakekeeper setup
    (``/root/reference/salesforce_pipeline.py:42-49``); it requires the
    iceberg-spark-runtime jar on the classpath and is therefore optional -
    all disposition semantics are also available on the parquet-backed
    lake (see ``sinks.dispositions``).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = int(cpus)
        except ValueError:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        # ANSI off: the engine mirrors the reference's permissive dlt typing
        # (silent NULL on bad cast, no overflow errors mid-pipeline).
        .config("spark.sql.ansi.enabled", "false")
    )

    if enable_iceberg:
        catalog = os.environ.get("ICEBERG_CATALOG_NAME", "lake")
        builder = (
            builder.config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config(
                f"spark.sql.catalog.{catalog}",
                "org.apache.iceberg.spark.SparkCatalog",
            )
            .config(f"spark.sql.catalog.{catalog}.type", "rest")
            .config(
                f"spark.sql.catalog.{catalog}.uri",
                os.environ.get("ICEBERG_REST_URI", "http://localhost:8181/catalog"),
            )
        )

    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

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
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

_SHIPPED_APPS: set[str] = set()


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Pandas-UDF closures reference module-level functions, which
    cloudpickle serializes BY NAME - so the worker process must be able
    to ``import dlt_salesforce_iceberg_rest_demo_spark`` itself. When the driving
    script runs from inside the repo the cwd lands on the worker path
    and this is invisible; an external driver (arbitrary cwd, its own
    SparkSession) gets ``ModuleNotFoundError`` from every UDF task.
    Shipping the package once per SparkContext with ``addPyFile`` makes
    worker imports independent of the driver's cwd - exactly what a
    real multi-machine cluster needs anyway (``--py-files`` equivalent).
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED_APPS:
        return
    pkg_dir = Path(__file__).resolve().parent
    zip_path = Path(tempfile.gettempdir()) / f"dlt_salesforce_iceberg_rest_demo_spark_{os.getpid()}.zip"
    if not zip_path.exists():
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for py in sorted(pkg_dir.rglob("*.py")):
                zf.write(py, f"{pkg_dir.name}/{py.relative_to(pkg_dir)}")
    spark.sparkContext.addPyFile(str(zip_path))
    _SHIPPED_APPS.add(app_id)


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
        # Join strategy (round-11 re-measurement of the round-10
        # change): the static planner flag preferSortMergeJoin=false
        # is DROPPED — plans/r11/*_sqldump_shj_* capture the physical
        # plan of every SQL execution (construction checkpoints
        # included) for the queries round 10 credited to it
        # (prefix_jaccard, containment, q18, incremental_batch) under
        # all four knob combinations, and the join sequences are
        # byte-identical: not one SortMergeJoin or ShuffledHashJoin
        # exists at this scale for the knobs to flip, so the r10
        # paired-wall deltas were host noise. The planner-time SHJ
        # pick is also the unsafe half at 100 TB (estimated-stats
        # gated, build side cannot spill — a post-filter misestimate
        # OOMs an executor on a join sort-merge would have finished).
        # The AQE rewrite below is the safe half (actual runtime
        # partition bytes, 128m local maps) and is kept per guide
        # §3.1/§9; env-overridable for memory-tight clusters.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP", "128m"),
        )
        # Python DataSource filter pushdown (sources/datasource.py):
        # lets pushFilters() compile predicates into server-side SOQL.
        .config("spark.sql.python.filterPushdown.enabled", "true")
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

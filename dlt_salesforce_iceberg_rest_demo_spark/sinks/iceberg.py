"""Iceberg sink: the same dispositions through the Iceberg Spark runtime.

This is the production path mirroring the reference's PyIceberg REST
catalog destination (/root/reference/salesforce_pipeline.py:42-49,
62-176; README.md:37-39 - Lakekeeper REST catalog, MinIO/S3, parquet +
snappy). It requires ``iceberg-spark-runtime`` on the classpath and a
configured catalog (``session.get_spark(enable_iceberg=True)``); the
environment here ships no Iceberg jar, so every entry point guards with
:func:`is_available` and the test suite skips - the parquet lake
(``sinks.dispositions``) provides identical semantics for CI.

Semantic upgrades over the reference, all from the Iceberg Spark runtime
(SURVEY §2.4):

- replace is ONE atomic snapshot (``overwritePartitions``), not
  delete-commit + append-commit;
- merge is a real ``MERGE INTO`` (update-in-place row lineage), not
  delete-then-reinsert - and commits retry on conflict, lifting the
  reference's single-writer restriction (README.md:269-281).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession

from .dispositions import WriteReport

logger = logging.getLogger(__name__)


def is_available(spark: SparkSession) -> bool:
    """True when the Iceberg extension + a catalog are configured."""
    try:
        ext = spark.conf.get("spark.sql.extensions", "") or ""
        if "IcebergSparkSessionExtensions" not in ext:
            return False
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class IcebergWriter:
    """Disposition writer against ``catalog.namespace.table`` idents."""

    def __init__(self, spark: SparkSession, catalog: str, namespace: str) -> None:
        if not is_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath / no catalog configured; "
                "use sinks.dispositions.ParquetLake or install "
                "iceberg-spark-runtime and call get_spark(enable_iceberg=True)"
            )
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")

    def _ident(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    def exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self._ident(table))

    def _create(self, df: DataFrame, table: str) -> None:
        """W5 auto-create with the reference's table properties
        (salesforce_pipeline.py:146-149)."""
        (
            df.writeTo(self._ident(table))
            .using("iceberg")
            .tableProperty("write.format.default", "parquet")
            .tableProperty("write.parquet.compression-codec", "snappy")
            .create()
        )

    def append(self, df: DataFrame, table: str) -> WriteReport:
        if not self.exists(table):
            self._create(df, table)
        else:
            df.writeTo(self._ident(table)).append()
        return WriteReport(table, "append", df.count())

    def replace(self, df: DataFrame, table: str) -> WriteReport:
        if not self.exists(table):
            self._create(df, table)
        else:
            df.writeTo(self._ident(table)).overwritePartitions()
        return WriteReport(table, "replace", df.count())

    def merge(
        self, df: DataFrame, table: str, primary_key: tuple[str, ...] | list[str]
    ) -> WriteReport:
        pk = list(primary_key)
        if not self.exists(table):
            self._create(df, table)
            return WriteReport(table, "merge", df.count())
        if not pk or any(k not in df.columns for k in pk):
            logger.warning("merge on %s lacks usable PKs; appending", table)
            rep = self.append(df, table)
            return WriteReport(table, "merge", rep.rows_written, fallback_append=True)
        # MERGE INTO rejects multiple source matches per target row, so the
        # source is deduped keep-last first (the documented divergence from
        # the reference's duplicate-preserving delete-then-insert).
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        order = [F.col(c).desc() for c in df.columns if c not in pk]
        w = Window.partitionBy(*pk).orderBy(*(order or [F.lit(1)]))
        deduped = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        deduped.createOrReplaceTempView("__merge_source")
        on = " AND ".join(f"t.`{k}` = s.`{k}`" for k in pk)
        self.spark.sql(
            f"""
            MERGE INTO {self._ident(table)} t
            USING __merge_source s
            ON {on}
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
            """
        )
        return WriteReport(table, "merge", deduped.count())

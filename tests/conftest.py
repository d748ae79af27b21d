from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from dlt_salesforce_iceberg_rest_demo_spark.session import get_spark  # noqa: E402
from dlt_salesforce_iceberg_rest_demo_spark.sources.parquet import TABLES  # noqa: E402

# Opt-in scale override: SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
# re-runs the ORACLE suite (test_queries_oracle.py) at the driver's
# correctness-gate scale — the spark and duck fixtures both follow it.
# Only the oracle tests are scale-agnostic; tests with sf0.001-pinned
# expectations (row counts, planted values) should run at the default.
import os

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the fixture tables registered as views,
    mirroring the driver's oracle setup."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def normalize_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for comparison: columns sorted by name, rows sorted
    by every column, dtypes widened (int->int64, float->float64)."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        dt = pdf[c].dtype
        if pd.api.types.is_integer_dtype(dt):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(dt):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(dt):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None).astype("datetime64[us]")
        elif dt == object:
            # array cells (Spark array<...> -> ndarray; DuckDB LIST ->
            # ndarray/list) become tuples: hashable for the row sort,
            # exactly comparable element-wise
            pdf[c] = pdf[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or (
                    hasattr(v, "tolist") and getattr(v, "ndim", 0) == 1
                ) else v
            )
    sort_cols = list(pdf.columns)
    pdf = pdf.sort_values(sort_cols, na_position="last").reset_index(drop=True)
    return pdf


def assert_frames_match(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    """Exact equality check (the driver hash-compares, so approximate
    matches are NOT good enough - this harness holds the same bar)."""
    spark_pdf = normalize_pdf(spark_df.toPandas())
    oracle_pdf = normalize_pdf(oracle_pdf)
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert list(spark_pdf.columns) == list(oracle_pdf.columns), (
        f"{name}: columns {list(spark_pdf.columns)} != {list(oracle_pdf.columns)}"
    )
    pd.testing.assert_frame_equal(
        spark_pdf, oracle_pdf, check_exact=True, check_dtype=False, obj=name or "frame"
    )

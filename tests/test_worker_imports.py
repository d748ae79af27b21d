"""Regression guard for the worker-import fix.

Pandas-UDF closures are pickled BY MODULE NAME, so executor Python
workers must be able to import the package themselves. When the
driving process runs from inside the repo, its cwd lands on the worker
path and masks a missing-distribution bug - which is exactly how the
ordinary pytest suite runs. This test launches a fresh driver process
from a FOREIGN cwd (no repo on its implicit path beyond the explicit
sys.path insert, no PYTHONPATH) and runs a mapInPandas query: without
``session.ensure_package_on_workers`` (addPyFile inside
``_pin_session_semantics``) every UDF task dies with
ModuleNotFoundError.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]


def test_udf_query_works_from_foreign_cwd(tmp_path):
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {str(REPO_ROOT)!r})
        from dlt_salesforce_iceberg_rest_demo_spark.plans import REGISTRY, query_fns
        from dlt_salesforce_iceberg_rest_demo_spark.session import get_spark

        spark = get_spark(
            "worker-import-test", master="local[2]", shuffle_partitions=2
        )
        query_fns()
        q = REGISTRY["multimodal_decode_features"]
        n = q.spark(spark, "/root/testdata/sf0.001").count()
        assert n >= 0
        print("WORKER_IMPORT_OK", n)
        """
    )
    probe = tmp_path / "probe.py"
    probe.write_text(script)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    result = subprocess.run(
        [sys.executable, str(probe)],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert "WORKER_IMPORT_OK" in result.stdout, (
        f"stdout:\n{result.stdout[-2000:]}\nstderr:\n{result.stderr[-2000:]}"
    )

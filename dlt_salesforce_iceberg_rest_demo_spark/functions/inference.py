"""Arrow-batched model-inference harness: the distributed-scoring seam
of a training-data pipeline (toxicity / quality / reward scoring over
documents at 100 TB).

Design, mirroring the multimodal decode seam (`operators/multimodal.py`):

- the SHAPE is real — ``mapInPandas`` with controlled batch sizes, typed
  output schema, model loaded once per worker (not per batch: the
  closure materializes it lazily into the executor's module scope, the
  standard per-worker init pattern for heavyweight models);
- the MODEL is pluggable — any ``pandas.Series -> pandas.Series``
  scorer drops in; the default is a deterministic md5-derived fake
  (no ML libs in this container), which doubles as the ORACLE HOOK:
  DuckDB can recompute the identical score in SQL, so even the Python
  inference path is hash-match verified, not just smoke-tested.

Scale notes: scoring is map-only (zero shuffle); Arrow transfer is
amortized by ``batch_rows``; at cluster scale the only tunables are
batch size (GPU memory) and executor Python memory.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

ScoreFn = Callable[[pd.Series], pd.Series]


def md5_score(texts: pd.Series) -> pd.Series:
    """Deterministic stand-in scorer: first 8 md5 hex chars / 2^32 —
    uniform in [0, 1), reproducible in any engine with md5 (the DuckDB
    oracle inlines the same formula). Stands where a real classifier
    (toxicity, quality, reward model) would load."""
    import hashlib

    # NULL text scores NULL (NaN -> Spark NULL via Arrow) — row-complete
    # output, same as the oracle's md5(NULL) -> NULL propagation.
    return texts.map(
        lambda s: None
        if s is None
        else int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) / 2**32
    ).astype("float64")


def batch_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_fn: ScoreFn = md5_score,
    score_name: str = "score",
    batch_rows: int = 512,
) -> DataFrame:
    """Score every row with a Python model over Arrow batches.

    ``mapInPandas`` (not a scalar pandas_udf) so the operator controls
    batch geometry explicitly and can carry per-batch state; output is
    (id, score) only — the text never flows back to the JVM.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {id_col: b[id_col], score_name: score_fn(b[text_col])}
            )

    out = df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, {score_name} double"
    )
    if prev is not None:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    return out

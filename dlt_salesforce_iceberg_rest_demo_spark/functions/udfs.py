"""The Python tier, demonstrated deliberately.

The engine's rule (north star + SURVEY §4): built-in Column expressions
first; Arrow-batched Pandas UDFs only where built-ins genuinely can't
express the logic; row-at-a-time Python never. This module holds the
reference implementations of tier 2 so the tiering is concrete and
tested:

- :func:`quality_score_pandas` - a scalar ``@pandas_udf`` twin of the
  native ``operators.text.quality_score``. Exists to (a) prove the
  Arrow batch path end-to-end and (b) serve as the template for logic
  that truly needs numpy/pandas (a real perplexity model, a tokenizer).
  The test asserts it matches the native version exactly - and the
  native version is what ships in the registry.

- :func:`asof_join_pandas` - ``applyInPandas`` + ``pd.merge_asof`` per
  group: the guide's tier-2 recipe for as-of joins. The native
  union+last_value implementation (operators.temporal.asof_join) is
  the production path (no Python, one shuffle); this one is the
  fallback shape for semantics Spark can't compose (e.g. nearest-
  by-tolerance with direction switches) and the cross-check.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def quality_score_pandas(text: pd.Series) -> pd.Series:
    """Vectorized quality heuristic - same formula as
    operators.text.quality_score, computed in pandas over Arrow batches."""
    toks = text.str.lower().str.split(" ")
    n_tok = toks.str.len()
    uniq = toks.map(lambda t: len(set(t))) / n_tok
    avg_len = text.str.replace(" ", "", regex=False).str.len() / n_tok
    len_component = (n_tok / 100.0).clip(upper=1.0)
    avg_len_ok = ((avg_len >= 2.0) & (avg_len <= 12.0)).astype("float64")
    return 0.4 * len_component + 0.3 * avg_len_ok + 0.3 * uniq


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join via applyInPandas + pd.merge_asof per group key.

    Cogroup the two sides on ``on``; inside each group pandas does the
    backward-inclusive nearest match. Arrow moves whole batches - no
    per-row Python - but memory is bounded by the largest group, which
    is why the native union+window variant is preferred at scale.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    out_fields = [left.schema[on]] + [
        f for f in left.schema.fields if f.name != on
    ]
    out_fields.append(
        T.StructField(f"{right_ts}{suffix}", right.schema[right_ts].dataType)
    )
    out_fields += [
        T.StructField(f"{c}{suffix}", right.schema[c].dataType) for c in right_cols
    ]
    out_schema = T.StructType(out_fields)
    left_cols = [c for c in left.columns if c != on]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_ts)
        rename = {right_ts: f"{right_ts}{suffix}"}
        rename.update({c: f"{c}{suffix}" for c in right_cols})
        rsel = (
            rpdf[[right_ts] + right_cols]
            .sort_values(right_ts)
            .rename(columns=rename)
        )
        merged = pd.merge_asof(
            lpdf,
            rsel,
            left_on=left_ts,
            right_on=f"{right_ts}{suffix}",
            direction="backward",
            allow_exact_matches=True,
        )
        return merged[[on] + left_cols + list(rename.values())]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(lambda l, r: merge(l, r), schema=out_schema)
    )


def token_count_arrow_udf():
    """Arrow-optimized row-wise Python UDF (``useArrow=True``) - the
    tier between codegen'd built-ins and Pandas UDFs: per-row Python
    logic but Arrow-batched (de)serialization instead of pickle, for
    logic that is awkward to vectorize yet too small for applyInPandas.
    Twin of the native whitespace token count
    (operators.text.token_count's ws_tokens); the test asserts exact
    agreement, and the NATIVE version is what ships in the registry -
    this exists to prove the tier, not to use it in hot paths.
    """

    def count_tokens(text: str) -> int:
        if text is None:
            return None
        return len(text.lower().split(" "))

    return F.udf(count_tokens, T.IntegerType(), useArrow=True)

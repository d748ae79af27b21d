from .udfs import asof_join_pandas, quality_score_pandas

__all__ = ["asof_join_pandas", "quality_score_pandas"]

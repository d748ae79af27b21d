from .registry import REGISTRY, Query, query_fns, oracle_sqls

__all__ = ["REGISTRY", "Query", "query_fns", "oracle_sqls"]

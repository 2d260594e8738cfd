from .catalog import CATALOG, Query, query_fns, oracle_sqls

__all__ = ["CATALOG", "Query", "query_fns", "oracle_sqls"]

from .registry import QUERIES, QuerySpec, oracle_sql_map, queries_map, register

__all__ = ["QUERIES", "QuerySpec", "register", "queries_map", "oracle_sql_map"]

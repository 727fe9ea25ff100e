from .catalog import all_queries, all_oracles, get_query

__all__ = ["all_queries", "all_oracles", "get_query"]

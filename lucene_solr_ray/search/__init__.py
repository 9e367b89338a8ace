from .query import BooleanQuery, PhraseQuery, Query, TermQuery, parse_query

__all__ = ["BooleanQuery", "PhraseQuery", "Query", "TermQuery", "parse_query"]

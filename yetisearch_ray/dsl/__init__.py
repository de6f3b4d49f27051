from .query_parser import QueryParser, ParsedQuery
from .url_parser import URLQueryParser
from .builder import QueryBuilder

__all__ = ["QueryParser", "ParsedQuery", "URLQueryParser", "QueryBuilder"]

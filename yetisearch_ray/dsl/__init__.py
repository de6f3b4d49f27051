from .query_parser import QueryParser, ParsedQuery
from .reference_parser import ReferenceQueryParser, RefParsedQuery
from .url_parser import URLQueryParser
from .builder import QueryBuilder

__all__ = ["QueryParser", "ParsedQuery", "ReferenceQueryParser",
           "RefParsedQuery", "URLQueryParser", "QueryBuilder"]

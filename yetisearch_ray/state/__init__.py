"""Cross-process persistent state: on-disk fuzzy-term and query-result
caches (reference ``src/Storage/FuzzyTermCache.php`` and the SQLite
``{index}_query_cache`` table)."""

from .persistent_cache import FuzzyTermCache, PersistentQueryCache

__all__ = ["FuzzyTermCache", "PersistentQueryCache"]

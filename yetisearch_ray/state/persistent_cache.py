"""Cross-process persistent caches.

Two stores the reference keeps on disk so warm state survives the PHP
process, re-expressed for this engine:

* :class:`FuzzyTermCache` — a JSON file of ``term -> variations``
  (reference ``src/Storage/FuzzyTermCache.php:9-90``: lazy load on first
  access, lowercased keys, FIFO size cap dropping the oldest entries,
  explicit ``save()``).
* :class:`PersistentQueryCache` — a SQLite ``_query_cache`` table
  (reference ``src/Cache/QueryCache.php:40-255``: TTL expiry,
  least-recently-accessed eviction to 80% of ``max_size``, per-index
  invalidation, hit/miss/write/eviction stats).

Both are **manifest-versioned**: callers pass the index's mutation
version (tombstone/generation counter) into the cache key, so an append,
delete, or rebuild in any process invalidates every prior entry without
a coordination channel — the right contract for a multi-node serving
tier, where each reader actor keeps its own on-disk cache warm across
restarts.  Result payloads are Arrow-IPC bytes, not JSON: zero parse
cost on a hit and exact schema round-trip.

Scale note: these caches live NEXT TO a serving actor (local disk /
actor working dir), never on the driver.  Nothing here touches the
Dataset hot path; the sqlite file is per-process, so there is no
cross-actor lock contention.
"""
from __future__ import annotations

import hashlib
import io
import json
import os
import re
import sqlite3
import time

import pyarrow as pa

_TABLE_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]{0,63}$")


class FuzzyTermCache:
    """File-backed ``term -> variations`` map.

    Mirrors reference ``FuzzyTermCache.php``: the file is
    ``{dir}/{index_name}_fuzzy_cache.json``, loaded lazily on the first
    ``get``/``set``; when the map reaches ``max_cache_size`` the oldest
    entries are dropped keeping ``max_cache_size - 100`` (the
    reference's FIFO ``array_slice``).  ``save()`` is atomic
    (tmp + rename) so a crash mid-write never corrupts the cache.
    """

    def __init__(self, index_name: str, storage_dir: str,
                 max_cache_size: int = 10000):
        self.cache_file = os.path.join(storage_dir,
                                       f"{index_name}_fuzzy_cache.json")
        self.max_cache_size = max_cache_size
        self._cache: dict[str, list] = {}
        self._loaded = False
        self._dirty = False

    # -- reference loadCache(): tolerate a missing or garbled file
    def _load(self) -> None:
        if self._loaded:
            return
        try:
            with open(self.cache_file, "r", encoding="utf-8") as f:
                data = json.load(f)
            if isinstance(data, dict):
                self._cache = data
        except (OSError, ValueError):
            pass
        self._loaded = True

    def get(self, term: str) -> list | None:
        self._load()
        return self._cache.get(term.lower())

    def set(self, term: str, variations: list) -> None:
        self._load()
        key = term.lower()
        if len(self._cache) >= self.max_cache_size and key not in self._cache:
            keep = self.max_cache_size - 100
            self._cache = dict(list(self._cache.items())[-keep:])
        self._cache[key] = list(variations)
        self._dirty = True

    def save(self) -> None:
        if not self._loaded or not self._cache or not self._dirty:
            return
        tmp = self.cache_file + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(self._cache, f, ensure_ascii=False)
        os.replace(tmp, self.cache_file)
        self._dirty = False

    def clear(self) -> None:
        self._cache = {}
        self._loaded = True
        self._dirty = False
        try:
            os.unlink(self.cache_file)
        except FileNotFoundError:
            pass

    def __len__(self) -> int:
        self._load()
        return len(self._cache)


def _ipc_bytes(table: pa.Table) -> bytes:
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue()


def _ipc_table(blob: bytes) -> pa.Table:
    return pa.ipc.open_stream(io.BytesIO(blob)).read_all()


class PersistentQueryCache:
    """SQLite-backed query-result cache (reference ``QueryCache.php``).

    Schema matches the reference ``_query_cache`` table column-for-column
    (``QueryCache.php:44-56``) except ``result_data`` is an Arrow-IPC
    BLOB rather than a JSON string.  Eviction and expiry follow the
    reference exactly: entries past ``expires_at`` are ignored on read
    and swept opportunistically (every 100th ``get`` — the reference
    uses a 1% ``mt_rand`` roll; a deterministic counter is testable and
    has the same amortized cost, ``QueryCache.php:78-81``); when the
    table reaches ``max_size``, the least-recently-accessed rows are
    deleted down to 80% (``enforceMaxSize``, ``QueryCache.php:230-255``).
    """

    def __init__(self, db_path: str, *, table_name: str = "_query_cache",
                 ttl: int = 300, max_size: int = 1000, enabled: bool = True):
        if not _TABLE_RE.match(table_name):
            raise ValueError(
                f"Invalid cache table name {table_name!r}: must match "
                "/^[a-zA-Z_][a-zA-Z0-9_]{0,63}$/")
        self.db_path = db_path
        self.table = table_name
        self.default_ttl = ttl
        self.max_size = max_size
        self.enabled = enabled
        self.stats = {"hits": 0, "misses": 0, "writes": 0,
                      "evictions": 0, "errors": 0}
        self._get_count = 0
        self._conn: sqlite3.Connection | None = None
        if enabled:
            self._init_table()

    def _connect(self) -> sqlite3.Connection:
        if self._conn is None:
            os.makedirs(os.path.dirname(self.db_path) or ".", exist_ok=True)
            self._conn = sqlite3.connect(self.db_path)
        return self._conn

    def _init_table(self) -> None:
        con = self._connect()
        con.execute(f"""
            CREATE TABLE IF NOT EXISTS {self.table} (
                cache_key TEXT PRIMARY KEY,
                index_name TEXT NOT NULL,
                query_hash TEXT NOT NULL,
                result_data BLOB NOT NULL,
                result_count INTEGER,
                expires_at INTEGER NOT NULL,
                created_at INTEGER DEFAULT (strftime('%s', 'now')),
                hit_count INTEGER DEFAULT 0,
                last_accessed INTEGER DEFAULT (strftime('%s', 'now'))
            )""")
        for col in ("expires", "index", "accessed"):
            src = {"expires": "expires_at", "index": "index_name",
                   "accessed": "last_accessed"}[col]
            con.execute(f"CREATE INDEX IF NOT EXISTS "
                        f"idx_{self.table}_{col} ON {self.table}({src})")
        con.commit()

    # -- key: md5 over (index, manifest version, canonical param JSON);
    # the version in the key is what makes writes invalidate
    # cross-process without a broadcast.
    @staticmethod
    def _query_hash(params: dict) -> str:
        blob = json.dumps(params, sort_keys=True, default=repr,
                          ensure_ascii=False)
        return hashlib.md5(blob.encode()).hexdigest()

    def _key(self, index_name: str, params: dict, version) -> str:
        h = self._query_hash(params)
        return hashlib.md5(f"{index_name}|{version}|{h}".encode()).hexdigest()

    def get(self, index_name: str, params: dict, *,
            version=0) -> pa.Table | None:
        if not self.enabled:
            return None
        key = self._key(index_name, params, version)
        try:
            con = self._connect()
            self._get_count += 1
            if self._get_count % 100 == 0:
                self.clean_expired()
            row = con.execute(
                f"SELECT result_data FROM {self.table} "
                f"WHERE cache_key = ? AND expires_at > ?",
                (key, int(time.time()))).fetchone()
            if row is not None:
                con.execute(
                    f"UPDATE {self.table} SET hit_count = hit_count + 1, "
                    f"last_accessed = ? WHERE cache_key = ?",
                    (int(time.time()), key))
                con.commit()
                self.stats["hits"] += 1
                return _ipc_table(row[0])
            self.stats["misses"] += 1
            return None
        except (sqlite3.Error, pa.ArrowInvalid):
            self.stats["errors"] += 1
            return None

    def set(self, index_name: str, params: dict, result: pa.Table, *,
            ttl: int | None = None, version=0) -> bool:
        if not self.enabled:
            return False
        key = self._key(index_name, params, version)
        ttl = self.default_ttl if ttl is None else ttl
        try:
            self._enforce_max_size()
            con = self._connect()
            con.execute(
                f"INSERT OR REPLACE INTO {self.table} "
                f"(cache_key, index_name, query_hash, result_data, "
                f" result_count, expires_at) VALUES (?, ?, ?, ?, ?, ?)",
                (key, index_name, self._query_hash(params),
                 _ipc_bytes(result), result.num_rows,
                 int(time.time()) + ttl))
            con.commit()
            self.stats["writes"] += 1
            return True
        except sqlite3.Error:
            self.stats["errors"] += 1
            return False

    def invalidate(self, index_name: str) -> int:
        if not self.enabled:
            return 0
        try:
            con = self._connect()
            cur = con.execute(
                f"DELETE FROM {self.table} WHERE index_name = ?",
                (index_name,))
            con.commit()
            self.stats["evictions"] += cur.rowcount
            return cur.rowcount
        except sqlite3.Error:
            self.stats["errors"] += 1
            return 0

    def invalidate_by_query(self, index_name: str, pattern: str) -> int:
        if not self.enabled:
            return 0
        try:
            con = self._connect()
            cur = con.execute(
                f"DELETE FROM {self.table} "
                f"WHERE index_name = ? AND query_hash LIKE ?",
                (index_name, f"%{pattern}%"))
            con.commit()
            self.stats["evictions"] += cur.rowcount
            return cur.rowcount
        except sqlite3.Error:
            self.stats["errors"] += 1
            return 0

    def clear(self) -> int:
        if not self.enabled:
            return 0
        try:
            con = self._connect()
            cur = con.execute(f"DELETE FROM {self.table}")
            con.commit()
            self.stats["evictions"] += cur.rowcount
            return cur.rowcount
        except sqlite3.Error:
            self.stats["errors"] += 1
            return 0

    def clean_expired(self) -> int:
        try:
            con = self._connect()
            cur = con.execute(
                f"DELETE FROM {self.table} WHERE expires_at <= ?",
                (int(time.time()),))
            con.commit()
            return cur.rowcount
        except sqlite3.Error:
            self.stats["errors"] += 1
            return 0

    def _enforce_max_size(self) -> None:
        try:
            con = self._connect()
            n = con.execute(
                f"SELECT COUNT(*) FROM {self.table}").fetchone()[0]
            if n >= self.max_size:
                keep = int(self.max_size * 0.8)
                cur = con.execute(
                    f"DELETE FROM {self.table} WHERE cache_key IN ("
                    f"  SELECT cache_key FROM {self.table} "
                    f"  ORDER BY last_accessed ASC LIMIT ?)",
                    (n - keep,))
                con.commit()
                self.stats["evictions"] += cur.rowcount
        except sqlite3.Error:
            self.stats["errors"] += 1

    def size(self) -> int:
        if not self.enabled:
            return 0
        return self._connect().execute(
            f"SELECT COUNT(*) FROM {self.table}").fetchone()[0]

    def get_stats(self) -> dict:
        out = dict(self.stats)
        total = out["hits"] + out["misses"]
        out["hit_rate"] = (out["hits"] / total) if total else 0.0
        out["entries"] = self.size()
        return out

    def close(self) -> None:
        if self._conn is not None:
            self._conn.close()
            self._conn = None

"""Query-result cache: LRU + canonical NBQL cache keys.

Reference: ``cache/cache.go`` (generic LRU with eviction/hit/miss callbacks
and hit/miss counters) and ``api/nbql/cache_key.go:17-95`` (canonical key
from a QueryStatement: metric | REL:dur-or-ABS:start-end | sorted tags |
DS:interval[,EMPTY]:agg specs | sort order). The reference builds both
pieces but never wires them into its executor (SURVEY.md §4 — the cache is
referenced only by its own test); this rebuild wires them and adds the part
the reference left undefined: **invalidation**. Every mutation (put, bulk
ingest, delete, compact, restore) bumps the engine's write generation; a
cached entry is valid only while its generation matches, so a cache hit is
always exactly what re-running the query would return.

Per ``cache_key.go:88-91``, LIMIT and AFTER (cursor) are *excluded* from
the key: the full result is cached once and pagination is applied to the
cached rows, so every page of a scan is one execution, not one per page.

This makes relative-time queries (``FROM RELATIVE(dur)``) cacheable too —
the reference singles them out (``cache_key.go:27-30``) — because the
engine anchors RELATIVE to the data's max timestamp, which only moves when
a write bumps the generation. (Quirk inherited with the design: a point
with a *future* timestamp becomes visible to an ABS:..-now query only after
the next write; the reference's unwired cache has the same property.)
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Callable
from dataclasses import dataclass

from nexusbase_spark.nbql.ast import QueryStatement


class LRUCache:
    """Fixed-size LRU (cache/cache.go): capacity <= 0 disables; optional
    eviction callback; hit/miss counters (the expvar metrics analog).
    Thread-safe: the threaded TCP/HTTP servers run _query_cached on
    connection threads (cache/cache.go holds a sync.Mutex for the same
    reason), so get/put/clear serialize on an internal lock — otherwise
    hit/miss counters race and two concurrent put() evictions can
    double-fire the eviction callback (ADVICE r6). Evicted entries are
    collected under the lock but the callback fires AFTER it is released
    (ADVICE r7): each eviction still fires exactly once (popitem removes
    the entry before any other thread can evict it again), and a
    callback that re-enters the cache — a user _emit hook that reads or
    warms it — no longer deadlocks on the non-reentrant Lock."""

    def __init__(self, capacity: int,
                 on_evicted: Callable[[str, object], None] | None = None):
        import threading
        self.capacity = capacity
        self._items: OrderedDict[str, object] = OrderedDict()
        self._on_evicted = on_evicted
        self._mu = threading.Lock()
        self.hits = 0
        self.misses = 0

    def __len__(self) -> int:
        with self._mu:
            return len(self._items)

    def get(self, key: str):
        """-> (value, ok). A disabled cache misses silently without
        counting (cache/cache.go Get's disabled-cache branch)."""
        if self.capacity <= 0:
            return None, False
        with self._mu:
            if key in self._items:
                self._items.move_to_end(key)
                self.hits += 1
                return self._items[key], True
            self.misses += 1
            return None, False

    def put(self, key: str, value: object) -> None:
        if self.capacity <= 0:
            return
        evicted: list[tuple[str, object]] = []
        with self._mu:
            if key in self._items:
                self._items.move_to_end(key)
            self._items[key] = value
            while len(self._items) > self.capacity:
                evicted.append(self._items.popitem(last=False))
        if self._on_evicted is not None:
            for old_key, old_val in evicted:
                self._on_evicted(old_key, old_val)

    def clear(self) -> None:
        with self._mu:
            self._items.clear()

    def reclassify_hit_as_miss(self) -> None:
        """A generation-stale entry counts as a miss in the metrics
        (engine._query_cached) — adjust both counters under the same
        lock the get() that counted the hit used."""
        with self._mu:
            self.hits -= 1
            self.misses += 1


def query_cache_key(q: QueryStatement) -> str:
    """Canonical key for a QueryStatement (api/nbql/cache_key.go:17-95).
    Semantically identical queries written differently (tag order) share a
    key; LIMIT/AFTER are excluded (pagination works on the cached rows)."""
    parts: list[str] = [q.metric, "|"]
    if q.relative is not None:
        parts += ["REL:", str(q.relative)]
    else:
        parts += ["ABS:", str(q.start), "-", str(q.end)]
    parts.append("|")
    parts.append(",".join(f"{k}={v}" for k, v in sorted(q.tags.items())))
    parts.append("|")
    if q.aggregations:
        if q.downsample_interval:
            parts += ["DS:", str(q.downsample_interval)]
            if q.emit_empty_windows:
                parts.append(",EMPTY")
            parts.append(":")
        parts.append(",".join(
            f"{s.func}({s.field})" + (f" as {s.alias}" if s.alias else "")
            for s in q.aggregations))
    parts.append("|")
    parts.append("DESC" if q.sort_desc else "ASC")
    return "".join(parts)


@dataclass
class CachedResult:
    """One cached full (unpaginated) result: rows in final sort order,
    the result schema, and the write generation it was computed at."""
    generation: int
    rows: list
    schema: object


def paginate_rows(rows: list, q: QueryStatement) -> list:
    """Apply AFTER + LIMIT to cached, already-ordered rows — the
    'pagination is applied to the cached result' half of cache_key.go's
    contract. Cursors only exist for raw point streams (the cursor is a
    point key); aggregate results just take the LIMIT slice."""
    out = rows
    if q.after_cursor and not q.aggregations:
        from nexusbase_spark.operators.order import decode_cursor
        cur = decode_cursor(q.after_cursor)
        out = [r for r in out if _after_raw(r, cur, q.sort_desc)]
    if q.limit:
        out = out[:q.limit]
    return out


def _after_raw(row, cursor: tuple[int, str, int], descending: bool) -> bool:
    """Driver-side twin of operators/order._after_pred: strictly-after the
    cursor key in (ts, series_key, seq desc) stream order. seq compares
    DESC-within-key in both directions (MVCC preference)."""
    ts, sk, seq = cursor
    if row["ts"] != ts:
        return row["ts"] < ts if descending else row["ts"] > ts
    if row["series_key"] != sk:
        return row["series_key"] < sk if descending else row["series_key"] > sk
    return row["seq"] < seq

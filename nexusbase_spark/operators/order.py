"""Global ordering, LIMIT, and keyset-cursor pagination.

Reference: the k-way merge heap orders the stream by
(timestamp, series_key, seq DESC), ASC or DESC (``iterator/iterator.go:34-75``).
LIMIT is carried but NOT enforced by engine2 (SURVEY.md §2.7) — the NBQL
executor only uses it to decide whether to return a cursor
(``api/nbql/executor.go:347-351``); this rebuild enforces it. The cursor is a
base64-encoded last-key; the engine wraps the stream in a SkippingIterator
that drops everything up to and including that key
(``iterator/skipping_iterator.go:12-52``).

Spark mapping: orderBy + limit compiles to TakeOrderedAndProject — a
distributed top-K, each partition keeps only K rows, no global sort. The
cursor becomes a keyset predicate (strictly-after filter) that pushes down
to the scan; pagination cost is O(page), not O(offset).
"""

from __future__ import annotations

import base64
import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Cursor = tuple[int, str, int]  # (ts, series_key, seq)


def order_points(df: DataFrame, descending: bool = False) -> DataFrame:
    """(ts, series_key, seq desc); DESC reverses ts and series_key but a
    higher seq still sorts first among full-key ties (MVCC preference)."""
    if descending:
        return df.orderBy(F.col("ts").desc(), F.col("series_key").desc(), F.col("seq").desc())
    return df.orderBy(F.col("ts").asc(), F.col("series_key").asc(), F.col("seq").desc())


def _after_pred(c: Cursor, descending: bool) -> Column:
    ts, sk, seq = c
    t, s = F.col("ts"), F.col("series_key")
    if descending:
        return (
            (t < ts)
            | ((t == ts) & (s < sk))
            | ((t == ts) & (s == sk) & (F.col("seq") < seq))
        )
    return (
        (t > ts)
        | ((t == ts) & (s > sk))
        | ((t == ts) & (s == sk) & (F.col("seq") < seq))
    )


def keyset_after(df: DataFrame, cursor: Cursor, descending: bool = False) -> DataFrame:
    """Strictly-after filter (skip-up-to-and-including-cursor semantics,
    iterator/skipping_iterator.go:28-48)."""
    return df.filter(_after_pred(cursor, descending))


def encode_cursor(ts: int, series_key: str, seq: int) -> str:
    """base64 last-key, like api/nbql/executor.go:347-351."""
    return base64.b64encode(json.dumps([ts, series_key, seq]).encode()).decode()


def decode_cursor(cursor: str) -> Cursor:
    """Client-supplied string -> (ts, series_key, seq). ANY malformed
    cursor (bad base64, bad UTF-8, bad JSON, wrong shape/types) raises
    NBQLError — the servers' clean protocol-rejection class — instead of
    leaking binascii/JSONDecode/UnicodeDecode errors to the transport
    (found by fuzzing AFTER with garbage; the reference returns a decode
    error to the client the same way, api/nbql/executor.go cursor
    handling)."""
    from nexusbase_spark.nbql.parser import NBQLError

    try:
        ts, sk, seq = json.loads(base64.b64decode(cursor, validate=True))
        return int(ts), str(sk), int(seq)
    except NBQLError:  # pragma: no cover - int()/str() don't raise it
        raise
    except Exception as e:
        raise NBQLError(f"invalid cursor: {e}") from e


def paginate(
    df: DataFrame,
    limit: int,
    after: str | None = None,
    descending: bool = False,
) -> tuple[DataFrame, str | None]:
    """One page + the next cursor (None when the page wasn't full)."""
    page_df = df
    if after:
        page_df = keyset_after(page_df, decode_cursor(after), descending)
    rows = order_points(page_df, descending).limit(limit).collect()
    next_cursor = None
    if len(rows) == limit:
        last = rows[-1]
        next_cursor = encode_cursor(last["ts"], last["series_key"], last["seq"])
    page = df.sparkSession.createDataFrame(rows, df.schema) if rows else df.limit(0)
    return page, next_cursor

"""BPE-style merge mining: learn the top pair-merge table from a corpus.

Vocabulary induction (the core loop of byte-pair encoding, Sennrich et al.
2016 — public method) at corpus scale: repeatedly find the most frequent
ADJACENT token pair, fuse it into one unit, recount. The merge table is
the artifact a tokenizer trains on; mining it over the full corpus is a
canonical "iterative algorithm on DataFrames" shape.

Representation: each document is one delimiter-encoded string —
``' ' + tokens joined by two spaces + ' '`` — so a greedy non-overlapping
left-to-right ``replace`` of ``' l  r '`` with ``' l_r '`` implements the
BPE fuse EXACTLY (each neighbor gap keeps one space when a match consumes
the other, so the two-space invariant self-restores; overlapping
occurrences like ``a a a`` fuse non-overlapping just as BPE does). Both
JVM ``replace`` and any ANSI engine share these semantics, which keeps
the operator oracle-checkable. Tokens containing ``'_'`` would conflate
with fused symbols — fine for word corpora, documented limit.

Per round the cluster does: one map-side-combined pair count + a
distributed top-1 (TakeOrderedAndProject, 1 row to the driver) + a lazy
narrow column rewrite. The corpus is eagerly ``localCheckpoint``-ed each
round — iterative lineage otherwise re-executes all prior rounds per
action and the plan grows without bound (see SCALE.md round-2 notes; at
100 TB you would persist to storage instead, same shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexusbase_spark.pipeline.text import tokens_col

_SEP = "\x01"  # sorts below all printable chars: pair-string order == (l, r)


def _pair_counts(s) -> "F.Column":
    toks = F.split(F.trim(s), "  ")
    cnt = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(F.slice(toks, 1, cnt), F.slice(toks, 2, cnt),
                      lambda a, b: F.concat_ws(_SEP, a, b))


def learn_merges(df: DataFrame, rounds: int = 3, *,
                 text_col: str = "text") -> list[tuple[int, str, str, int]]:
    """The first ``rounds`` BPE merges over the corpus:
    [(round, lhs, rhs, pair_count), ...]. Ties break on (lhs, rhs)."""
    s = F.concat(F.lit(" "),
                 F.concat_ws("  ", tokens_col(F.col(text_col))),
                 F.lit(" "))
    cur = df.select(s.alias("s")).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, rounds + 1):
        top = (cur.select(F.explode(_pair_counts(F.col("s"))).alias("pr"))
               .groupBy("pr").agg(F.count(F.lit(1)).alias("c"))
               .orderBy(F.col("c").desc(), F.col("pr"))
               .limit(1).collect())
        if not top:
            break
        l, r = top[0]["pr"].split(_SEP, 1)
        merges.append((rnd, l, r, top[0]["c"]))
        cur = (cur.select(F.replace(
            F.col("s"),
            F.lit(f" {l}  {r} "), F.lit(f" {l}_{r} ")).alias("s"))
            .localCheckpoint(eager=True))
    return merges


def merges_df(spark: SparkSession, df: DataFrame, rounds: int = 3, *,
              text_col: str = "text") -> DataFrame:
    """``learn_merges`` as a DataFrame (round, lhs, rhs, pair_count)."""
    rows = learn_merges(df, rounds, text_col=text_col)
    return spark.createDataFrame(
        rows, "round long, lhs string, rhs string, pair_count long")


def encode_with_merges(df: DataFrame, merges: list[tuple[int, str, str, int]],
                       *, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Apply a learned merge table to the corpus — the tokenizer-APPLY
    step that follows mining: -> (id, tokens array after all merges,
    n_tokens). Merges apply in learned order (merge i+1 was mined on the
    corpus with merges 1..i already fused; the nested replace reproduces
    exactly that sequence).

    Unlike mining, encoding is NOT iterative state: the k merges are
    constants, so the whole chain is one narrow projection of k nested
    ``replace`` calls inside a single whole-stage-codegen stage — no
    actions, no checkpoints, no shuffle. At 100 TB this is a pure
    map-side pass."""
    s = F.concat(F.lit(" "),
                 F.concat_ws("  ", tokens_col(F.col(text_col))),
                 F.lit(" "))
    for _rnd, l, r, _c in merges:
        s = F.replace(s, F.lit(f" {l}  {r} "), F.lit(f" {l}_{r} "))
    toks = F.split(F.trim(s), "  ")
    return df.select(F.col(id_col), toks.alias("tokens"),
                     F.size(toks).alias("n_tokens"))

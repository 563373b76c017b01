"""Semantic unit tests for the pipeline operators whose guarantees the
oracle parity check can't express (it only checks value equality)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexusbase_spark.pipeline.dedup import containment_pairs, near_dup_pairs
from nexusbase_spark.pipeline.similarity import int8_topk, quantize_int8
from nexusbase_spark.pipeline.text import winnow_fingerprints


def test_winnowing_guarantee(spark):
    """Any shared run of n+w-1 = 6 tokens must yield at least one shared
    fingerprint (the winnowing paper's correctness property)."""
    shared = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(1, f"intro words {shared} tail one"),
         (2, f"completely different prefix {shared}")],
        "doc_id long, text string")
    fp = df.select("doc_id", F.explode(
        winnow_fingerprints(F.col("text"), 3, 4)).alias("fp"))
    a = {r["fp"] for r in fp.filter("doc_id = 1").collect()}
    b = {r["fp"] for r in fp.filter("doc_id = 2").collect()}
    assert a & b, "shared 6-token run produced no shared fingerprint"
    # short doc (< n+w-1 tokens) -> empty fingerprint set, not a crash
    short = spark.createDataFrame([(3, "just four tokens here")],
                                  "doc_id long, text string")
    assert short.select(F.explode(
        winnow_fingerprints(F.col("text"), 3, 4))).count() == 0


def test_exact_dedup_keepers_matches_window_form(spark):
    """The keeper-only aggregation form (r10) selects exactly the rows
    the window form keeps — same keeper per duplicate group (min id),
    same carried columns from the KEEPER row (duplicates agree on
    normalized text, not on raw text, so carry values can differ within
    a group)."""
    from nexusbase_spark.pipeline.dedup import (exact_dedup_groups,
                                                exact_dedup_keepers)
    df = spark.createDataFrame(
        [(1, "Hello World ", 12), (2, "hello world", 11),
         (3, "unique doc", 10), (4, "HELLO WORLD", 11)],
        "doc_id long, text string, n_chars long")
    want = {(r["doc_id"], r["n_chars"])
            for r in exact_dedup_groups(df, carry_cols=["n_chars"])
            .filter(F.col("doc_id") == F.col("keeper")).collect()}
    got = {(r["doc_id"], r["n_chars"])
           for r in exact_dedup_keepers(df, carry_cols=["n_chars"]).collect()}
    assert got == want == {(1, 12), (3, 10)}


def test_containment_catches_truncation(spark):
    """A 60%-prefix copy scores containment 1.0 but Jaccard ~0.55: the
    asymmetric metric finds it at threshold 0.8, Jaccard at 0.8 doesn't."""
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep dark forest tonight")
    prefix = " ".join(base.split()[:11])
    df = spark.createDataFrame([(1, base), (2, prefix)],
                               "doc_id long, text string")
    # 8 bands x 1 row: high-recall banding so the (deterministic) md5
    # min-hashes of a J~0.53 pair certainly share a band
    cont = containment_pairs(df, num_hashes=8, bands=8, threshold=0.8).collect()
    assert [(r["id_a"], r["id_b"]) for r in cont] == [(1, 2)]
    assert cont[0]["containment"] == 1.0
    jac = near_dup_pairs(df, num_hashes=8, bands=8, threshold=0.8).collect()
    assert jac == []


def test_int8_quantization_bounds_and_ranking(spark):
    """Quantized components stay in [-127, 127]; an identical vector ranks
    first with cosine 1.0."""
    df = spark.createDataFrame(
        [(0, [1.0, -2.0, 3.0]), (1, [1.0, -2.0, 3.0]), (2, [-3.0, 1.0, 0.5])],
        "vec_id long, embedding array<double>")
    q = quantize_int8(df).select(F.explode("q").alias("v")).collect()
    assert all(-127 <= r["v"] <= 127 for r in q)
    assert any(abs(r["v"]) == 127 for r in q)  # max component hits full scale
    top = int8_topk(df, k=2, probe_id=0).collect()
    assert top[0]["vec_id"] == 1 and abs(top[0]["cosine"] - 1.0) < 1e-12


def test_repetition_ratio_semantics(spark):
    """Known repetition: 'a b a b a b' has 5 2-grams, 2 distinct -> 0.6;
    a no-repeat doc scores 0.0; a 1-token doc scores 0.0 (not NaN)."""
    from nexusbase_spark.pipeline.text import repetition_ratio
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "all tokens here are unique"), (3, "one")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["r"] for r in
           df.select("doc_id", repetition_ratio(F.col("text"), 2).alias("r")).collect()}
    assert abs(out[1] - 0.6) < 1e-12
    assert out[2] == 0.0 and out[3] == 0.0


def test_pii_redaction(spark):
    """Emails and IPv4 literals are counted and replaced with typed
    placeholders; clean text passes through (lowercased) untouched."""
    from nexusbase_spark.pipeline.text import pii_exprs
    df = spark.createDataFrame(
        [(1, "Mail Bob@Example.COM or admin@corp.io from 192.168.0.1 now"),
         (2, "no pii here at all")],
        "doc_id long, text string")
    e = pii_exprs(F.col("text"))
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id", e["n_emails"].alias("n_emails"), e["n_ips"].alias("n_ips"),
        e["redacted"].alias("red")).collect()}
    assert rows[1]["n_emails"] == 2 and rows[1]["n_ips"] == 1
    assert rows[1]["red"] == "mail <EMAIL> or <EMAIL> from <IP> now"
    assert rows[2]["n_emails"] == 0 and rows[2]["n_ips"] == 0
    assert rows[2]["red"] == "no pii here at all"


def test_assign_split_stable_under_append(spark):
    """A doc's split never changes when the corpus grows — the property
    that makes held-out sets trustworthy across incremental ingests."""
    from nexusbase_spark.pipeline.split import assign_split

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    small = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"]: r["split"]
          for r in assign_split(small, "doc_id", fr).collect()}
    s2 = {r["doc_id"]: r["split"]
          for r in assign_split(big, "doc_id", fr).collect()}
    assert all(s2[k] == v for k, v in s1.items())
    # every named split is populated and fractions are roughly honored
    from collections import Counter
    c = Counter(s2.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.7 < c["train"] / 1000 < 0.9
    # different salt -> different assignment (not doc_id-ordinal)
    s3 = {r["doc_id"]: r["split"]
          for r in assign_split(big, "doc_id", fr, salt="other").collect()}
    assert any(s3[k] != s2[k] for k in s3)


def test_stratified_sample_monotone_and_rated(spark):
    """Lowering a stratum's rate yields a subset of the higher-rate sample
    (same salt), and unknown strata fall back to default_rate."""
    from nexusbase_spark.pipeline.split import stratified_sample

    df = (spark.range(0, 1000).withColumnRenamed("id", "doc_id")
          .withColumn("lang", F.when(F.col("doc_id") % 2 == 0, "en")
                      .otherwise("xx")))
    lo = stratified_sample(df, "doc_id", "lang", {"en": 0.2}).collect()
    hi = stratified_sample(df, "doc_id", "lang", {"en": 0.6}).collect()
    lo_ids = {r["doc_id"] for r in lo}
    hi_ids = {r["doc_id"] for r in hi}
    assert lo_ids <= hi_ids
    assert all(r["lang"] == "en" for r in hi)  # default_rate=0 drops xx
    assert 0.1 < len(lo_ids) / 500 < 0.3 and 0.5 < len(hi_ids) / 500 < 0.7
    # default_rate keeps unknown strata at the fallback rate
    kept = stratified_sample(df, "doc_id", "lang", {"en": 0.0},
                             default_rate=1.0).collect()
    assert {r["lang"] for r in kept} == {"xx"}
    assert len(kept) == 500


def test_corpus_mix_shares(spark):
    from nexusbase_spark.pipeline.split import corpus_mix

    df = spark.createDataFrame(
        [("a", 10), ("a", 30), ("b", 60)], "src string, w long")
    rows = {r["src"]: r for r in corpus_mix(df, "src", "w").collect()}
    assert rows["a"]["n_docs"] == 2 and rows["b"]["n_docs"] == 1
    assert rows["a"]["total_weight"] == 40 and rows["b"]["total_weight"] == 60
    assert abs(rows["a"]["pct_docs"] - 66.6667) < 1e-4
    assert rows["a"]["pct_weight"] == 40.0 and rows["b"]["pct_weight"] == 60.0


@pytest.mark.nightly
def test_lsh_topk_recall_and_multiprobe(spark):
    """A near-duplicate of the probe always lands in its bucket (identical
    signs -> identical signature), and hamming-1 multi-probe candidates
    are a superset of exact-bucket candidates."""
    import random

    from nexusbase_spark.pipeline.similarity import (
        hyperplanes, lsh_bucket_col, lsh_topk)

    rng = random.Random(7)
    dim = 16
    probe = [rng.uniform(-1, 1) for _ in range(dim)]
    near = [x * 1.01 for x in probe]          # same direction -> same signs
    rows = [(0, probe), (1, near)] + [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(2, 60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = lsh_topk(df, probe, k=5, nbits=6, hamming=0, exclude_id=0).collect()
    assert got and got[0]["vec_id"] == 1 and got[0]["cosine"] > 0.9999

    planes = hyperplanes(6, dim)
    b = df.withColumn("b", lsh_bucket_col(F.col("embedding"), planes))
    pb = b.filter("vec_id = 0").collect()[0]["b"]
    exact = {r["vec_id"] for r in b.filter(F.col("b") == pb).collect()}
    multi = {r["vec_id"] for r in lsh_topk(
        df, probe, k=60, nbits=6, hamming=1, exclude_id=0).collect()}
    assert (exact - {0}) <= multi

    # hamming-2 widens the candidate set monotonically (r3: was a
    # guarded NotImplementedError); hamming-3 is still guarded
    h2 = {r["vec_id"] for r in lsh_topk(
        df, probe, k=60, nbits=6, hamming=2, exclude_id=0).collect()}
    assert multi <= h2
    with pytest.raises(NotImplementedError):
        lsh_topk(df, probe, k=5, nbits=6, hamming=3, exclude_id=0)

    # multi-TABLE union (r3): candidates across L tables are a superset
    # of table-0's, and the near-duplicate still ranks first
    l2 = {r["vec_id"] for r in lsh_topk(
        df, probe, k=60, nbits=6, hamming=1, n_tables=2,
        exclude_id=0).collect()}
    assert multi <= l2
    top = lsh_topk(df, probe, k=5, nbits=6, hamming=1, n_tables=4,
                   exclude_id=0).collect()
    assert top[0]["vec_id"] == 1 and top[0]["cosine"] > 0.9999
    # table seeds are independent: table-1 planes differ from table-0's
    assert hyperplanes(6, dim, table=1) != planes


def test_pack_assignments_budget_and_overflow_bound(spark):
    """Every pack's token total is < budget + its longest doc (bounded
    overflow), offsets are consistent with doc order, and assignment is
    stable under appends (same salted shard => same prefix sums)."""
    from nexusbase_spark.pipeline.pack import pack_assignments

    import random
    rng = random.Random(3)
    rows = [(i, rng.randint(5, 90)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_assignments(df, "doc_id", "n_tok", budget=128, shards=4).collect()
    by_pack: dict[tuple, list] = {}
    for r in out:
        by_pack.setdefault((r["shard"], r["pack_id"]), []).append(r)
    for rows_ in by_pack.values():
        total = sum(r["n_tok"] for r in rows_)
        longest = max(r["n_tok"] for r in rows_)
        # the last doc may straddle the cut; everything before fits
        assert total < 128 + longest
        for r in rows_:
            assert 0 <= r["pack_offset"] < 128
    # append stability: first 300 docs keep their assignment when more arrive
    more = df.unionByName(spark.createDataFrame(
        [(i, 10) for i in range(300, 400)], "doc_id long, n_tok long"))
    out2 = {r["doc_id"]: (r["shard"], r["pack_id"], r["pack_offset"])
            for r in pack_assignments(more, "doc_id", "n_tok",
                                      budget=128, shards=4).collect()}
    # NOTE: append stability holds per shard only for ids sorting AFTER
    # existing ones; ids interleave here, so check the invariant that
    # shard membership (hash) never moves
    shard1 = {r["doc_id"]: r["shard"] for r in out}
    assert all(out2[k][0] == v for k, v in shard1.items())


def test_interleave_by_weight_proportions(spark):
    """In any aligned prefix of the mix, strata appear ~proportionally to
    their weights, and zero-weight strata are absent."""
    from nexusbase_spark.pipeline.pack import interleave_by_weight

    rows = [(i, "a" if i % 3 == 0 else ("b" if i % 3 == 1 else "c"))
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, s string")
    got = interleave_by_weight(df, "doc_id", "s",
                               {"a": 2.0, "b": 1.0, "c": 0.0}, n=90).collect()
    from collections import Counter
    c = Counter(r["s"] for r in got)
    assert c["c"] == 0
    assert c["a"] == 2 * c["b"]
    # positions are non-decreasing in the returned order
    pos = [r["mix_pos"] for r in got]
    assert pos == sorted(pos)


def test_chunk_documents_windows_and_edges(spark):
    """Chunks start every `stride` tokens, cover `chunk_tokens` (short at
    the tail), never start at/past the token count, and empty docs emit
    nothing; adjacent chunks overlap by chunk_tokens - stride."""
    from nexusbase_spark.pipeline.pack import chunk_documents

    rows = [(1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "only two"),                            # 2 tokens
            (3, "")]                                    # split('') -> [''] (1 token)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["start_tok"] for r in d1] == [0, 3, 6, 9]
    assert [r["n_tok"] for r in d1] == [4, 4, 4, 1]
    assert [r["chunk_idx"] for r in d1] == [0, 1, 2, 3]
    assert [r["start_tok"] for r in by_doc[2]] == [0]
    assert by_doc[2][0]["n_tok"] == 2
    # doc 3: split("") yields [""], one 1-token chunk of the empty token —
    # consistent with the oracle's string_split semantics
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_tok"] == 1
    # overlap check: chunk 1 of doc 1 covers tokens 3..6 (stride 3, size 4)
    import hashlib
    want = hashlib.md5(" ".join(f"t{i}" for i in range(3, 7)).encode()).hexdigest()
    assert d1[1]["chunk_hash"] == want

    import pytest
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)


def test_quality_filter_first_fail_reason(spark):
    """Rule flags fire independently; `reason` is the FIRST failing rule
    in QUALITY_RULE_ORDER; keep <=> no rule fails."""
    from nexusbase_spark.pipeline.text import quality_filter_exprs

    short_and_digits = "99 88 77"                      # too_short beats high_digit
    repeated = " ".join(["the of and is"] * 10)        # 40 tokens, heavy 2-gram dups
    clean = "the cat sat on the mat and then the dog came in to see " \
            "what was going on in the little house by the sea"
    rows = [(1, short_and_digits), (2, repeated), (3, clean)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fx = quality_filter_exprs(df["text"])
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", *[v.alias(k) for k, v in fx.items()]).collect()}
    assert out[1]["too_short"] and out[1]["high_digit"]
    assert out[1]["reason"] == "too_short" and not out[1]["keep"]
    assert out[2]["high_repetition"] and out[2]["reason"] == "high_repetition"
    assert out[3]["keep"] and out[3]["reason"] is None


def test_knn_classify_majority_and_tiebreak(spark):
    """Majority label wins; vote ties resolve to the smallest label; the
    two-phase top-k returns the same set as a naive global ranking."""
    from nexusbase_spark.pipeline.similarity import knn_classify

    # axis-aligned 2d vectors: probe [1,0] is closest to label-1 cluster
    rows = [
        (10, [1.0, 0.0], 1), (11, [0.9, 0.1], 1),
        (12, [0.0, 1.0], 2), (13, [0.1, 0.9], 2), (14, [0.5, 0.5], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    probes = spark.createDataFrame([(0, [1.0, 0.05])],
                                   "probe_id long, vec array<double>")
    out = knn_classify(df, probes, k=3).collect()
    assert len(out) == 1
    assert out[0]["pred_label"] == 1 and out[0]["votes"] == 2
    # k=4 -> two labels at 2 votes each: tie breaks to smallest label
    out4 = knn_classify(df, probes, k=4).collect()
    assert out4[0]["pred_label"] == 1 and out4[0]["votes"] == 2


def test_bucket_clusters_star_equals_clique(spark):
    """Docs sharing LSH buckets cluster to the bucket min; a doc with no
    co-member never appears; star edges give the same components a full
    pairwise clique would."""
    from nexusbase_spark.pipeline.dedup import bucket_clusters

    same = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, same), (2, same), (7, same),
            (9, "completely different text with no overlap whatsoever here at all")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["canonical_id"]
           for r in bucket_clusters(df).collect()}
    assert got == {1: 1, 2: 1, 7: 1}


def test_temperature_weights_limits(spark):
    """alpha=1 reproduces natural shares (weight 1 everywhere); alpha=0 is
    uniform (weight ∝ 1/natural); alpha=0.5 lifts the tail monotonically."""
    from nexusbase_spark.pipeline.split import temperature_weights

    rows = [("big",)] * 90 + [("small",)] * 10
    df = spark.createDataFrame(rows, "source string")
    w1 = {r["source"]: r for r in temperature_weights(df, "source", alpha=1.0).collect()}
    assert w1["big"]["weight_per_doc"] == 1.0 == w1["small"]["weight_per_doc"]
    w0 = {r["source"]: r for r in temperature_weights(df, "source", alpha=0.0).collect()}
    assert w0["big"]["sample_share"] == 0.5 == w0["small"]["sample_share"]
    wh = {r["source"]: r for r in temperature_weights(df, "source", alpha=0.5).collect()}
    assert wh["small"]["weight_per_doc"] > 1.0 > wh["big"]["weight_per_doc"]
    # shares always sum to 1
    assert abs(wh["big"]["sample_share"] + wh["small"]["sample_share"] - 1.0) < 1e-6


def test_cdc_chunks_shift_resistance(spark):
    """An insertion near the start changes only the chunk it lands in:
    chunk hashes after the next content-defined boundary are identical
    (fixed-width chunking would shift every later chunk)."""
    from nexusbase_spark.pipeline.pack import cdc_chunks

    base = ("the quick brown fox jumps over the lazy dog while seventeen "
            "green turtles carry umbrellas across a rainy boulevard in "
            "late november carrying various small packages home")
    edited = "XYZ " + base                       # 4-char insertion at front
    df = spark.createDataFrame([(1, base), (2, edited)],
                               "doc_id long, text string")
    rows = cdc_chunks(df).collect()
    h1 = [r["chunk_md5"] for r in sorted(
        (r for r in rows if r["doc_id"] == 1), key=lambda r: r["chunk_idx"])]
    h2 = [r["chunk_md5"] for r in sorted(
        (r for r in rows if r["doc_id"] == 2), key=lambda r: r["chunk_idx"])]
    # coverage invariant: chunks tile the doc exactly
    assert sum(r["chunk_len"] for r in rows if r["doc_id"] == 1) == len(base)
    assert sum(r["chunk_len"] for r in rows if r["doc_id"] == 2) == len(edited)
    # the tails realign: all but the first edited chunk(s) are shared
    shared = set(h1) & set(h2)
    assert len(shared) >= len(h1) - 2
    assert h1[-1] == h2[-1]                      # final chunks identical


def test_cdc_chunks_short_and_empty_docs(spark):
    """Docs shorter than the hash window get exactly ONE whole-doc chunk
    (regression: sequence(1, 0) is descending [1, 0] in Spark, which
    hashed phantom positions and cut ~1/16 of short docs past their
    end); empty docs produce no chunks."""
    from nexusbase_spark.pipeline.pack import cdc_chunks

    short_docs = [(i, "abcdefg"[:n]) for i, n in enumerate(range(8))]
    df = spark.createDataFrame(short_docs, "doc_id long, text string")
    rows = cdc_chunks(df, window=8, mask_hex="").collect()  # mask '' = every position cuts
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 0 not in by_doc                       # empty doc -> no chunks
    for i, text in short_docs[1:]:
        assert len(by_doc[i]) == 1               # one whole-doc chunk
        (c,) = by_doc[i]
        assert c["chunk_start"] == 1 and c["chunk_len"] == len(text)


# ---------------------------------------------------------------------------
# BM25 retrieval (pipeline/search.py)


def test_bm25_matches_hand_computation(spark):
    """Scores equal the textbook Robertson BM25 computed in plain Python
    over the same corpus (k1=1.2, b=0.75)."""
    import math

    corpus = [(1, "cat dog cat"), (2, "dog bird"), (3, "fish fish fish bird")]
    from nexusbase_spark.pipeline.search import bm25_scores
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(df, ["cat", "bird"]).collect()}

    toks = {d: t.split() for d, t in corpus}
    n, avgdl = len(corpus), sum(len(t) for t in toks.values()) / len(corpus)
    k1, b = 1.2, 0.75

    def score(d, terms):
        s = 0.0
        for t in terms:
            tf = toks[d].count(t)
            dfreq = sum(1 for tt in toks.values() if t in tt)
            idf = math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(toks[d]) / avgdl))
        return s

    for d in toks:
        assert got[d] == pytest.approx(score(d, ["cat", "bird"]), abs=1e-12)


def test_bm25_topk_rank_and_ties(spark):
    """Higher-tf doc outranks lower-tf; docs matching nothing score 0;
    equal quantized scores break ties on doc_id ascending."""
    from nexusbase_spark.pipeline.search import bm25_topk
    df = spark.createDataFrame(
        [(1, "x x x pad pad"), (2, "x pad pad pad pad"),
         (3, "pad pad pad pad pad"), (4, "x pad pad pad pad")],
        "doc_id long, text string")
    rows = bm25_topk(df, ["x"], k=4).collect()
    assert [r["doc_id"] for r in rows[:1]] == [1]          # tf=3 wins
    assert [r["doc_id"] for r in rows[1:3]] == [2, 4]      # tie -> id asc
    assert rows[3]["doc_id"] == 3 and rows[3]["score"] == 0.0


def test_bm25_topk_is_distributed_topk(spark):
    """The ranking compiles to TakeOrderedAndProject (per-partition heaps),
    not a global Sort."""
    from nexusbase_spark.pipeline.search import bm25_topk
    df = spark.createDataFrame([(i, "x pad") for i in range(10)],
                               "doc_id long, text string")
    plan = bm25_topk(df, ["x"], k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


@pytest.mark.nightly
def test_corpus_stats_incremental_equals_batch(spark, tmp_path):
    """CorpusStats maintained by incremental update()s over three batches
    serves EXACTLY the ranking the batch bm25_topk computes on the union
    corpus — same ids, same quantized scores — and lookup() returns the
    true N/avgdl/df. compact() folds the delta layers without changing
    any answer."""
    from nexusbase_spark.pipeline.search import (
        CorpusStats, bm25_topk, bm25_topk_served)
    batches = [
        [(1, "cat dog cat"), (2, "dog bird")],
        [(3, "fish fish fish bird"), (4, "cat fish dog")],
        [(5, "bird bird cat dog fish")],
    ]
    schema = "doc_id long, text string"
    st = CorpusStats.build(spark, str(tmp_path / "st"), None)
    for b in batches:
        st.update(spark.createDataFrame(b, schema))
    union = spark.createDataFrame([r for b in batches for r in b], schema)

    n, avgdl, dfs = st.lookup(["cat", "bird", "nosuch"])
    assert n == 5 and avgdl == pytest.approx(17 / 5)
    assert dfs == [3, 3, 0]

    want = [(r["doc_id"], r["score"])
            for r in bm25_topk(union, ["cat", "bird"], k=5).collect()]
    got = [(r["doc_id"], r["score"]) for r in
           bm25_topk_served(union, st, ["cat", "bird"], k=5).collect()]
    assert got == want

    st.compact()
    assert st.lookup(["cat", "bird", "nosuch"]) == (n, avgdl, dfs)
    got2 = [(r["doc_id"], r["score"]) for r in
            bm25_topk_served(union, st, ["cat", "bird"], k=5).collect()]
    assert got2 == want


@pytest.mark.nightly
def test_corpus_stats_streaming_sink(spark, tmp_path):
    """CorpusStats.for_each_batch as a Structured Streaming sink: stats
    stay current as document batches arrive; retrieval served from the
    store matches the batch recompute on everything ingested so far."""
    from nexusbase_spark.pipeline.search import (
        CorpusStats, bm25_topk, bm25_topk_served)
    from nexusbase_spark.streaming.subscribe import stream_ingest

    schema = "doc_id long, text string"
    st = CorpusStats.build(spark, str(tmp_path / "st"), None)
    src = tmp_path / "doc_src"
    src.mkdir()

    def feed(rows):
        (spark.createDataFrame(rows, schema).coalesce(1)
         .write.mode("append").parquet(str(src)))

    q = (stream_ingest(spark, str(src), schema).writeStream
         .queryName("t_corpus_stats").foreachBatch(st.for_each_batch())
         .outputMode("append").start())
    try:
        feed([(1, "spark shuffles partitions"), (2, "parquet row groups")])
        q.processAllAvailable()
        feed([(3, "spark reads parquet fast"), (4, "row groups prune scans")])
        q.processAllAvailable()
    finally:
        q.stop()
    n, _avgdl, dfs = st.lookup(["spark", "parquet"])
    assert n == 4 and dfs == [2, 2]
    corpus = spark.read.parquet(str(src))
    want = [(r["doc_id"], r["score"]) for r in
            bm25_topk(corpus, ["spark", "parquet"], k=4).collect()]
    got = [(r["doc_id"], r["score"]) for r in
           bm25_topk_served(corpus, st, ["spark", "parquet"], k=4).collect()]
    assert got == want


# ---------------------------------------------------------------------------
# two-phase heavy hitters (pipeline/heavyhitters.py)


def test_heavy_hitters_exact_when_capacity_covers_vocab(spark):
    from collections import Counter

    from nexusbase_spark.pipeline.heavyhitters import heavy_hitters_topk
    texts = ["a a b c", "a b b d", "c a e", "f a"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    exact = Counter(" ".join(texts).split())
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = [(r["token"], r["cnt"])
           for r in heavy_hitters_topk(df, k=3, capacity=100).collect()]
    assert got == want


@pytest.mark.nightly
def test_heavy_hitters_mg_guarantee_under_eviction(spark):
    """With capacity 2 and a stream where 'hot' has count > n/2, the MG
    pass must keep 'hot' as a candidate, and the recount reports its EXACT
    global count (estimation never leaks into the output)."""
    from nexusbase_spark.pipeline.heavyhitters import heavy_hitters_topk
    # n = 40 tokens in one doc: hot x 24, 16 distinct tail tokens
    text = " ".join(["hot"] * 24 + [f"t{i}" for i in range(16)])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string").coalesce(1)
    rows = heavy_hitters_topk(df, k=1, capacity=2).collect()
    assert rows[0]["token"] == "hot" and rows[0]["cnt"] == 24


def test_heavy_hitters_candidate_shuffle_is_bounded(spark):
    """The phase-2 shuffle carries only candidate keys: with capacity 3 the
    counted group-by sees at most 3 keys per partition's summary, however
    large the vocabulary."""
    from nexusbase_spark.pipeline.heavyhitters import mg_candidates
    from nexusbase_spark.pipeline.text import tokens_col
    texts = [(i, " ".join(f"w{i}_{j}" for j in range(20))) for i in range(8)]
    df = (spark.createDataFrame(texts, "doc_id long, text string")
          .repartition(4))
    arrays = df.select(tokens_col(F.col("text")).alias("toks"))
    cands = mg_candidates(arrays, capacity=3)
    assert cands.count() <= 3 * 4


# ---------------------------------------------------------------------------
# SemDeDup pruning (pipeline/embdedup.py)


def test_semdedup_prune_star_semantics(spark):
    """a~b and b~c (all in one cluster): b and c both drop — every vector
    with ANY smaller-id near-dup goes, the min id survives. A distant
    vector and a near-dup in a DIFFERENT cluster both survive (pair search
    is cluster-local by design)."""
    from nexusbase_spark.pipeline.embdedup import semdedup_prune
    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [1.0, 0.001]),    # ~ id 1
        (3, 0, [1.0, 0.002]),    # ~ ids 1,2
        (4, 0, [0.0, 1.0]),      # distant
        (5, 1, [1.0, 0.0]),      # identical to id 1, other cluster
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    surv = sorted(r["vec_id"] for r in semdedup_prune(df, 0.999).collect())
    assert surv == [1, 4, 5]


# ---------------------------------------------------------------------------
# BPE merge mining (pipeline/bpe.py)


def test_bpe_greedy_nonoverlap_and_fused_unit(spark):
    """'a a a' fuses non-overlapping to [a_a, a] (BPE greedy), and the
    fused symbol participates as ONE unit in the next round."""
    from nexusbase_spark.pipeline.bpe import learn_merges
    # 'a a' occurs 2x per doc pre-merge (overlapping), 3 docs -> count 6
    df = spark.createDataFrame([(i, "a a a") for i in range(3)],
                               "doc_id long, text string")
    merges = learn_merges(df, rounds=2)
    assert merges[0] == (1, "a", "a", 6)
    # greedy fuse leaves [a_a, a] (NOT [a_a, a_a]) -> only pair is
    # (a_a, a), once per doc
    assert merges[1] == (2, "a_a", "a", 3)


def test_bpe_encode_applies_merges_in_order(spark):
    """encode_with_merges reproduces the mined fusion sequence: after 2
    merges of 'a a a b' corpora, encoding yields the same token streams
    the mining loop's internal state held — and a doc the miner never
    saw encodes by the same rules."""
    from nexusbase_spark.pipeline.bpe import encode_with_merges, learn_merges
    df = spark.createDataFrame([(i, "a a a b") for i in range(3)],
                               "doc_id long, text string")
    merges = learn_merges(df, rounds=2)
    # round 2 ties (a_a,a) with (a,b) at 3; (a,b) wins — the \x01 pair
    # separator sorts below '_', so 'a\x01b' < 'a_a\x01a'
    assert [(m[1], m[2]) for m in merges] == [("a", "a"), ("a", "b")]
    enc = {r["doc_id"]: (r["tokens"], r["n_tokens"])
           for r in encode_with_merges(df, merges).collect()}
    assert enc[0] == (["a_a", "a_b"], 2)
    unseen = spark.createDataFrame([(9, "a a b a a a")],
                                   "doc_id long, text string")
    out = encode_with_merges(unseen, merges).collect()[0]
    # merge1 fuses greedily first: 'a_a b a_a a' — merge2's ' a  b '
    # pattern no longer matches (the lone 'a' fused), exactly the
    # order-dependence BPE encoding must reproduce
    assert out["tokens"] == ["a_a", "b", "a_a", "a"] and out["n_tokens"] == 4
    # empty merge table = identity tokenization
    out0 = encode_with_merges(unseen, []).collect()[0]
    assert out0["tokens"] == ["a", "a", "b", "a", "a", "a"]


def test_bpe_tiebreak_lexicographic(spark):
    from nexusbase_spark.pipeline.bpe import learn_merges
    df = spark.createDataFrame([(1, "z y"), (2, "b c")],
                               "doc_id long, text string")
    # both pairs count 1 -> (b, c) wins on (lhs, rhs) order
    assert learn_merges(df, rounds=1)[0] == (1, "b", "c", 1)


def test_weighted_sample_k_bias_and_determinism(spark):
    """Weight-10 items dominate a weight-1 population in the sample;
    exactly k per group; repartitioning doesn't change the sample."""
    from nexusbase_spark.pipeline.split import weighted_sample_k
    rows = [("g", i, 10.0 if i < 250 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "grp string, id long, w double")
    got = weighted_sample_k(df, "grp", 50, "id", "w").collect()
    assert len(got) == 50
    heavy = sum(1 for r in got if r["w"] == 10.0)
    assert heavy >= 40  # inclusion prob scales ~10x
    again = weighted_sample_k(df.repartition(7), "grp", 50, "id", "w").collect()
    assert {r["id"] for r in got} == {r["id"] for r in again}
    # zero/NULL weights never sampled
    df2 = spark.createDataFrame([("g", 1, 0.0), ("g", 2, None), ("g", 3, 5.0)],
                                "grp string, id long, w double")
    assert [r["id"] for r in weighted_sample_k(df2, "grp", 2, "id", "w").collect()] == [3]


def test_epoch_repeat_copy_counts_and_stability(spark):
    """floor(e) copies for everyone, one extra for a stable frac(e)
    subset; 0 epochs drops; unlisted strata get exactly 1; the extra-copy
    subset is append-stable (a doc's copy count never changes when the
    corpus grows)."""
    from nexusbase_spark.pipeline.split import epoch_repeat

    df = spark.createDataFrame(
        [(i, "a" if i < 400 else ("z" if i < 500 else "u"))
         for i in range(600)], "doc_id long, source string")
    out = epoch_repeat(df, "doc_id", {"a": 2.25, "z": 0.0}).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    # z dropped entirely; u (unlisted) exactly once
    assert all(not (500 > d >= 400) for d in by_doc)
    assert all(by_doc[d] == [0] for d in range(500, 600))
    # a: everyone 2 or 3 copies, ~25% get 3, epochs are 0..n-1
    counts = [len(by_doc[d]) for d in range(400)]
    assert set(counts) <= {2, 3}
    assert 0.15 < counts.count(3) / 400 < 0.35
    assert all(sorted(v) == list(range(len(v))) for v in by_doc.values())
    # append stability: same docs keep their counts in a bigger corpus
    big = spark.createDataFrame([(i, "a") for i in range(2000)],
                                "doc_id long, source string")
    big_out = epoch_repeat(big, "doc_id", {"a": 2.25}).collect()
    big_counts = {}
    for r in big_out:
        big_counts[r["doc_id"]] = big_counts.get(r["doc_id"], 0) + 1
    assert all(big_counts[d] == len(by_doc[d]) for d in range(400))


def test_knn_graph_ranks_within_partition(spark):
    """Every vector gets at most k neighbors, all from its own
    partition, ranked by quantized cosine desc with id tie-break; a
    partition of size <= k+1 yields size-1 neighbors."""
    from nexusbase_spark.pipeline.similarity import knn_graph
    rows = [
        (1, "a", [1.0, 0.0]), (2, "a", [0.9, 0.1]),
        (3, "a", [0.0, 1.0]), (4, "a", [-1.0, 0.0]),
        (5, "b", [1.0, 1.0]), (6, "b", [1.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>")
    out = knn_graph(df, k=2)
    by_src: dict = {}
    for r in out.collect():
        by_src.setdefault(r["id"], []).append((r["rank"], r["nbr"], r["cosine"]))
    # vec 1's nearest is 2 (0.9939), then 3 (0.0)
    assert sorted(by_src[1]) == [(1, 2, pytest.approx(0.9939)),
                                 (2, 3, 0.0)]
    # partition b has only 2 members -> exactly 1 neighbor each, cos 1.0
    assert by_src[5] == [(1, 6, 1.0)] and by_src[6] == [(1, 5, 1.0)]
    # nobody crosses partitions and nobody exceeds k
    assert all(len(v) <= 2 for v in by_src.values())
    assert not any(n in (5, 6) for v in (by_src[1], by_src[3], by_src[4])
                   for _, n, _c in v)


def test_epoch_shuffle_determinism_and_coverage(spark):
    """(shard, pos) is a permutation: every doc appears once, positions
    within a shard are 1..n_shard dense; the same epoch reproduces the
    same assignment under any partitioning; a different epoch yields a
    different order."""
    from nexusbase_spark.pipeline.split import epoch_shuffle
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = epoch_shuffle(df, "doc_id", epoch=1, num_shards=4).collect()
    assert len(out) == 200 and len({r["doc_id"] for r in out}) == 200
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))  # dense ranks

    again = epoch_shuffle(df.repartition(7), "doc_id", epoch=1,
                          num_shards=4).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in again} == \
        {(r["doc_id"], r["shard"], r["pos"]) for r in out}

    e2 = epoch_shuffle(df, "doc_id", epoch=2, num_shards=4).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in e2} != \
        {(r["doc_id"], r["shard"], r["pos"]) for r in out}


@pytest.mark.nightly
def test_budget_select_semantics(spark):
    """Selection cost never exceeds the budget; higher-score bins are
    taken before lower ones; budget >= total selects everything; the
    result is partition-invariant."""
    from nexusbase_spark.pipeline.split import budget_select
    rows = [(i, 0.9, 10) for i in range(10)] \
        + [(100 + i, 0.5, 10) for i in range(10)] \
        + [(200 + i, 0.1, 10) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, score double, cost long")

    sel = budget_select(df, "score", "cost", 150, "id").collect()
    ids = {r["id"] for r in sel}
    assert sum(r["cost"] for r in sel) <= 150
    assert all(i in ids for i in range(10))          # best bin fully in
    assert not any(i >= 200 for i in ids)            # worst bin fully out
    assert len([i for i in ids if 100 <= i < 200]) == 5  # cutoff bin partial

    assert budget_select(df, "score", "cost", 10_000, "id").count() == 30
    again = {r["id"] for r in
             budget_select(df.repartition(7), "score", "cost", 150, "id").collect()}
    assert again == ids

    # NULL scores are excluded, never crash the driver-side bin sort
    # (ADVICE r3: null -> null __bin -> TypeError negating None)
    with_null = df.unionByName(spark.createDataFrame(
        [(999, None, 10)], "id long, score double, cost long"))
    sel2 = {r["id"] for r in
            budget_select(with_null, "score", "cost", 150, "id").collect()}
    assert 999 not in sel2 and sel2 == ids


def test_scrub_frequent_chunks_removes_boiler_keeps_rest(spark):
    """Docs sharing a pasted boilerplate string (at DIFFERENT offsets)
    lose its content-defined chunks; a doc without it reconstructs to
    its exact original text (chunks partition the text losslessly)."""
    from nexusbase_spark.pipeline.dedup import scrub_frequent_chunks

    boiler = ("subscribe to our newsletter now click here for more "
              "offers terms and conditions apply")
    uniq = ["alpha beta gamma delta epsilon zeta eta theta",
            "one two three four five six seven eight nine ten",
            "lorem ipsum dolor sit amet consectetur adipiscing",
            "spark shuffle partition broadcast join window agg",
            "red orange yellow green blue indigo violet colors"]
    rows = [(i, u + " " + boiler) for i, u in enumerate(uniq)]
    rows.append((99, "completely unrelated standalone document text here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           scrub_frequent_chunks(df, min_docs=5).collect()}
    # the untouched doc reconstructs byte-identically, zero scrubbed
    assert out[99]["clean_text"] == rows[-1][1]
    assert out[99]["n_scrubbed"] == 0
    # every boilered doc lost chunks, and lost MOST of the boiler text
    for i, u in enumerate(uniq):
        assert out[i]["n_scrubbed"] >= 1, i
        assert len(out[i]["clean_text"]) < len(rows[i][1]), i
        # its own unique prefix survives (possibly plus the junction
        # fragment before the boiler's first internal CDC cut)
        assert out[i]["clean_text"].startswith(u[:20]), i


def test_scrub_no_frequent_chunks_is_identity(spark):
    from nexusbase_spark.pipeline.dedup import scrub_frequent_chunks
    rows = [(1, "totally unique text one"), (2, "another unique text two")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["clean_text"], r["n_scrubbed"])
           for r in scrub_frequent_chunks(df, min_docs=2).collect()}
    assert out == {1: (rows[0][1], 0), 2: (rows[1][1], 0)}


def test_dsir_select_prefers_target_like_docs(spark):
    """Docs written in the target's vocabulary must win the importance
    ranking over docs in a disjoint vocabulary, and the Gumbel-seeded
    selection is deterministic across runs."""
    from nexusbase_spark.pipeline.importance import dsir_select
    from pyspark.sql import functions as F

    tgt_vocab = "quantum flux entangle qubit gate circuit measure state"
    off_vocab = "pasta sauce tomato basil oven cheese crust dough"
    rows = []
    for i in range(10):      # target corpus (flagged)
        rows.append((i, "t", tgt_vocab + f" extra{i}"))
    for i in range(10, 20):  # raw candidates in the target vocabulary
        rows.append((i, "r", tgt_vocab + f" other{i}"))
    for i in range(20, 30):  # raw candidates in a disjoint vocabulary
        rows.append((i, "r", off_vocab + f" filler{i}"))
    df = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    sel = dsir_select(df, F.col("grp") == "t", k=15)
    ids = {r["doc_id"] for r in sel.collect()}
    # all 15 winners come from the target-vocabulary pool (ids < 20)
    assert all(i < 20 for i in ids), ids
    assert ids == {r["doc_id"] for r in
                   dsir_select(df, F.col("grp") == "t", k=15).collect()}


def test_pq_encode_topk_quantization_sanity(spark):
    """PQ codes reconstruct cluster structure: on a corpus of two tight
    blobs, every vector's ADC distance to a probe from blob A is far
    smaller for blob-A vectors, so top-k returns exactly blob A; and the
    codebook has one centroid per (subspace, observed code)."""
    from nexusbase_spark.pipeline.similarity import pq_encode, pq_topk

    a = [1.0, 1.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0]
    b = [0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0]
    rows = []
    for i in range(8):   # blob A with tiny deterministic jitter
        rows.append((i, [x + 0.01 * ((i + j) % 3) for j, x in enumerate(a)]))
    for i in range(8, 16):
        rows.append((i, [x + 0.01 * ((i + j) % 3) for j, x in enumerate(b)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    enc, books = pq_encode(df, m_sub=2, k_codes=2, iters=2, dim=8)
    assert set(c for (s, c) in books) <= {0, 1}
    assert all(len(v) == 4 for v in books.values())

    got = [r["vec_id"] for r in
           pq_topk(df, rows[0][1], k=7, m_sub=2, k_codes=2, iters=2,
                   exclude_id=0).collect()]
    assert set(got) == set(range(1, 8)), got


def test_rrf_fuse_hand_computation_and_absence(spark):
    """Fused score = sum over lists of 1/(60+rank); a doc present in one
    list only gets that single term; ranks come from quantized scores
    with id tie-break; output ordered by fused desc then id."""
    from nexusbase_spark.pipeline.search import rrf_fuse

    # list A ranks: 10 (r1), 20 (r2), 30 (r3); list B: 20 (r1), 40 (r2)
    a = spark.createDataFrame([(10, 0.9), (20, 0.5), (30, 0.1)],
                              "doc_id long, score double")
    b = spark.createDataFrame([(20, 0.8), (40, 0.2)],
                              "doc_id long, score double")
    rows = rrf_fuse([a, b], k=10, c=60).collect()
    got = {r["doc_id"]: r["rrf"] for r in rows}

    def q6(x):
        import math
        return math.floor(x * 1e6 + 0.5) / 1e6

    assert got[20] == q6(1 / 62 + 1 / 61)       # r2 in A, r1 in B
    assert got[10] == q6(1 / 61)                # A only
    assert got[30] == q6(1 / 63)
    assert got[40] == q6(1 / 62)
    # doc 20 fused first; 10 and 40 tie-broken... 1/61 > 1/62 so 10 next
    assert [r["doc_id"] for r in rows] == [20, 10, 40, 30]


def test_rrf_fuse_rank_on_quantized_score_ties(spark):
    """Scores equal after 1e-4 quantization rank by id ascending — the
    cross-engine stability contract."""
    from nexusbase_spark.pipeline.search import rrf_fuse

    a = spark.createDataFrame([(5, 0.500004), (2, 0.500001)],
                              "doc_id long, score double")
    rows = rrf_fuse([a], k=2, c=60).collect()
    # both quantize to 0.5 -> rank by id: doc 2 gets r1
    assert [r["doc_id"] for r in rows] == [2, 5]


def test_duplicate_ngram_spans_merge_and_self_repetition(spark):
    """Overlapping duplicated n-grams merge into one maximal span;
    repetition within a single doc counts toward min_count; docs shorter
    than n produce nothing; span_end is exclusive."""
    from nexusbase_spark.pipeline.dedup import duplicate_ngram_spans

    docs = spark.createDataFrame([
        # docs 1 and 2 share the 5-token run "a b c d e" -> 3-grams at
        # starts 0..2 all duplicated -> one merged span [0, 5)
        (1, "a b c d e zz1 yy1"),
        (2, "a b c d e zz2 yy2"),
        # doc 3 repeats "p q r" internally (starts 0 and 3, adjacent):
        # both occurrences duplicated -> merged [0, 6)
        (3, "p q r p q r tail3"),
        (4, "too short"),
    ], "doc_id long, text string")
    rows = {(r["doc_id"], r["span_start"], r["span_end"]): r["span_tokens"]
            for r in duplicate_ngram_spans(docs, n=3, min_count=2).collect()}
    assert rows == {(1, 0, 5): 5, (2, 0, 5): 5, (3, 0, 6): 6}


def test_pagerank_cycle_and_dangling_exact(spark):
    """A 2-cycle holds the uniform stationary distribution exactly; a
    dangling sink drops mass (simplified formulation) with hand-computed
    values; out-degree above max_outdeg raises."""
    import pytest as _pt

    from nexusbase_spark.pipeline.graph import pagerank

    nodes = spark.createDataFrame([(1,), (2,)], "id long")
    cyc = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {r["id"]: r["pr"] for r in pagerank(cyc, nodes, iters=3).collect()}
    assert got == {1: 0.5, 2: 0.5}

    chain = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r["id"]: r["pr"] for r in pagerank(chain, nodes, iters=2).collect()}
    # pr1 = (0.075, 0.075+0.85*0.5) ; pr2 = (0.075, 0.075+0.85*0.075)
    assert got[1] == 0.075 and got[2] == 0.13875

    fan = spark.createDataFrame([(1, 2), (1, 3), (1, 4), (1, 5)],
                                "src long, dst long")
    n5 = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    with _pt.raises(ValueError):
        pagerank(fan, n5, iters=1, max_outdeg=3)


def test_mmr_select_prefers_diverse_over_redundant(spark):
    """Greedy MMR (lambda=1/2): an exact duplicate of the first pick is
    deferred behind an orthogonal lower-relevance candidate; scores are
    the integer-lattice objective / 1e4."""
    from nexusbase_spark.pipeline.search import mmr_select

    sl = spark.createDataFrame([
        (1, 0.9, [1.0, 0.0, 0.0, 0.0]),
        (2, 0.89, [1.0, 0.0, 0.0, 0.0]),   # duplicate of 1 -> sim 1.0
        (3, 0.5, [0.0, 1.0, 0.0, 0.0]),    # orthogonal
    ], "vec_id long, rel double, embedding array<double>")
    rows = mmr_select(sl, k=3).collect()
    assert [(r["vec_id"], r["sel_rank"], r["mmr_score"]) for r in rows] == [
        (1, 1, 0.9), (3, 2, 0.5), (2, 3, -0.11)]


def test_source_kl_report_zero_for_identical_and_positive_for_skew(spark):
    """A single source IS the corpus -> KL exactly 0 (p == q after
    smoothing); disjoint-vocabulary sources diverge positively; n_tokens
    and vocab_seen count per group."""
    from nexusbase_spark.pipeline.importance import source_kl_report

    one = spark.createDataFrame([("a", "x y z"), ("a", "x y")],
                                "source string, text string")
    row = source_kl_report(one).collect()[0]
    assert row["kl"] == 0.0 and row["n_tokens"] == 5 and row["vocab_seen"] == 3

    two = spark.createDataFrame(
        [("a", "x x x y"), ("b", "z w z w")], "source string, text string")
    got = {r["source"]: r["kl"] for r in source_kl_report(two).collect()}
    assert got["a"] > 0 and got["b"] > 0


def test_check_expectations_kinds_and_violation_counts(spark):
    """Each expectation kind counts its violations exactly; null handling
    per kind (null fails in_range/in_set/matches); ref integrity counts
    non-null dangling keys; predicate checks arbitrary columns."""
    from pyspark.sql import functions as F

    from nexusbase_spark.pipeline.expectations import check_expectations

    df = spark.createDataFrame(
        [(1, 5.0, "A", "ok-1"), (2, -1.0, "B", "bad"),
         (2, 50.0, None, "ok-2"), (None, None, "Z", "ok-3")],
        "id long, x double, cat string, tag string")
    dim = spark.createDataFrame([(1,), (2,)], "k long")
    rows = {r["check"]: r for r in check_expectations(df, [
        {"name": "id_nn", "kind": "not_null", "column": "id"},
        {"name": "id_uq", "kind": "unique", "column": "id"},
        {"name": "x_rng", "kind": "in_range", "column": "x",
         "arg": (0.0, 10.0)},
        {"name": "cat_set", "kind": "in_set", "column": "cat",
         "arg": ("A", "B")},
        {"name": "tag_fmt", "kind": "matches", "column": "tag",
         "arg": "^ok-[0-9]$"},
        {"name": "pred", "kind": "predicate", "column": "x",
         "arg": F.col("x") > 0},
        {"name": "id_ref", "kind": "ref", "column": "id",
         "arg": (dim, "k")},
    ]).collect()}
    assert rows["id_nn"]["violations"] == 1 and not rows["id_nn"]["passed"]
    assert rows["id_uq"]["violations"] == 1          # id 2 twice
    assert rows["x_rng"]["violations"] == 3          # -1, 50, NULL
    assert rows["cat_set"]["violations"] == 2        # None, 'Z'
    assert rows["tag_fmt"]["violations"] == 1        # 'bad'
    assert rows["pred"]["violations"] == 2           # -1 and null fail
    assert rows["id_ref"]["violations"] == 0 and rows["id_ref"]["passed"]
    assert all(r["n_rows"] == 4 for r in rows.values())


def test_profile_table_stats_per_dtype(spark):
    """Numeric columns get num bounds, strings get length bounds, nulls
    and exact distincts count per column."""
    from nexusbase_spark.pipeline.expectations import profile_table

    df = spark.createDataFrame(
        [(1, "ab", 2.5), (2, "xyz", None), (2, None, -1.0)],
        "id long, s string, x double")
    rows = {r["column"]: r for r in profile_table(df).collect()}
    i = rows["id"]
    assert (i["n_rows"], i["n_nulls"], i["n_distinct"]) == (3, 0, 2)
    assert (i["num_min"], i["num_max"]) == (1.0, 2.0)
    assert i["len_min"] is None
    s = rows["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 2)
    assert (s["len_min"], s["len_max"]) == (2, 3)
    assert s["num_min"] is None
    x = rows["x"]
    assert (x["n_nulls"], x["num_min"], x["num_max"]) == (1, -1.0, 2.5)


def test_pmi_collocations_hand_computation(spark):
    """PMI equals ln(p(x,y)/(p(x)p(y))) on a hand corpus; min_count
    filters rare pairs; a pair repeated together outranks independent
    co-occurrence."""
    import math

    from nexusbase_spark.pipeline.text import pmi_collocations

    # "new york" always adjacent (5x); "of the" frequent but independent
    text1 = "new york " * 5            # 5 "new york" bigrams inside
    text2 = "of the cat of a dog the of end"
    df = spark.createDataFrame([(1, text1.strip()), (2, text2)],
                               "doc_id long, text string")
    rows = {(r["x"], r["y"]): r for r in
            pmi_collocations(df, k=10, min_count=2).collect()}
    assert ("new", "york") in rows
    ny = rows[("new", "york")]
    # corpus: N_uni = 10 + 9 = 19; c_new = c_york = 5; N_big = 9 + 8 = 17
    expect = math.log((5 * 19 * 19) / (17 * 5 * 5))
    assert abs(ny["pmi"] - math.floor(expect * 1e4 + 0.5) / 1e4) < 1e-12
    assert ny["cxy"] == 5
    # every returned pair met min_count
    assert all(r["cxy"] >= 2 for r in rows.values())


def test_table_diff_classifies_and_null_safety(spark):
    """added/removed/changed classification; NULL-to-NULL columns are
    equal (no false 'changed'); NULL-to-value is a change; identical
    rows emit nothing."""
    from nexusbase_spark.pipeline.expectations import table_diff

    old = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, "c", 1.0), (4, "d", None)],
        "id long, s string, x double")
    new = spark.createDataFrame(
        [(1, "a", None),          # identical (null == null)
         (2, "b2", 5.0),          # changed (s)
         (4, "d", 7.0),           # changed (null -> value)
         (5, "e", 0.0)],          # added; id 3 removed
        "id long, s string, x double")
    got = {r["id"]: r["change"] for r in table_diff(old, new, "id").collect()}
    assert got == {2: "changed", 3: "removed", 4: "changed", 5: "added"}


@pytest.mark.nightly
def test_pca_rotation_orthonormal_and_improves_pq(spark):
    """OPQ-lite: the fitted rotation is orthonormal (neighbor structure
    preserved — rotated search equals raw search), and on correlated
    anisotropic data PQ in the rotated space reconstructs with lower
    error than PQ on the raw axes (the point of the rotation)."""
    import random

    import numpy as np

    from nexusbase_spark.pipeline.similarity import (
        apply_rotation, cosine_topk, pca_rotation, pq_encode, rotate_probe)

    rng = random.Random(11)
    dim, n = 8, 300
    # adversarial-for-raw-PQ data: BOTH strong directions live in raw
    # subspace 0 (dims 0 and 1), the rest is noise — raw PQ spends one
    # 4-code codebook on a 2-D cloud and wastes the other on noise;
    # eigenvalue allocation deals one strong PC to each subspace
    rows = []
    for i in range(n):
        v = [rng.gauss(0, 10), rng.gauss(0, 10)] + \
            [0.1 * rng.gauss(0, 1) for _ in range(dim - 2)]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    rot = pca_rotation(df, dim=dim, sample=n, m_sub=2)
    r_np = np.array(rot)
    assert np.allclose(r_np @ r_np.T, np.eye(dim), atol=1e-8)

    rdf = apply_rotation(df, rot).select(
        "vec_id", F.col("rotated").alias("embedding"))
    probe = [float(x) for x in rows[7][1]]
    raw_nn = [r["vec_id"] for r in
              cosine_topk(df, probe, k=5, exclude_id=7).collect()]
    rot_nn = [r["vec_id"] for r in
              cosine_topk(rdf, rotate_probe(probe, rot), k=5,
                          exclude_id=7).collect()]
    assert raw_nn == rot_nn

    def recon_err(frame, books, m_sub, sub_len):
        tot = 0.0
        enc = {r["vec_id"]: r for r in frame.collect()}
        for vid, r in enc.items():
            v = [float(x) for x in r["embedding"]]
            for s in range(m_sub):
                cb = books[(s, r[f"code_{s}"])]
                seg = v[s * sub_len:(s + 1) * sub_len]
                tot += sum((a - b) ** 2 for a, b in zip(seg, cb))
        return tot

    raw_enc, raw_books = pq_encode(df, m_sub=2, k_codes=4, iters=3, dim=dim)
    rot_enc, rot_books = pq_encode(rdf, m_sub=2, k_codes=4, iters=3, dim=dim)
    raw_e = recon_err(raw_enc, raw_books, 2, 4)
    rot_e = recon_err(rot_enc, rot_books, 2, 4)
    assert rot_e < 0.9 * raw_e, (raw_e, rot_e)


def test_typo_pairs_symspell_guarantee_and_canon(spark):
    """Substitution, insertion, and deletion at distance 1 are all
    found (the deletion-neighborhood guarantee); distance-2 words are
    not; canon is the higher-count side."""
    from nexusbase_spark.pipeline.text import typo_pairs

    vocab = spark.createDataFrame(
        [("vector", 100), ("vectr", 2),     # deletion
         ("vektor", 1),                     # substitution
         ("vecttor", 1),                    # insertion
         ("metric", 50), ("matrix", 40)],   # distance 3 — no pair
        "w string, n long")
    rows = {(r["rare"], r["canon"]) for r in
            typo_pairs(vocab).collect()}
    assert ("vectr", "vector") in rows
    assert ("vektor", "vector") in rows
    assert ("vecttor", "vector") in rows
    assert not any("metric" in p or "matrix" in p for pair in rows
                   for p in pair)
    got = {r["rare"]: (r["rare_n"], r["canon_n"]) for r in
           typo_pairs(vocab).collect() if r["canon"] == "vector"}
    assert got["vectr"] == (2, 100)


def test_hard_negatives_cross_label_and_boundary(spark):
    """Every emitted pair crosses labels; the hardest negative (a
    boundary vector close to another class) is found even though its
    own cluster is label-pure — the soft-assignment point."""
    from nexusbase_spark.pipeline.similarity import hard_negatives

    rows = []
    vid = 0
    # two tight label clusters on axes 0 and 1 (ids 0..3 seed kmeans:
    # interleave so each cluster seeds at least one centroid)
    for j in range(10):
        for axis, lab in ((0, 0), (1, 1)):
            v = [0.0] * 4
            v[axis] = 10.0 + 0.01 * j
            v[2] = 0.01 * j
            rows.append((vid, v, lab))
            vid += 1
    # a label-0 straggler sitting ON the label-1 cluster: its hardest
    # negative is any label-1 member with cosine ~1
    rows.append((vid, [0.05, 10.0, 0.0, 0.0], 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    out = {r["id"]: r for r in
           hard_negatives(df, k=1, nlist=2, iters=3, nprobe=2).collect()}
    assert all(r["label"] != r["nbr_label"] for r in out.values())
    straggler = out[vid]
    assert straggler["nbr_label"] == 1 and straggler["cosine"] > 0.99


def test_check_expectations_by_group_counts_and_rejects_table_kinds(spark):
    """Violations count per group; whole-table kinds (unique/ref) are
    rejected for the grouped variant."""
    import pytest as _pt

    from nexusbase_spark.pipeline.expectations import (
        check_expectations_by_group,
    )

    df = spark.createDataFrame(
        [("a", 5.0), ("a", None), ("b", -1.0), ("b", 2.0), ("b", None)],
        "grp string, x double")
    rows = {(r["grp"], r["check"]): r for r in
            check_expectations_by_group(df, "grp", [
                {"name": "x_nn", "kind": "not_null", "column": "x"},
                {"name": "x_rng", "kind": "in_range", "column": "x",
                 "arg": (0.0, 10.0)},
            ]).collect()}
    assert rows[("a", "x_nn")]["violations"] == 1
    assert rows[("b", "x_nn")]["violations"] == 1
    assert rows[("a", "x_rng")]["violations"] == 1      # null fails range
    assert rows[("b", "x_rng")]["violations"] == 2      # -1 and null
    assert rows[("a", "x_rng")]["n_rows"] == 2
    with _pt.raises(ValueError):
        check_expectations_by_group(df, "grp", [
            {"name": "u", "kind": "unique", "column": "x"}])


def test_pagerank_rejects_int64_overflowing_iters(spark):
    """iters large enough that N*(damp_den*lcm)^iters crosses 2^62 must
    raise up front: Spark long sums wrap silently, so the lattice would
    produce wrong ranks with no error (ADVICE r4)."""
    import pytest as _pt

    from nexusbase_spark.pipeline.graph import pagerank

    nodes = spark.createDataFrame([(1,), (2,)], "id long")
    cyc = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    # b*L = 20*6 = 120; 2*120^10 ~ 1.2e21 > 2^62 ~ 4.6e18
    with _pt.raises(ValueError, match="int64 lattice"):
        pagerank(cyc, nodes, iters=10)
    # iters=8 stays inside (2*120^8 ~ 8.6e16) and still runs
    got = {r["id"]: r["pr"] for r in pagerank(cyc, nodes, iters=8).collect()}
    assert got == {1: 0.5, 2: 0.5}


def test_mmr_select_string_ids(spark):
    """id_col is a free parameter: string ids must round-trip through
    the greedy epilogue's output schema (ADVICE r4 — it was hardcoded
    to long)."""
    from nexusbase_spark.pipeline.search import mmr_select

    sl = spark.createDataFrame([
        ("docA", 0.9, [1.0, 0.0]),
        ("docB", 0.89, [1.0, 0.0]),
        ("docC", 0.5, [0.0, 1.0]),
    ], "doc string, rel double, embedding array<double>")
    rows = mmr_select(sl, k=2, id_col="doc").collect()
    assert [(r["doc"], r["sel_rank"]) for r in rows] == [
        ("docA", 1), ("docC", 2)]
    assert rows[0]["mmr_score"] == 0.9


@pytest.mark.nightly
def test_corpus_stats_retention_retire_verify_resync(spark, tmp_path):
    """Retention interplay for the stats store (VERDICT r4 next #5):
    aging docs out of the base corpus makes verify() report drift;
    retire(removed) heals it with O(batch) negative deltas (lookup and
    the served ranking then match a fresh build on the survivors);
    compact() folds the mixed-sign deltas and drops net-zero tokens. An
    UNTRACKED rewrite is healed by resync() instead."""
    from nexusbase_spark.pipeline.search import (
        CorpusStats, bm25_topk, bm25_topk_served)
    schema = "doc_id long, text string"
    old = [(1, "cat dog cat"), (2, "zebra zebra")]
    new = [(3, "cat fish dog"), (4, "bird bird cat")]
    st = CorpusStats.build(spark, str(tmp_path / "st"),
                           spark.createDataFrame(old + new, schema))
    survivors = spark.createDataFrame(new, schema)
    assert st.verify(spark.createDataFrame(old + new, schema))["ok"]

    # retention event: docs 1-2 age out of the base corpus
    rep = st.verify(survivors)
    assert not rep["ok"]
    assert rep["n_docs_store"] == 4 and rep["n_docs_base"] == 2
    assert rep["df_mismatched"] > 0  # zebra is phantom, cat over-counted

    st.retire(spark.createDataFrame(old, schema))
    rep = st.verify(survivors)
    assert rep["ok"] and rep["n_docs_store"] == 2
    n, avgdl, dfs = st.lookup(["cat", "zebra"])
    assert n == 2 and avgdl == 3.0 and dfs == [2, 0]
    want = [(r["doc_id"], r["score"])
            for r in bm25_topk(survivors, ["cat"], k=4).collect()]
    got = [(r["doc_id"], r["score"]) for r in
           bm25_topk_served(survivors, st, ["cat"], k=4).collect()]
    assert got == want

    # compact folds mixed-sign deltas; fully-retired tokens vanish
    st.compact()
    assert st.lookup(["cat", "zebra"]) == (n, avgdl, dfs)
    import os
    toks = {r["token"] for r in
            spark.read.parquet(os.path.join(str(tmp_path / "st"),
                                            "df")).collect()}
    assert "zebra" not in toks and "cat" in toks

    # untracked rewrite (doc 3's text mutated in place) -> resync heals
    mutated = spark.createDataFrame(
        [(3, "totally new words"), new[1]], schema)
    assert not st.verify(mutated)["ok"]
    out = st.resync(mutated)
    assert out["n_docs"] == 2
    assert st.verify(mutated)["ok"]


def test_prefix_filter_pairs_lossless_vs_brute_force(spark):
    """PPJoin-style prefix filtering is EXACT: output equals the brute
    all-pairs Jaccard join at the same threshold, including a pair whose
    jaccard lands exactly ON the threshold, and excludes sub-threshold
    pairs even when they share (frequent) tokens."""
    from nexusbase_spark.pipeline.dedup import prefix_filter_pairs

    docs = spark.createDataFrame([
        (1, "a b c d"),            # {a b c d}
        (2, "a b c e"),            # j(1,2) = 3/5 = 0.6  (on threshold)
        (3, "a b c d x"),          # j(1,3) = 4/5 = 0.8
        (4, "a q r s t u v w"),    # shares frequent 'a' only -> below
        (5, "zz yy"),              # disjoint
    ], "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): (r["inter"], r["uni"], r["jaccard"])
           for r in prefix_filter_pairs(docs, threshold=0.6).collect()}

    # brute force over all 10 pairs
    import itertools
    sets = {1: set("abcd"), 2: set("abce"), 3: set("abcdx"),
            4: set("aqrstuvw"), 5: {"zz", "yy"}}
    want = {}
    for x, y in itertools.combinations(sorted(sets), 2):
        i = len(sets[x] & sets[y]); u = len(sets[x] | sets[y])
        if i * 10000 >= u * 6000:
            import math
            want[(x, y)] = (i, u, math.floor(i / u * 1e4 + 0.5) / 1e4)
    assert got == want
    assert (1, 2) in got and got[(1, 2)][2] == 0.6   # exact-threshold pair
    assert (1, 3) in got and not any(4 in p or 5 in p for p in got)


def test_prefix_filter_max_bucket_caps_hot_template_token(spark):
    """The PPJoin skew guard (VERDICT r5 #7): 40 docs sharing a 10-token
    template (plus one unique token each) put 4 template tokens in
    every prefix — 40-posting hot buckets whose self-join output is the
    full 780-pair template clique. With max_bucket=10 the hot buckets
    are dropped WITH a warning naming them, the job completes, and
    losslessness off the hot buckets holds: a near-dup pair built from
    rare tokens is still found with exact inter/uni/jaccard. Without
    max_bucket the operator stays exhaustively lossless (all 780+1
    pairs, no warning)."""
    import warnings as _w

    from nexusbase_spark.pipeline.dedup import prefix_filter_pairs

    template = " ".join(f"tmpl{j:02d}" for j in range(10))
    rows = [(i, f"{template} unique{i:02d}") for i in range(40)]
    rows += [(100, "alpha beta gamma delta epsilon"),
             (101, "alpha beta gamma delta zeta")]   # j = 4/6 = 0.6667
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    with _w.catch_warnings(record=True) as w:
        _w.simplefilter("always")
        capped = {(r["id_a"], r["id_b"]): (r["inter"], r["uni"],
                                           r["jaccard"])
                  for r in prefix_filter_pairs(
                      docs, threshold=0.6, max_bucket=10).collect()}
    msgs = [str(x.message) for x in w
            if "prefix bucket" in str(x.message)]
    assert msgs and "tmpl" in msgs[0] and "max_bucket=10" in msgs[0]
    # the rare-token pair survives, exact; the template clique is gone
    assert capped == {(100, 101): (4, 6, 0.6667)}

    with _w.catch_warnings(record=True) as w:
        _w.simplefilter("always")
        full = prefix_filter_pairs(docs, threshold=0.6).count()
    assert not any("prefix bucket" in str(x.message) for x in w)
    assert full == 40 * 39 // 2 + 1


def test_canonical_keep_longest_wins_and_singletons_kept(spark):
    """One keeper per cluster (longest member, ties to smallest id),
    singletons always kept, and exactly one keep=True per cluster."""
    from nexusbase_spark.pipeline.dedup import canonical_keep

    docs = spark.createDataFrame([
        (1, "short text"),
        (2, "much longer text wins here"),
        (3, "much longer text wins too!"),   # same length as 2 -> min id
        (4, "a lonely singleton document"),
    ], "doc_id long, text string")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id long, canonical_id long")
    rows = {r["doc_id"]: r for r in canonical_keep(docs, clusters).collect()}
    assert rows[1]["cluster_id"] == 1 and not rows[1]["keep"]
    assert len(docs.head(1)) and rows[2]["n_chars"] == rows[3]["n_chars"]
    assert rows[2]["keep"] and not rows[3]["keep"]     # tie -> smaller id
    assert rows[4]["cluster_id"] == 4 and rows[4]["keep"]
    keeps = [r for r in rows.values() if r["keep"]]
    assert len(keeps) == 2


def test_gopher_rules_flags_and_keep(spark):
    """Each Gopher rule flips on its own violation; keep is the
    conjunction; all verdicts from integer comparisons."""
    from nexusbase_spark.pipeline.text import gopher_rules_exprs

    good = " ".join(["the", "be", "to", "of"] + ["word"] * 60)
    docs = spark.createDataFrame([
        (1, good),                                   # passes everything
        (2, "too short for the gopher rules to be"), # word count
        (3, " ".join(["a"] * 60 + ["the", "be"])),   # mean word len < 3
        (4, " ".join(["####"] * 30 + ["the be to of and word"] * 6)),
        (5, " ".join(["word"] * 60)),                # no required stops
    ], "doc_id long, text string")
    gx = gopher_rules_exprs(F.col("text"))
    rows = {r["doc_id"]: r for r in
            docs.select("doc_id", *[v.alias(k) for k, v in gx.items()])
            .collect()}
    assert rows[1]["keep"] and rows[1]["n_required_stop"] >= 2
    assert not rows[2]["ok_word_count"] and not rows[2]["keep"]
    assert not rows[3]["ok_mean_word_len"] and not rows[3]["keep"]
    assert not rows[4]["ok_symbol_ratio"] and not rows[4]["ok_alpha_words"]
    assert not rows[5]["ok_stopwords"] and rows[5]["ok_word_count"]


def test_char_entropy_known_values(spark):
    """Exact entropies: one repeated char = 0 bits; a 2-char alternation
    = 1 bit; 4 equiprobable chars = 2 bits."""
    from nexusbase_spark.pipeline.text import char_entropy

    docs = spark.createDataFrame([
        (1, "aaaaaaaa"), (2, "abababab"), (3, "abcdabcd"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_chars"], round(r["entropy"], 10))
           for r in char_entropy(docs).collect()}
    assert got == {1: (8, 0.0), 2: (8, 1.0), 3: (8, 2.0)}


def test_cuped_reduces_to_unadjusted_when_theta_zero_effect(spark):
    """CUPED sanity on the registered query shape: when y = x exactly
    (theta = 1), the adjusted means collapse to the pooled pre-mean —
    the adjustment removes ALL between-arm covariate imbalance."""
    from pyspark.sql import functions as F

    u = spark.createDataFrame(
        [(1, 10.0, 10.0), (2, 20.0, 20.0), (3, 30.0, 30.0),
         (4, 40.0, 40.0)],
        "user_id long, x double, y double")
    g = u.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"),
              F.sum("y").alias("sy"),
              F.sum(F.col("x") * F.col("x")).alias("sxx"),
              F.sum(F.col("x") * F.col("y")).alias("sxy")).collect()[0]
    theta = ((g["n"] * g["sxy"] - g["sx"] * g["sy"])
             / (g["n"] * g["sxx"] - g["sx"] * g["sx"]))
    assert theta == 1.0
    mx = g["sx"] / g["n"]
    arm = F.when(F.col("user_id") % 2 == 0, "A").otherwise("B")
    rows = (u.groupBy(arm.alias("arm"))
            .agg((F.avg("y") - F.lit(theta) * (F.avg("x") - F.lit(mx)))
                 .alias("mean_adj")).collect())
    assert {r["arm"]: r["mean_adj"] for r in rows} == {"A": 25.0, "B": 25.0}


def test_ks_drift_known_distributions(spark):
    """Exact KS on hand-computable samples: identical samples give D=0;
    disjoint supports give D=1; a half-shifted sample gives D=0.5."""
    from nexusbase_spark.queries_analytics import q_events_ks_drift  # noqa: F401
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def ks(rows):
        g = spark.createDataFrame(rows, "value double, a int")
        tot = g.agg(F.sum("a").alias("na"),
                    (F.count(F.lit(1)) - F.sum("a")).alias("nb")).collect()[0]
        na, nb = int(tot["na"]), int(tot["nb"])
        v = g.groupBy("value").agg(
            F.sum("a").alias("ca"),
            (F.count(F.lit(1)) - F.sum("a")).alias("cb"))
        w = Window.orderBy("value").rowsBetween(
            Window.unboundedPreceding, 0)
        d = v.select(F.abs(F.sum("ca").over(w) / F.lit(float(na))
                           - F.sum("cb").over(w) / F.lit(float(nb)))
                     .alias("d"))
        return d.agg(F.max("d")).collect()[0][0]

    same = [(float(x), 1) for x in range(4)] + [(float(x), 0)
                                                for x in range(4)]
    assert ks(same) == 0.0
    disjoint = ([(float(x), 1) for x in range(4)]
                + [(float(x + 10), 0) for x in range(4)])
    assert ks(disjoint) == 1.0
    shifted = ([(0.0, 1), (1.0, 1), (2.0, 1), (3.0, 1)]
               + [(2.0, 0), (3.0, 0), (4.0, 0), (5.0, 0)])
    assert ks(shifted) == 0.5


def test_zipf_slope_exact_power_law(spark):
    """A constructed corpus with freq(rank) = 12/rank over 4 terms fits
    slope exactly -1 (ln-ln points are collinear)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # freq(rank) = 12/rank with DISTINCT freqs (12, 6, 4, 3) so ranks
    # are unambiguous: ln f = ln 12 - ln rank, perfectly collinear,
    # slope exactly -1
    words = ["a"] * 12 + ["b"] * 6 + ["c"] * 4 + ["d"] * 3
    docs = spark.createDataFrame([(1, " ".join(words))],
                                 "doc_id long, text string")
    from nexusbase_spark.pipeline.text import tokens_col
    f = (docs.select(F.explode(tokens_col(F.col("text"))).alias("tok"))
         .groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    top = f.orderBy(F.col("c").desc(), "tok")
    rk = F.row_number().over(Window.orderBy(F.col("c").desc(), "tok"))
    r = top.select("c", rk.alias("rk"))
    x, y = F.log("rk"), F.log("c")
    s = r.agg(F.count(F.lit(1)).alias("n"),
              F.sum(x).alias("sx"), F.sum(y).alias("sy"),
              F.sum(x * x).alias("sxx"), F.sum(x * y).alias("sxy"))
    row = s.collect()[0]
    slope = ((row["n"] * row["sxy"] - row["sx"] * row["sy"])
             / (row["n"] * row["sxx"] - row["sx"] * row["sx"]))
    assert abs(slope - (-1.0)) < 1e-9


def test_canonical_keep_custom_quality_column(spark):
    """quality_col overrides the length heuristic: the highest-scoring
    member wins even when it is the shortest."""
    from nexusbase_spark.pipeline.dedup import canonical_keep

    docs = spark.createDataFrame([
        (1, "very long but low quality text here", 10),
        (2, "short", 99),
    ], "doc_id long, text string, score long")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, canonical_id long")
    rows = {r["doc_id"]: r for r in
            canonical_keep(docs, clusters, quality_col="score").collect()}
    assert rows[2]["keep"] and not rows[1]["keep"]


def test_export_shards_manifest_and_verify(spark, tmp_path):
    """export_shards writes content-addressed shards + manifest;
    verify_export is green on an intact export, shard assignment is
    partitioning-independent (re-export after repartition -> identical
    manifest), and deleting or tampering a shard is caught by name."""
    import shutil

    from nexusbase_spark.pipeline.export import export_shards, verify_export

    docs = spark.createDataFrame(
        [(i, f"text {i}", f"s{i % 3}") for i in range(200)],
        "doc_id long, text string, source string")
    path = str(tmp_path / "exp")
    m1 = export_shards(docs, path, n_shards=4)
    assert m1["n_rows"] == 200 and len(m1["shards"]) == 4
    assert verify_export(spark, path)["ok"]

    # deterministic under any upstream partitioning
    path2 = str(tmp_path / "exp2")
    m2 = export_shards(docs.repartition(7, "source"), path2, n_shards=4)
    assert m2["shards"] == m1["shards"]

    # a training row is readable and complete
    back = spark.read.parquet(path + "/data")
    assert back.count() == 200 and set(back.columns) >= {
        "doc_id", "text", "source", "shard"}

    # tamper: drop one shard directory -> flagged as missing
    victim = next(k for k, v in m1["shards"].items() if v["n_rows"] > 0)
    shutil.rmtree(path + f"/data/shard={victim}")
    rep = verify_export(spark, path)
    assert not rep["ok"] and rep["bad_shards"] == {victim: "missing"}


def test_repair_export_rewrites_only_bad_shards(spark, tmp_path):
    """repair_export heals exactly the damaged shards (dynamic partition
    overwrite): untouched shard files keep their modification identity,
    verify is green after, and a clean export is a no-op."""
    import os
    import shutil

    from nexusbase_spark.pipeline.export import (
        export_shards, repair_export, verify_export)

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(100)], "doc_id long, text string")
    path = str(tmp_path / "exp")
    m = export_shards(docs, path, n_shards=4)
    assert repair_export(docs, path) == {"repaired": [], "ok": True}

    victims = [k for k, v in m["shards"].items() if v["n_rows"] > 0][:2]
    survivor = [k for k, v in m["shards"].items()
                if v["n_rows"] > 0 and k not in victims][0]
    surv_dir = path + f"/data/shard={survivor}"
    before = {f: os.path.getmtime(os.path.join(surv_dir, f))
              for f in os.listdir(surv_dir)}
    for v in victims:
        shutil.rmtree(path + f"/data/shard={v}")
    out = repair_export(docs, path)
    assert out["ok"] and sorted(out["repaired"]) == sorted(victims)
    assert verify_export(spark, path)["ok"]
    after = {f: os.path.getmtime(os.path.join(surv_dir, f))
             for f in os.listdir(surv_dir)}
    assert after == before  # survivor shard untouched


def test_mannwhitney_exact_small_sample(spark):
    """Hand-computed U on a 3v3 sample with one tie: A = {1,2,2},
    B = {2,3,4}. Ranks: 1->1; the three 2s occupy ranks 2,3,4 (avg 3);
    3->5; 4->6. R_A = 1+3+3 = 7, U_A = 7 - 3*4/2 = 1."""
    from nexusbase_spark.queries import all_queries  # noqa: F401 (registry)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    g = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (2.0, 1), (2.0, 0), (3.0, 0), (4.0, 0)],
        "value double, a int")
    v = g.groupBy("value").agg(F.sum("a").alias("ca"),
                               F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    s = (v.withColumn("__b", F.coalesce(F.sum("c").over(w), F.lit(0)))
         .agg(F.sum(F.col("ca") * (2 * F.col("__b") + F.col("c") + 1))
              .alias("r2a")).collect()[0])
    na = 3
    u_a = (int(s["r2a"]) - na * (na + 1)) / 2.0
    assert int(s["r2a"]) == 14  # 2*R_A
    assert u_a == 1.0


def test_curation_default_cap_engages_and_warns_on_template_corpus(spark):
    """VERDICT r6 #5: the COMPOSED curation chain defaults to the skew
    cap (curation_keepers max_bucket=DEFAULT_MAX_BUCKET=1000), so a
    boilerplate template minting >1000-posting prefix buckets yields a
    bounded run with a RuntimeWarning naming the hot tokens — not a
    quadratic stall. Pairs riding sub-cap buckets are still delivered:
    the natural near-dup pair survives, clusters, and loses one member
    to canonical keep. max_bucket=None remains the lossless opt-out."""
    import inspect

    from nexusbase_spark.pipeline.dedup import (
        DEFAULT_MAX_BUCKET, curation_keepers)

    assert DEFAULT_MAX_BUCKET == 1000  # SCALE.md round-6 guard probe
    sig = inspect.signature(curation_keepers)
    assert sig.parameters["max_bucket"].default == DEFAULT_MAX_BUCKET

    template = ("the quick brown fox jumps over a lazy dog and then it "
                "runs toward green hills near blue water")  # 19 distinct
    natural = ("a story of storms and rivers crossing wide valleys under "
               "pale skies while herons glide to quiet shores")
    rows = [(i, f"{template} zz{i:04d}") for i in range(1101)]
    rows += [(2001, f"{natural} alpha"), (2002, f"{natural} omega")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    with pytest.warns(RuntimeWarning, match="prefix_filter_pairs"):
        kept, verdicts = curation_keepers(docs, threshold=0.8)
    assert kept.count() == 1103  # every synthetic doc passes the filter
    v = {r["doc_id"]: r["keep"] for r in verdicts.collect()}
    # the natural pair (jaccard 19/21 >= 0.8) rode a 2-posting bucket:
    # clustered, one canonical keeper (tie on n_chars -> min doc_id)
    assert (v[2001], v[2002]) == (True, False)
    # template docs' pairs were dropped with the hot buckets: each is a
    # singleton, all kept — bounded output, losslessness off-cap intact
    assert all(v[i] for i in range(1101))

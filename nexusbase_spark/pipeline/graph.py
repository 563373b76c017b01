"""Graph analytics over edge DataFrames: PageRank.

The corpus-graph primitive behind link-based quality weighting
(Common-Crawl-style host ranking feeding crawl prioritization / doc
quality priors) and semantic-graph centrality (which embedding-space
nodes anchor their neighborhoods). Companion to the kNN graph /
mutual-kNN clustering family in ``pipeline/similarity``.

Scale shape: one iteration = one join of the edge list with the one-row-
per-node rank frame plus one groupBy on dst — both shuffles carry
(id, int64) pairs only, never payloads. Lineage is cut per round with an
eager localCheckpoint — the hard-won iterative-DataFrame rule (see
pipeline/bpe.py): without it the plan doubles every iteration and the
job dies at scale regardless of data size.

Determinism — the exact-lattice trick: floats summed in engine-specific
order drift by an ulp, and PageRank's lattice of reachable values
contains exact rounding-boundary points, so no quantization width is
safe. Instead the recurrence runs in INTEGERS. With damping d = a/b and
L = lcm(1..max outdeg), scale round t by S_t = N * (bL)^t and keep
P_t = pr_t * S_t:

    P_{t+1}(v) = (b - a) * L * (bL)^t  +  a * sum (L / outdeg(u)) P_t(u)

Every term is an exact int64 (L/outdeg divides evenly; P_t <= (bL)^t,
so 3 rounds at b=20, L=6 peak near 120^3 ~ 1.7e6 times N's reciprocal
mass — far inside int64 for any practical iteration count). Both
engines iterate the identical integer multiset; the only float op is
the single final division P_T / S_T, bit-identical everywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _max_safe_iters(n: int, bl: int) -> int:
    """Largest iters with n * bl**iters < 2**62 (0 if even iters=1 won't)."""
    t = 0
    while n * bl ** (t + 1) < 2 ** 62:
        t += 1
    return t


def pagerank(edges: DataFrame, nodes: DataFrame, iters: int = 3,
             damp_num: int = 17, damp_den: int = 20,
             src_col: str = "src", dst_col: str = "dst",
             id_col: str = "id", max_outdeg: int = 3) -> DataFrame:
    """PageRank over a directed edge list, ``iters`` synchronous rounds
    of pr'(v) = (1-d)/N + d * sum over in-edges (u,v) of pr(u)/outdeg(u)
    with d = damp_num/damp_den (default 17/20 = the canonical 0.85).

    Simplified dangling treatment: nodes with no out-edges drop their
    mass instead of redistributing it — exact for graphs where every
    node has out-degree >= 1 (a kNN graph by construction) and the
    standard shortcut otherwise; total mass then decays but the ranking
    is preserved. N is a one-scalar driver anchor (one count job).

    ``max_outdeg`` bounds the out-degrees actually present (asserted at
    runtime via the degree rollup): L = lcm(1..max_outdeg) makes every
    per-edge integer contribution exact — see module docstring.

    Output: (id_col, pr double) for every node, including nodes with no
    in-edges (they hold the (1-d)/N floor). pr is the exact rational
    P_T/S_T evaluated in one float division.
    """
    n = nodes.count()
    if n == 0:
        raise ValueError("nodes must be non-empty")
    lcm = math.lcm(*range(1, max_outdeg + 1))
    # Lattice overflow guard (ADVICE r4): per-node P_t is bounded by
    # N * (bL)^t, and Spark long sums WRAP silently on overflow, so an
    # iters that pushes the bound past int64 would produce wrong ranks
    # with no error. Refuse up front instead.
    if n * (damp_den * lcm) ** iters >= 2 ** 62:
        raise ValueError(
            f"iters={iters} overflows the int64 lattice: "
            f"N*(damp_den*lcm)^iters = {n}*({damp_den}*{lcm})^{iters} "
            f">= 2^62; reduce iters (<= "
            f"{_max_safe_iters(n, damp_den * lcm)} for this graph)")
    deg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("__outdeg"))
    bad = deg.filter(F.col("__outdeg") > max_outdeg).head(1)
    if bad:
        raise ValueError(f"out-degree exceeds max_outdeg={max_outdeg}")
    e = (edges.select(src_col, dst_col).join(deg, src_col)
         .withColumn("__fac", (F.lit(lcm) / F.col("__outdeg")).cast("long"))
         .localCheckpoint(eager=True))  # reused every round: cut lineage once
    pr = nodes.select(F.col(id_col), F.lit(1).cast("long").alias("__p"))
    for t in range(iters):
        base = (damp_den - damp_num) * lcm * (damp_den * lcm) ** t
        contrib = (e.join(pr, e[src_col] == pr[id_col])
                   .select(F.col(dst_col).alias("__to"),
                           (F.col("__fac") * F.col("__p")).alias("__w"))
                   .groupBy("__to").agg(F.sum("__w").alias("__c")))
        pr = (nodes.select(id_col)
              .join(contrib, F.col(id_col) == F.col("__to"), "left")
              .select(F.col(id_col),
                      (F.lit(base)
                       + damp_num * F.coalesce(F.col("__c"), F.lit(0)))
                      .cast("long").alias("__p"))
              .localCheckpoint(eager=True))
    scale = float(n) * float((damp_den * lcm) ** iters)
    return pr.select(id_col, (F.col("__p") / F.lit(scale)).alias("pr"))


def label_propagation(edges: DataFrame, seeds: DataFrame, nodes: DataFrame,
                      iters: int = 2, src_col: str = "src",
                      dst_col: str = "dst", id_col: str = "id",
                      label_col: str = "label") -> DataFrame:
    """Semi-supervised label propagation: seeds keep their labels;
    every other node takes, each synchronous round, the most frequent
    label among its CURRENTLY-labeled in-neighbors (ties broken by the
    smallest label) — the cheap transductive labeler that stretches a
    small labeled set over a kNN graph (Zhu & Ghahramani 2002's hard-
    label variant).

    Determinism needs no lattice here: state is (id, label int) and the
    per-round decision is (count DESC, label ASC) over integer counts —
    no float ever enters, so both engines agree exactly. Scale shape
    matches pagerank: one round = one edge-state join + one
    (node, label)-keyed count + one per-node arg-max window (partitioned
    by node — never global); lineage cut per round with an eager
    localCheckpoint. A node with no labeled neighbors stays unlabeled
    that round (label NULL), and an already-adopted label may flip in a
    later round as neighborhoods fill in — synchronous update, not
    sticky.

    Output: (id_col, label_col nullable) for every node.
    """
    from pyspark.sql import Window

    sd = seeds.select(F.col(id_col), F.col(label_col).alias("__seed"))
    state = (nodes.select(id_col).join(sd, id_col, "left")
             .select(F.col(id_col), F.col("__seed").alias("__lbl"))
             .localCheckpoint(eager=True))
    e = edges.select(src_col, dst_col).localCheckpoint(eager=True)
    w = (Window.partitionBy("__to")
         .orderBy(F.col("__c").desc(), F.col("__lbl").asc()))
    for _ in range(iters):
        votes = (e.join(state, e[src_col] == state[id_col])
                 .filter(F.col("__lbl").isNotNull())
                 .select(F.col(dst_col).alias("__to"), "__lbl")
                 .groupBy("__to", "__lbl")
                 .agg(F.count(F.lit(1)).alias("__c")))
        pick = (votes.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .select(F.col("__to"), F.col("__lbl").alias("__new")))
        state = (nodes.select(id_col)
                 .join(sd, id_col, "left")
                 .join(pick, F.col(id_col) == F.col("__to"), "left")
                 .select(F.col(id_col),
                         F.coalesce(F.col("__seed"), F.col("__new"))
                         .alias("__lbl"))
                 .localCheckpoint(eager=True))
    return state.select(F.col(id_col), F.col("__lbl").alias(label_col))

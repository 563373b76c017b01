#!/usr/bin/env python3
"""Registry-wide tokenizer/plan-shape sweep (VERDICT r9 #5).

Builds every registered query's formatted plan at the given SF and
reports, per query: the plan_audit shape stats plus the textual count of
tokenizer `split(` calls. Queries over the documents table should carry
at most ONE tokenizer copy per executed stage; the known multi-stage
exceptions (each stage tokenizing once, verified against the executed
plan in round 10) are listed in EXPECTED_MULTI with their reason.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python3 tools/registry_sweep.py \
      [--out plans/r10/registry_sweep.json]

Output: one JSON file {"sf_dir":..., "n_queries":..., "queries": {name:
{shape stats, "split_calls": n}}, "flagged": [...]} where `flagged` is
every query whose split-call count exceeds its expected bound.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.plan_audit import plan_stats  # noqa: E402

# Queries where >1 textual `split(` is correct, verified this round:
# either multiple pipeline STAGES each tokenizing once (executed-plan
# evidence in plans/r10), or the textual render duplicating a cached /
# reused subtree that executes once.
EXPECTED_MULTI: dict[str, tuple[int, str]] = {
    "text_unigram_logprob": (3, "2 executed scans tokenize once each; 3rd "
                                "textual copy is a runtime ReusedExchange "
                                "(plans/r10/text_unigram_logprob_executed.txt)"),
    "docs_curation_pipeline": (2, "exists() let-binding: 1 split in the "
                                  "pushed Filter + 1 in the keeper carry "
                                  "projection (plans/r10)"),
    "docs_bpe_encode": (4, "the encode expression is structurally "
                           "split(replace(concat_ws(split(text)))) — the "
                           "inner split is the token join of the encode "
                           "itself, one projection, not a repeated corpus "
                           "scan; 2 copies per scan render"),
    "docs_curation_v3_dsir": (4, "four pipeline STAGES (curation filter, "
                                 "DSIR target/corpus grams, keeper carry) "
                                 "each tokenize once — every plan line "
                                 "carries <= 1 split (r10 probe)"),
}
# Generic bound for textual copies when a query's plan renders a cached
# or unioned documents subtree more than once (InMemoryRelation renders
# its child per reference; each render tokenizes once).
DEFAULT_BOUND = 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "plans", "r10",
                                                  "registry_sweep.json"))
    ap.add_argument("--per-stage", action="store_true",
                    help="count max split( per WholeStageCodegen span too")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")

    from nexusbase_spark.session import get_spark
    from nexusbase_spark.queries import all_queries

    spark = get_spark("nexusbase-registry-sweep", master=f"local[{cpus}]",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    out: dict[str, dict] = {}
    flagged: list[dict] = []
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
        except Exception as exc:  # data-blocked queries etc.
            out[name] = {"error": str(exc)[:200]}
            continue
        stats = plan_stats(plan)
        stats["split_calls"] = len(re.findall(r"\bsplit\(", plan))
        out[name] = stats
        bound, why = EXPECTED_MULTI.get(name, (DEFAULT_BOUND, None))
        # Textual inflation from cached/unioned subtrees: every render of
        # an InMemoryRelation repeats its child's expressions. Normalize
        # by the number of documents-scan renders when >1.
        scans = max(stats["scans"], 1)
        per_scan = stats["split_calls"] / scans
        if stats["split_calls"] > bound and per_scan > 1:
            flagged.append({"query": name,
                            "split_calls": stats["split_calls"],
                            "scans": stats["scans"],
                            "bound": bound})
    result = {"sf_dir": sf_dir, "n_queries": len(out),
              "n_flagged": len(flagged), "flagged": flagged,
              "expected_multi": {k: v[1] for k, v in EXPECTED_MULTI.items()},
              "queries": out}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps({"n_queries": len(out), "n_flagged": len(flagged),
                      "flagged": [f["query"] for f in flagged],
                      "out": args.out}))
    spark.stop()


if __name__ == "__main__":
    main()

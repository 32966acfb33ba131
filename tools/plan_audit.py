"""Physical-plan anti-pattern sweep over EVERY driver query.

For each `__spark_entry__.queries()` entry, builds the DataFrame against a
small SF dir and greps the executed plan for the things that kill a job at
100 TB:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — an O(n·m) join that
  slipped past the equi-join path;
- ``Exchange SinglePartition`` — a global shuffle onto one task (scalar
  aggregates excepted: a 1-row result is the point);
- ``BatchEvalPython`` — a row-at-a-time Python UDF (Arrow paths show up as
  ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas and are fine).

Labeled correctness baselines are whitelisted EXPLICITLY below, so a new
violation anywhere else fails loudly. Run:

    python tools/plan_audit.py [sf_dir]

Exit code 1 on any non-whitelisted violation. tests/test_plans.py runs the
same audit over the cheap relational queries in CI.
"""

from __future__ import annotations

import json
import os
import sys

# query → allowed patterns, each with the reason the pattern is intentional
WHITELIST: dict[str, dict[str, str]] = {
    # labeled O(q·n) correctness baseline (brief: "brute-force cosine top-k
    # as the baseline"); the scale paths are ann_lsh_topk / ann_ivf_topk
    "ann_cosine_topk": {
        "BroadcastNestedLoopJoin": "bruteforce baseline: broadcast query side",
        "CartesianProduct": "bruteforce baseline",
    },
    # same labeled-baseline shape, over int8-quantized vectors (the point of
    # the query is quantized-vs-float parity, not the candidate strategy)
    "ann_quantized_topk": {
        "BroadcastNestedLoopJoin": "bruteforce baseline: broadcast query side",
        "CartesianProduct": "bruteforce baseline",
    },
    # scalar results: one row IS the output
    "confusion_cells": {"Exchange SinglePartition": "1-row scalar aggregate"},
    "score_metrics": {"Exchange SinglePartition": "1-row scalar aggregate"},
    "blocking_stats": {"Exchange SinglePartition": "1-row scalar aggregate"},
    # global top-k: TakeOrderedAndProject gathers k rows, not the data
    "top_scored_pairs": {
        "Exchange SinglePartition": "global top-k gather of k rows"
    },
    "top_customers_by_revenue": {
        "Exchange SinglePartition": "global top-k gather of k rows"
    },
    # pair_losses mirrors reference iter_scores (all-pairs by definition) —
    # runs bruteforce candidates for oracle parity; LSH path is recall-tested
    "pair_losses": {
        "BroadcastNestedLoopJoin": "reference iter_scores is all-pairs",
        "CartesianProduct": "reference iter_scores is all-pairs",
        "Exchange SinglePartition": "scalar normalization term",
    },
    # 1-row corpus-total broadcast crossJoin (the lazy alternative to an
    # eager driver-side count)
    "doc_keywords": {
        "BroadcastNestedLoopJoin": "broadcast 1-row corpus total",
        "Exchange SinglePartition": "1-row total aggregate",
    },
    # broadcast alpha-grid crossJoin (≤ a few hundred rows by construction)
    "calibration_alpha_sweep": {
        "BroadcastNestedLoopJoin": "broadcast alpha grid (30 rows)",
    },
    # broadcast-tiny fanout/dimension crossJoins — the heavy join is equi
    "ann_ivf_topk": {
        "BroadcastNestedLoopJoin": "broadcast n_cells centroid rows; "
        "candidate join is equi on cell id"
    },
    "ann_ivf2_topk": {
        "BroadcastNestedLoopJoin": "broadcast coarse-routing + fine-centroid "
        "rows (two-level quantizer); candidate join is equi on cell id",
        "Exchange SinglePartition": "Catalyst-injected runtime bloom-filter "
        "subquery (InjectRuntimeFilter): a 1-row scalar bloom aggregate on "
        "the query-id predicate, not a data shuffle",
    },
    "ann_pq_topk": {
        "BroadcastNestedLoopJoin": "broadcast PQ codebooks (m*k rows, ~128 "
        "KiB) and per-query ADC LUT; the codes scan is a broadcast-hash "
        "probe, never a shuffled cross join"
    },
    "ann_ivfpq_topk": {
        "BroadcastNestedLoopJoin": "broadcast centroids + codebooks + "
        "per-query ADC LUT; candidate join is equi on cell id"
    },
    "semdedup_embeddings": {
        "BroadcastNestedLoopJoin": "broadcast 8 centroid rows for the "
        "assignment map; the candidate join is equi on cell id",
    },
    # TF adjustment: the 1-row u_bar scalar (and the 1-row record total
    # inside term_frequencies) broadcast against the pair set; the
    # value-specific evidence join is equi on the agreed value
    "fs_tf_adjusted": {
        "BroadcastNestedLoopJoin": "broadcast 1-row u_bar / total scalars",
        "Exchange SinglePartition": "1-row scalar aggregates",
    },
    # WEP's mean-weight cut: the 1-row (Σcbs, n_edges) aggregate broadcast
    # against the edge set; the pair-scale joins are all equi (block, s0, s1)
    "metablock_wep_pairs": {
        "BroadcastNestedLoopJoin": "broadcast 1-row global-mean totals",
        "Exchange SinglePartition": "1-row totals aggregate",
    },
    "mixture_rates_lang": {
        "BroadcastNestedLoopJoin": "broadcast 1-row max-rate normalizer",
        "Exchange SinglePartition": "1-row max aggregate over the "
        "domains-sized rate table",
    },
    "sorted_neighborhood_pairs": {
        "BroadcastNestedLoopJoin": "broadcast window-1 delta rows; "
        "rank join is equi on rank+d"
    },
    "unite_nearest_voronoi": {
        "BroadcastNestedLoopJoin": "broadcast small target/seed set "
        "(voronoi contract: |targets| << |universe|)"
    },
    # driver-oracle parity runs the labeled bruteforce candidate mode at
    # this 1-row-count scale; the LSH scale path is recall-tested in pytest
    "embedding_threshold_pairs": {
        "BroadcastNestedLoopJoin": "labeled bruteforce for oracle parity",
        "CartesianProduct": "labeled bruteforce for oracle parity",
        "Exchange SinglePartition": "1-row scalar aggregate",
    },
}

PATTERNS = [
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "Exchange SinglePartition",
    "BatchEvalPython",
]


def audit(spark, sf_dir: str, only: set[str] | None = None):
    import __spark_entry__ as entrymod

    results = {}
    for name, fn in entrymod.queries().items():
        if only is not None and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # building some queries runs eager jobs
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            continue
        hits = [p for p in PATTERNS if p in plan]
        allowed = WHITELIST.get(name, {})
        violations = [p for p in hits if p not in allowed]
        results[name] = {
            "hits": hits,
            "whitelisted": [p for p in hits if p in allowed],
            "violations": violations,
        }
    return results


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])  # optional query-name subset
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from nama_spark.session import get_spark

    spark = get_spark(
        "plan_audit", cores=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    results = audit(spark, sf_dir, only=only or None)
    bad = {k: v for k, v in results.items() if v.get("violations") or v.get("error")}
    for name, r in sorted(results.items()):
        if r.get("error"):
            print(f"ERR   {name}: {r['error'][:120]}")
        elif r["violations"]:
            print(f"BAD   {name}: {r['violations']}")
        elif r["whitelisted"]:
            print(f"ok(w) {name}: {r['whitelisted']}")
        else:
            print(f"ok    {name}")
    print(json.dumps({"queries": len(results), "violations": len(bad)}))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

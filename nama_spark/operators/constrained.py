"""Constrained greedy clustering — the reference's full ``unite_similar``
path (embeddings.py:177-458) and ``MatchData.separate`` (match_data.py:395-454).

Semantics (from the reference):
- candidate pairs with calibrated score ≥ threshold are processed in
  DESCENDING cosine order (embeddings.py:336-337);
- a merge is REFUSED if the combined group would contain two strings of the
  same ``never_match`` set (embeddings.py:384-391);
- with ``group_threshold`` set, a merge is REFUSED unless the minimum pairwise
  cosine across the two groups ≥ cos(group_threshold) — complete-linkage
  check ``(V0 @ V1.T).min() >= separate_cos`` (embeddings.py:395-399);
- ``always_match`` sets pre-seed groups before the greedy loop
  (embeddings.py:224-238);
- ``return_united`` records the accepted pairs (embeddings.py:339-454).

Spark realization: the greedy loop is order-dependent, but constraints only
ever *refuse* merges, so the result decomposes by connected component of the
unconstrained ≥-threshold graph (plus always-edges): no merge can cross
components. Components are small after thresholding, so each one runs the
exact sequential loop inside one ``applyInPandas`` task — embarrassingly
parallel across components, reference-exact within each.
"""

from __future__ import annotations

import math
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nama_spark.operators.cluster import labels_for_nodes
from nama_spark.operators.embed import (
    DEFAULT_ALPHA,
    bruteforce_candidates,
    lsh_candidates,
)
from nama_spark.operators.matchdata import MatchData


def _greedy_component(
    members: list[str],
    vecs: np.ndarray,
    edges: list[tuple[int, int, float]],
    seed_groups: dict[int, int],
    never_sets: list[set[int]],
    separate_cos: float | None,
) -> list[int]:
    """Sequential constrained greedy inside one component. Indices are
    positions in ``members``; returns the group id per member."""
    group = dict(seed_groups)
    for i in range(len(members)):
        group.setdefault(i, i)
    members_of: dict[int, set[int]] = {}
    for i, g in group.items():
        members_of.setdefault(g, set()).add(i)

    never_of: dict[int, list[int]] = {}
    for k, s in enumerate(never_sets):
        for i in s:
            never_of.setdefault(i, []).append(k)

    edges = sorted(edges, key=lambda e: (-e[2], e[0], e[1]))
    for i0, i1, _cos in edges:
        g0, g1 = group[i0], group[i1]
        if g0 == g1:
            continue
        m0, m1 = members_of[g0], members_of[g1]
        # never_match: the merged group must not contain 2 strings of one set
        merged_never = {}
        violated = False
        for i in m0 | m1:
            for k in never_of.get(i, ()):
                if k in merged_never:
                    violated = True
                    break
                merged_never[k] = i
            if violated:
                break
        if violated:
            continue
        # group_threshold: complete-linkage min pairwise cos check
        if separate_cos is not None:
            v0 = vecs[sorted(m0)]
            v1 = vecs[sorted(m1)]
            if float((v0 @ v1.T).min()) < separate_cos:
                continue
        # unite
        keep, drop = (g0, g1) if len(m0) >= len(m1) else (g1, g0)
        for i in members_of[drop]:
            group[i] = keep
        members_of[keep] |= members_of.pop(drop)
    return [group[i] for i in range(len(members))]


def unite_similar_constrained(
    matchdata: MatchData,
    embeddings: DataFrame,
    threshold: float = 0.5,
    alpha: float = DEFAULT_ALPHA,
    group_threshold: float | None = None,
    always_match: Iterable[Iterable[str]] | None = None,
    never_match: Iterable[Iterable[str]] | None = None,
    candidate_mode: str = "bruteforce",
    **lsh_kwargs,
) -> MatchData:
    """Reference-exact constrained unite_similar. With no constraints this
    degrades to the distributed fast path (use operators.embed.unite_similar
    there — it avoids the per-component pandas step entirely)."""
    spark = embeddings.sparkSession
    cos_t = 1.0 + math.log(threshold) / alpha if threshold > 0 else -99.0
    sep_cos = (
        1.0 + math.log(group_threshold) / alpha
        if group_threshold is not None and group_threshold > 0
        else (None if group_threshold is None else -99.0)
    )

    if candidate_mode == "bruteforce":
        cand = bruteforce_candidates(embeddings, cos_t)
    else:
        cand = lsh_candidates(embeddings, cos_t, **lsh_kwargs)

    always_edges = []
    for grp in always_match or []:
        grp = sorted(grp)
        always_edges += [(grp[0], s) for s in grp[1:]]
    a_edges = (
        spark.createDataFrame(always_edges, ["s0", "s1"])
        if always_edges
        else spark.createDataFrame([], "s0 string, s1 string")
    )

    # components of the unconstrained graph bound all possible merges
    comp = labels_for_nodes(
        embeddings.select("string"),
        cand.select("s0", "s1").union(a_edges),
        node_col="string",
        src="s0",
        dst="s1",
    )

    # distinct column names per branch — both branches join the same comp
    # frame, and Spark's ambiguous-self-join check rejects shared refs
    comp_v = comp.select(
        F.col("node").alias("string"), F.col("component").alias("vcomp")
    )
    comp_e = comp.select(
        F.col("node").alias("s0"), F.col("component").alias("ecomp")
    )
    vecs = embeddings.select("string", "vec").join(comp_v, "string")
    edges = cand.join(comp_e, "s0").select("ecomp", "s0", "s1", "cos")

    never_sets = [sorted(s) for s in (never_match or [])]
    always_sets = [sorted(s) for s in (always_match or [])]

    out_schema = T.StructType(
        [
            T.StructField("string", T.StringType()),
            T.StructField("group", T.StringType()),
        ]
    )

    def solve(vec_pdf: pd.DataFrame, edge_pdf: pd.DataFrame) -> pd.DataFrame:
        members = sorted(vec_pdf["string"])
        idx = {s: i for i, s in enumerate(members)}
        # float64 to match the relational cosine (zip_with/aggregate on
        # doubles) used for the candidate scores
        vmat = np.array(
            [list(v) for v in vec_pdf.sort_values("string")["vec"]], dtype=np.float64
        )
        e = [
            (idx[r.s0], idx[r.s1], float(r.cos))
            for r in edge_pdf.itertuples()
            if r.s0 in idx and r.s1 in idx
        ]
        seed: dict[int, int] = {}
        for grp in always_sets:
            present = [idx[s] for s in grp if s in idx]
            for i in present[1:]:
                seed[i] = idx[grp[0]] if grp[0] in idx else present[0]
            if present:
                seed[present[0]] = present[0]
        nsets = [
            {idx[s] for s in ns if s in idx}
            for ns in never_sets
        ]
        nsets = [s for s in nsets if len(s) >= 2]
        gids = _greedy_component(members, vmat, e, seed, nsets, sep_cos)
        return pd.DataFrame(
            {"string": members, "group": [members[g] for g in gids]}
        )

    solved = (
        vecs.groupBy("vcomp")
        .cogroup(edges.groupBy("ecomp"))
        .applyInPandas(solve, schema=out_schema)
    )
    out = matchdata.df.drop("group").join(solved, "string", "left")
    out = out.withColumn("group", F.coalesce(F.col("group"), F.col("string")))
    return MatchData(out)


def separate(
    matchdata: MatchData,
    strings: Iterable[str],
    embeddings: DataFrame,
    threshold: float = 0.5,
    alpha: float = DEFAULT_ALPHA,
    **kwargs,
) -> MatchData:
    """Force the given strings into different groups (match_data.py:395-454):
    split every affected group, then re-predict its members with the separated
    strings as pairwise never_match constraints."""
    s_list = sorted(set(strings))
    affected = matchdata.matched_to(s_list).cache()
    affected_strings = {r["string"] for r in affected.select("string").collect()}
    rest = matchdata.drop(affected_strings)

    emb_sub = embeddings.join(
        affected.select("string"), "string", "left_semi"
    )
    sub_md = MatchData(
        affected.select("string", "count").withColumn("group", F.col("string")),
        _relabel=False,
    )
    re_clustered = unite_similar_constrained(
        sub_md,
        emb_sub,
        threshold=threshold,
        alpha=alpha,
        never_match=[s_list],
        **kwargs,
    )
    merged = rest.df.unionByName(re_clustered.df)
    return MatchData(merged)

"""Constrained clustering vs a from-spec sequential oracle on random unit
vectors (the reference's greedy semantics, embeddings.py:177-458)."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from nama_spark.operators.constrained import separate, unite_similar_constrained
from nama_spark.operators.matchdata import MatchData

ALPHA = 20.0


def _random_embeddings(rng, n=40, dim=8, n_clusters=6):
    """Clustered random unit vectors so thresholds produce real structure."""
    centers = [np.array([rng.gauss(0, 1) for _ in range(dim)]) for _ in range(n_clusters)]
    rows = []
    for i in range(n):
        c = centers[i % n_clusters]
        v = c + 0.3 * np.array([rng.gauss(0, 1) for _ in range(dim)])
        v = v / np.linalg.norm(v)
        rows.append((f"s{i:03d}", 1, [float(x) for x in v]))
    return rows


def _oracle(rows, threshold, group_threshold=None, always=None, never=None):
    """Sequential greedy from the published semantics."""
    strings = [r[0] for r in rows]
    vec = {r[0]: np.array(r[2], dtype=np.float64) for r in rows}
    cos_t = 1.0 + math.log(threshold) / ALPHA
    sep_cos = (
        1.0 + math.log(group_threshold) / ALPHA if group_threshold else None
    )
    group = {s: s for s in strings}
    members = {s: {s} for s in strings}

    def unite(a, b):
        ga, gb = group[a], group[b]
        if ga == gb:
            return
        keep, drop = (ga, gb) if len(members[ga]) >= len(members[gb]) else (gb, ga)
        for s in members[drop]:
            group[s] = keep
        members[keep] |= members.pop(drop)

    for grp in always or []:
        grp = sorted(grp)
        for s in grp[1:]:
            unite(grp[0], s)

    pairs = []
    for i, a in enumerate(strings):
        for b in strings[i + 1:]:
            c = float(vec[a] @ vec[b])
            if c >= cos_t:
                pairs.append((a, b, c))
    pairs.sort(key=lambda e: (-e[2], e[0], e[1]))

    never_sets = [set(s) for s in (never or [])]
    for a, b, _c in pairs:
        ga, gb = group[a], group[b]
        if ga == gb:
            continue
        merged = members[ga] | members[gb]
        if any(len(ns & merged) >= 2 for ns in never_sets):
            continue
        if sep_cos is not None:
            v0 = np.stack([vec[s] for s in sorted(members[ga])])
            v1 = np.stack([vec[s] for s in sorted(members[gb])])
            if float((v0 @ v1.T).min()) < sep_cos:
                continue
        unite(a, b)

    part = {}
    for s in strings:
        part.setdefault(group[s], set()).add(s)
    return {frozenset(v) for v in part.values()}


def _partition(md):
    groups = {}
    for r in md.df.collect():
        groups.setdefault(r["group"], set()).add(r["string"])
    return {frozenset(v) for v in groups.values()}


@pytest.fixture(scope="module")
def data(spark):
    rng = random.Random(11)
    rows = _random_embeddings(rng)
    emb = spark.createDataFrame(rows, ["string", "count", "vec"]).cache()
    md = MatchData(
        emb.select("string", "count").withColumn("group", F.col("string")),
        _relabel=False,
    )
    return rows, emb, md


def test_unconstrained_matches_oracle(spark, data):
    rows, emb, md = data
    got = _partition(
        unite_similar_constrained(md, emb, threshold=0.5, alpha=ALPHA)
    )
    assert got == _oracle(rows, 0.5)


def test_group_threshold_complete_linkage(spark, data):
    rows, emb, md = data
    got = _partition(
        unite_similar_constrained(
            md, emb, threshold=0.5, group_threshold=0.2, alpha=ALPHA
        )
    )
    want = _oracle(rows, 0.5, group_threshold=0.2)
    assert got == want
    # complete linkage can only refuse merges → partition is a refinement
    loose = _oracle(rows, 0.5)
    for g in want:
        assert any(g <= big for big in loose)


def test_never_match_blocks_merges(spark, data):
    rows, emb, md = data
    never = [["s000", "s006"], ["s012", "s018"]]
    got = _partition(
        unite_similar_constrained(md, emb, threshold=0.5, never_match=never,
                                  alpha=ALPHA)
    )
    assert got == _oracle(rows, 0.5, never=never)
    for g in got:
        assert not {"s000", "s006"} <= g
        assert not {"s012", "s018"} <= g


def test_always_match_preseeds(spark, data):
    rows, emb, md = data
    always = [["s001", "s002"]]
    got = _partition(
        unite_similar_constrained(md, emb, threshold=0.5, always_match=always,
                                  alpha=ALPHA)
    )
    assert got == _oracle(rows, 0.5, always=always)
    assert any({"s001", "s002"} <= g for g in got)


def test_separate_forces_apart(spark, data):
    rows, emb, md = data
    clustered = unite_similar_constrained(md, emb, threshold=0.5, alpha=ALPHA)
    part = _partition(clustered)
    # pick two strings that ended co-grouped
    big = max(part, key=len)
    assert len(big) >= 2
    a, b = sorted(big)[:2]
    out = separate(clustered, [a, b], emb, threshold=0.5, alpha=ALPHA)
    new_part = _partition(out)
    assert not any({a, b} <= g for g in new_part)
    # untouched groups stay intact
    for g in part:
        if g != big:
            assert g in new_part

"""Deterministic synthetic fixtures (seed 42) — FIXTURES.md schemas.

Generates the north-rule input table ``repo_files(repo, path, commit, lang,
content)`` plus gold clusters and labeled same-block pairs. Perturbation
classes mirror the reference's own test cases and demo fixture
(tests/test_utils.py:8-69; demo/similarity_matching.py:17-31 — the "Disney"
pattern of case/punct/suffix/typo variants with skewed counts), without
copying any reference data.

Pure stdlib + deterministic RNG: the same seed always yields byte-identical
tables, so a second generation serves as the "reference copy" for the per-row
sha256(content) invariant.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass

_ADJ = [
    "advanced", "global", "united", "national", "pacific", "atlantic",
    "northern", "southern", "eastern", "western", "digital", "general",
    "allied", "premier", "integrated", "dynamic", "capital", "summit",
    "pioneer", "liberty", "crown", "sterling", "apex", "quantum",
]
_NOUN = [
    "data", "micro", "tele", "info", "bio", "geo", "agro", "petro",
    "chem", "tech", "med", "aero", "hydro", "electro", "cyber", "astro",
]
_STEM = [
    "systems", "solutions", "industries", "partners", "laboratories",
    "networks", "dynamics", "logistics", "materials", "instruments",
    "analytics", "robotics", "energy", "media", "capital", "research",
]
_SUFFIXES = ["Inc", "Inc.", "LLC", "Ltd", "Corp", "Corporation", "Co",
             "Company", "Group", "PLC", "Holdings Co", "Holding Co LLC"]
_LANGS = ["py", "js", "go", "rs", "java", "c"]
_PATH_DIRS = ["src", "lib", "core", "util", "pkg", "internal", "app", "cmd"]
_PATH_FILES = ["main", "util", "parser", "engine", "model", "index", "io",
               "config", "server", "client"]


def _canonical_names(rng: random.Random, n: int) -> list[str]:
    """n distinct canonical names. The adj×noun×stem space is ~6k; beyond
    ~60% fill (or when collisions repeat) a numbered middle word keeps the
    generator linear at any n."""
    seen: set[str] = set()
    out = []
    max_simple = (len(_ADJ) * len(_NOUN) * len(_STEM)) * 6 // 10
    while len(out) < n:
        name = " ".join(
            [rng.choice(_ADJ), rng.choice(_NOUN) + rng.choice(_STEM)]
        ).title()
        if len(out) >= max_simple or name in seen:
            name = f"{name} {len(out):05d}"
        if name not in seen:
            seen.add(name)
            out.append(name)
    return out


def _typo(rng: random.Random, s: str) -> str:
    i = rng.randrange(1, len(s) - 1)
    op = rng.randrange(3)
    if op == 0:  # substitution
        return s[:i] + rng.choice("abcdefghijklmnopqrstuvwxyz") + s[i + 1 :]
    if op == 1:  # deletion
        return s[:i] + s[i + 1 :]
    return s[:i] + s[i] + s[i:]  # duplication


def _variants(rng: random.Random, canonical: str, k: int) -> list[str]:
    """k distinct messy variants of a canonical entity name."""
    pool = {canonical}
    attempts = 0
    while len(pool) < k and attempts < 50:
        attempts += 1
        choice = rng.randrange(8)
        if choice == 0:
            v = canonical.upper()
        elif choice == 1:
            v = canonical.lower()
        elif choice == 2:
            v = f"{canonical} {rng.choice(_SUFFIXES)}"
        elif choice == 3:
            v = f"The {canonical} {rng.choice(_SUFFIXES)}"
        elif choice == 4:
            v = canonical.replace(" ", rng.choice(["-", "_", ". "]))
        elif choice == 5:
            words = canonical.split()
            v = " & ".join(words) if len(words) > 1 else canonical + " & Co"
        elif choice == 6:
            v = _typo(rng, canonical)
        else:
            v = f"{canonical} {rng.choice(_SUFFIXES)}".upper()
        pool.add(v)
    return sorted(pool)


@dataclass
class Fixture:
    repo_files: list[tuple]        # (repo, path, commit, lang, content)
    gold: list[tuple]              # (string, count, group)
    labeled_pairs: list[tuple]     # (string0, string1, block_key, label)


def make_fixture(seed: int = 42, n_entities: int = 60,
                 max_variants: int = 6, max_files: int = 12) -> Fixture:
    rng = random.Random(seed)
    canon = _canonical_names(rng, n_entities)

    gold_rows, file_rows = [], []
    entity_of: dict[str, str] = {}
    for gid, name in enumerate(canon):
        n_var = rng.randint(2, max_variants)
        for v, variant in enumerate(_variants(rng, name, n_var)):
            if variant in entity_of:  # typo collided into another entity: skip
                continue
            entity_of[variant] = f"e{gid:04d}"
            # skewed multiplicities (13..1 pattern of the demo fixture)
            n_files = max(1, int(max_files / (v + 1)))
            gold_rows.append((variant, n_files, f"e{gid:04d}"))
            slug = "".join(ch if ch.isalnum() else "-" for ch in variant.lower())
            for fidx in range(n_files):
                path = (
                    f"{rng.choice(_PATH_DIRS)}/{rng.choice(_PATH_FILES)}_{fidx:02d}"
                    f".{rng.choice(_LANGS)}"
                )
                commit = hashlib.sha1(
                    f"{variant}|{fidx}|{seed}".encode()
                ).hexdigest()
                lang = path.rsplit(".", 1)[1]
                content = _fake_source(rng, variant, path)
                file_rows.append((variant, f"{slug}/{path}", commit, lang, content))

    labeled = _labeled_block_pairs(gold_rows)
    return Fixture(file_rows, gold_rows, labeled)


def _fake_source(rng: random.Random, repo: str, path: str) -> str:
    words = ["def", "return", "import", "class", "self", "value", "result",
             "data", "parse", "load", "init", "run", "x", "y", "cfg"]
    body = " ".join(rng.choice(words) for _ in range(rng.randint(30, 120)))
    return f"# {repo}:{path}\n{body}\n"


def _labeled_block_pairs(gold_rows: list[tuple]) -> list[tuple]:
    """All within-block pairs under the exact-normalized-key + shared-word
    blocking, labeled by gold co-membership (FIXTURES.md §4)."""
    import re
    from collections import defaultdict

    def simple_key(s: str) -> str:
        s = s.lower()
        s = re.sub(r"[^a-z0-9 ]+", " ", s)
        return re.sub(r"\s+", " ", s).strip()

    blocks: dict[str, set[str]] = defaultdict(set)
    entity = {}
    for s, _, g in gold_rows:
        entity[s] = g
        for w in simple_key(s).split():
            if len(w) >= 4:
                blocks[w].add(s)
        blocks["k:" + simple_key(s)].add(s)

    pairs = {}
    for key, members in blocks.items():
        if not 2 <= len(members) <= 50:
            continue
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pk = (ms[i], ms[j])
                if pk not in pairs:
                    label = 1 if entity[ms[i]] == entity[ms[j]] else 0
                    pairs[pk] = (ms[i], ms[j], key, label)
    return sorted(pairs.values())


def fixture_dataframes(spark, fixture: Fixture):
    """→ (repo_files_df, gold_df, labeled_pairs_df) with FIXTURES.md schemas."""
    records = spark.createDataFrame(
        fixture.repo_files, ["repo", "path", "commit", "lang", "content"]
    )
    gold = spark.createDataFrame(fixture.gold, ["string", "count", "group"])
    pairs = spark.createDataFrame(
        fixture.labeled_pairs, ["string0", "string1", "block_key", "label"]
    )
    return records, gold, pairs

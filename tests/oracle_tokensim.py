"""In-memory oracle for TokenSimilarity semantics, written from the published
behavior spec (SURVEY.md §2.8/§2.9 description of token_similarity's
fit/predict) — used only to property-test the distributed implementation.

Deliberately simple O(n²-in-block) Python; the final partition it produces is
the transitive closure of ≥-threshold same-block pairs, which is what the
reference's sequential unite loop converges to.
"""

from __future__ import annotations

import math
from collections import Counter
from itertools import combinations

import networkx as nx


def oracle_simplify(s: str) -> str:
    import re

    s = s.lower()
    s = re.sub(" & ", " and ", s)
    s = re.sub(r"(?<=\S)['’´\.](?=\S)", "", s)
    s = re.sub(r"[\s\.,!@#$%^&*:;/\'\"`´‘’“”\(\)_—\-]+", " ", s)
    return s.strip()


def oracle_simplify_corp(s: str) -> str:
    import re

    s = oracle_simplify(s)
    if s.startswith("the "):
        s = s[4:]
    return re.sub(
        "( (group|holding(s)?( co)?|inc(orporated)?|ltd|l ?l? ?[cp]"
        "|co(rp(oration)?|mpany)?|s[ae]|plc))+$",
        "",
        s,
        count=1,
    )


def tok_nmgrams(s: str, n: int = 2, m: int = 3) -> list[str]:
    out = []
    for j in range(n, m + 1):
        out.extend(s[i : i + j] for i in range(len(s) - j + 1))
    return out


def tok_words(s: str) -> list[str]:
    import re

    return re.findall(r"[A-Za-z0-9]+", s)


TOKENIZERS = {
    "nmgrams23": tok_nmgrams,
    "bigrams": lambda s: [s[i : i + 2] for i in range(len(s) - 1)],
    "trigrams": lambda s: [s[i : i + 3] for i in range(len(s) - 2)],
    "words": tok_words,
}


def oracle_fit(strings, tokenizer="nmgrams23", weighting="tf-idf",
               reference_doc_counts=True):
    """→ (tok_sets, weights, doc_counts)."""
    tok = TOKENIZERS[tokenizer]
    tok_lists = {s: tok(s) for s in strings}
    freq = Counter(t for lst in tok_lists.values() for t in lst)
    if reference_doc_counts:
        # reference quirk: doc count re-counts the token lists, so d == f
        doc = dict(freq)
    else:
        doc = Counter(t for lst in tok_lists.values() for t in set(lst))
    weights = {}
    for t, f in freq.items():
        d = doc[t]
        if weighting == "tf":
            weights[t] = float(f)
        elif weighting == "idf":
            weights[t] = 1.0 / math.log(1 + d)
        elif weighting == "tf-idf":
            weights[t] = f / math.log(1 + d)
        else:
            weights[t] = 1.0
    return {s: set(lst) for s, lst in tok_lists.items()}, weights, doc


def oracle_jaccard(set0, set1, weights):
    inter = set0 & set1
    if not inter:
        return 0.0
    denom = sum(weights[t] for t in set0 | set1)
    return sum(weights[t] for t in inter) / denom if denom else 0.0


def oracle_cosine(set0, set1, weights):
    inter = set0 & set1
    if not inter:
        return 0.0
    n0 = math.sqrt(sum(weights[t] ** 2 for t in set0))
    n1 = math.sqrt(sum(weights[t] ** 2 for t in set1))
    if not n0 * n1:
        return 0.0
    return sum(weights[t] ** 2 for t in inter) / (n0 * n1)


def oracle_candidate_pairs(tok_sets, doc_counts, max_block_size=100):
    pairs = set()
    strings = sorted(tok_sets)
    for t, d in doc_counts.items():
        if 2 <= d <= max_block_size:
            block = [s for s in strings if t in tok_sets[s]]
            pairs.update(
                (a, b) for a, b in combinations(sorted(block), 2)
            )
    return pairs


def oracle_predict(strings, threshold, tokenizer="nmgrams23", weighting="tf-idf",
                   measure="jaccard", max_block_size=100):
    """→ partition as a set of frozensets over all strings."""
    tok_sets, weights, doc = oracle_fit(strings, tokenizer, weighting)
    pairs = oracle_candidate_pairs(tok_sets, doc, max_block_size)
    score = oracle_jaccard if measure == "jaccard" else oracle_cosine
    g = nx.Graph()
    g.add_nodes_from(strings)
    for a, b in pairs:
        if score(tok_sets[a], tok_sets[b], weights) >= threshold:
            g.add_edge(a, b)
    return {frozenset(c) for c in nx.connected_components(g)}

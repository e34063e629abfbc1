"""prefix_filter_pairs — exact Jaccard-threshold similarity self-join
(AllPairs/PPJoin): equals brute-force all-pairs Jaccard exactly (no
false negatives from the prefix pruning, no false positives from the
integer verify), discriminates at the threshold boundary, and handles
degenerate sets."""

from __future__ import annotations

from itertools import combinations

from spider_spark.functions.dedup import prefix_filter_pairs


def _corpus():
    """Deterministic mixed corpus: 120 quasi-random sets over a small
    token space (natural overlaps well below threshold, some near it),
    plus planted near-dup twins straddling the 0.8 boundary."""
    docs = {}
    for s in range(120):
        docs[s] = {f"t{(s * 7 + k * k) % 97}" for k in range(12)}
    for s in range(0, 120, 10):
        # swap r tokens: r=1 -> J = 11/13 ~ 0.846 (kept);
        # r=2 -> J = 10/14 ~ 0.714 (dropped)
        r = 1 if (s // 10) % 2 == 0 else 2
        kept = sorted(docs[s])[: 12 - r]
        docs[1000 + s] = set(kept) | {f"x{s}_{i}" for i in range(r)}
    return docs


def _brute(docs, num, den):
    out = {}
    for a, b in combinations(sorted(docs), 2):
        i = len(docs[a] & docs[b])
        u = len(docs[a] | docs[b])
        if i * den >= num * u:  # J >= num/den  <=>  i*den >= num*(union)
            out[(a, b)] = (i, u)
    return out


def _run(spark, docs, threshold):
    rows = [(d, t) for d, toks in docs.items() for t in toks]
    df = spark.createDataFrame(rows, "doc_id long, tok string")
    got = prefix_filter_pairs(df, threshold=threshold).collect()
    return {(r["id_a"], r["id_b"]): (r["n_inter"], r["n_union"]) for r in got}


def test_matches_brute_force_exactly(spark):
    docs = _corpus()
    got = _run(spark, docs, (4, 5))
    want = _brute(docs, 4, 5)
    assert got == want
    # the boundary genuinely discriminates: kept twins present, dropped absent
    assert (0, 1000) in want and (10, 1010) not in want
    assert len(want) >= 6  # non-vacuous


def test_threshold_one_means_identical_sets(spark):
    docs = {1: {"a", "b", "c"}, 2: {"a", "b", "c"}, 3: {"a", "b"}, 4: {"z"}}
    got = _run(spark, docs, (1, 1))
    assert got == {(1, 2): (3, 3)}


def test_single_token_and_disjoint_sets(spark):
    docs = {1: {"only"}, 2: {"only"}, 3: {"other"}}
    got = _run(spark, docs, (4, 5))
    assert got == {(1, 2): (1, 1)}

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def qv(emb):
    return list(emb.filter(F.col("vec_id") == 0).first()["embedding"])


def test_brute_force_topk_matches_numpy(emb, qv):
    import numpy as np

    from spider_spark.functions.similarity import cosine_topk

    rows = emb.filter("vec_id != 0").collect()
    m = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    q = np.array(qv, dtype=np.float64)
    cos = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -cos))[:10]
    expected = [int(ids[i]) for i in order]

    got = [r["vec_id"] for r in cosine_topk(emb.filter("vec_id != 0"), qv, k=10).collect()]
    assert got == expected


def test_ann_lsh_recall(emb, qv):
    from spider_spark.functions.similarity import ann_lsh_topk, cosine_topk

    brute = {r["vec_id"] for r in cosine_topk(emb.filter("vec_id != 0"), qv, k=10).collect()}
    ann = {
        r["vec_id"]
        for r in ann_lsh_topk(
            emb.filter("vec_id != 0"), qv, k=10, n_planes=10, probe_hamming=4
        ).collect()
    }
    recall = len(brute & ann) / len(brute)
    assert recall >= 0.5, f"ANN recall@10 too low: {recall}"


def test_ivf_recall(emb, qv):
    from spider_spark.functions.similarity import cosine_topk, ivf_topk

    brute = {r["vec_id"] for r in cosine_topk(emb.filter("vec_id != 0"), qv, k=10).collect()}
    ivf = {
        r["vec_id"]
        for r in ivf_topk(emb.filter("vec_id != 0"), qv, k=10, n_cells=8, n_probe=4).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.4, f"IVF recall@10 too low: {recall}"


def test_ivf_trained_recall_not_worse(emb, qv):
    """Trained spherical-k-means cells must meet at least the random-cell
    recall gate (usually beating it) with the same probe budget."""
    from spider_spark.functions.similarity import cosine_topk, ivf_topk

    brute = {r["vec_id"] for r in cosine_topk(emb.filter("vec_id != 0"), qv, k=10).collect()}
    ivf = {
        r["vec_id"]
        for r in ivf_topk(
            emb.filter("vec_id != 0"), qv, k=10, n_cells=8, n_probe=4, train=True
        ).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.4, f"trained IVF recall@10 too low: {recall}"


def test_lsh_index_precompute_equivalent(emb, qv):
    """Serving from a persisted index must return the same top-k as the
    inline path (the per-query plan is then UDF-free)."""
    from spider_spark.functions.similarity import ann_lsh_topk, build_lsh_index

    base = emb.filter("vec_id != 0")
    index = build_lsh_index(base, dim=len(qv), n_planes=10).cache()
    inline = ann_lsh_topk(base, qv, k=10, n_planes=10, probe_hamming=4).collect()
    served = ann_lsh_topk(base, qv, k=10, n_planes=10, probe_hamming=4, index=index).collect()
    assert [r["vec_id"] for r in inline] == [r["vec_id"] for r in served]
    index.unpersist()


def test_pq_recall(emb, qv):
    from spider_spark.functions.similarity import (
        cosine_topk,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    base = emb.filter("vec_id != 0")
    brute = {r["vec_id"] for r in cosine_topk(base, qv, k=10).collect()}
    books = train_pq_codebooks(base, m_sub=8, n_codes=16)
    index = pq_encode(base, books).cache()
    got = {r["vec_id"] for r in pq_topk(index, base, books, qv, k=10, rerank=64).collect()}
    index.unpersist()
    recall = len(brute & got) / len(brute)
    assert recall >= 0.4, f"PQ recall@10 too low: {recall}"


def test_pq_planted_duplicate_is_structural_top(emb, qv):
    """The s8 oracle's guarantee: an exact duplicate shares the query's
    codes; with unit-norm codebooks + argmax-dot encoding the self-code
    maximizes every per-subspace LUT, so the duplicate's ADC score is
    the maximum possible and the exact rerank returns it at cosine 1.0."""
    from pyspark.sql import functions as F

    from spider_spark.functions.similarity import (
        pq_adc_score_col,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    base = emb.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    dup = base.filter("vec_id = 0").select(
        F.lit(1_000_000).cast("long").alias("vec_id"), "embedding"
    )
    both = base.unionByName(dup)
    books = train_pq_codebooks(both, m_sub=8, n_codes=16)
    index = pq_encode(both, books).cache()
    # the duplicate's ADC score equals the global maximum ADC score
    scored = index.select(
        "vec_id", pq_adc_score_col(F.col("codes"), books, qv).alias("adc")
    ).cache()
    max_adc = scored.agg(F.max("adc")).first()[0]
    dup_adc = scored.filter("vec_id = 1000000").first()["adc"]
    assert abs(dup_adc - max_adc) < 1e-9
    top = pq_topk(index, both, books, qv, k=5, rerank=64).collect()
    assert 1_000_000 in {r["vec_id"] for r in top}
    assert max(r["cos_sim"] for r in top) == 1.0
    scored.unpersist()
    index.unpersist()


def test_pq_query_plan_is_jvm_only(spark, tmp_path, emb, qv):
    """Scale property: querying a PERSISTED code table must involve no
    python operator — ADC is literal-array lookups in codegen."""
    import contextlib
    import io

    from spider_spark.functions.similarity import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    base = emb.filter("vec_id != 0")
    books = train_pq_codebooks(base, m_sub=8, n_codes=16)
    path = str(tmp_path / "pq_index")
    pq_encode(base, books).write.parquet(path)
    index = spark.read.parquet(path)
    served = pq_topk(index, base, books, qv, k=10, rerank=64)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        served.explain(mode="formatted")
    plan = buf.getvalue()
    assert "EvalPython" not in plan and "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan, "rerank pool must broadcast against the base"


def test_persisted_lsh_index_pushes_sig_filter_to_scan(spark, tmp_path, emb, qv):
    """The serve-path property at scale: querying a PERSISTED index must
    push the signature predicate into the parquet scan (row-group skip),
    and the query plan must contain no python operator."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from spider_spark.functions.similarity import ann_lsh_topk, build_lsh_index

    base = emb.filter("vec_id != 0")
    path = str(tmp_path / "ann_index")
    build_lsh_index(base, dim=len(qv), n_planes=10).write.parquet(path)
    index = spark.read.parquet(path)
    served = ann_lsh_topk(base, qv, k=10, n_planes=10, probe_hamming=2, index=index)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        served.explain(mode="formatted")
    plan = buf.getvalue()
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "In(sig" in pushed, f"probe-set IN filter must reach the scan, got: {pushed}"
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert served.count() >= 0


def test_batch_ann_matches_per_query_loop(spark, emb):
    """ann_topk_batch (one join, no driver loop) returns the SAME top-k
    per query as the per-query ann_lsh_topk path for every query it is
    given — batch serving is an execution-shape change, not a semantic
    one."""
    from spider_spark.functions.similarity import (
        ann_lsh_topk,
        ann_topk_batch,
        build_lsh_index,
    )

    base = emb.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    index = build_lsh_index(base, 64).persist()
    queries = base.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = ann_topk_batch(queries, index, 64, k=5, probe_hamming=1)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["cos_sim"]))
    # rank order == (cos desc, id asc); normalize collect order to it
    got = {k: sorted(v, key=lambda t: (-t[1], t[0])) for k, v in got.items()}
    for r in queries.collect():
        loop = [
            (x["vec_id"], x["cos_sim"])
            for x in ann_lsh_topk(
                base, list(r["embedding"]), k=5, probe_hamming=1, index=index
            ).collect()
        ]
        assert got[r["query_id"]] == loop, f"query {r['query_id']} diverged"
    index.unpersist()


def test_batch_ivf_matches_per_query_loop(spark, emb):
    """ivf_topk_batch == the per-query IVF path (probe cells from the
    same trained centroids, same tie-break)."""
    import numpy as np

    from spider_spark.functions.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_topk_batch,
        train_ivf_centroids,
    )

    base = emb.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    cents = train_ivf_centroids(base, n_cells=8)
    assigned, cents = ivf_assign(base, n_cells=8, centroids=cents)
    assigned = assigned.persist()
    queries = base.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = ivf_topk_batch(queries, assigned, cents, k=5, n_probe=3)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["cos_sim"]))
    got = {k: sorted(v, key=lambda t: (-t[1], t[0])) for k, v in got.items()}
    for r in queries.collect():
        q = np.array(r["embedding"], dtype=np.float64)
        probe = np.argsort(-(cents @ q))[:3].tolist()
        loop = [
            (x["vec_id"], x["cos_sim"])
            for x in cosine_topk(
                assigned.filter(F.col("ivf_cell").isin(probe)),
                [float(v) for v in r["embedding"]],
                k=5,
            ).collect()
        ]
        assert got[r["query_id"]] == loop, f"query {r['query_id']} diverged"
    assigned.unpersist()


def test_batch_pq_matches_per_query_loop(spark, emb):
    """pq_topk_batch == pq_topk per query (same codebooks, same rerank
    pool size) — the LUT-join scoring is the set-wise form of the same
    ADC arithmetic."""
    from spider_spark.functions.similarity import (
        pq_encode,
        pq_topk,
        pq_topk_batch,
        train_pq_codebooks,
    )

    base = emb.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    books = train_pq_codebooks(base, m_sub=8, n_codes=16)
    index = pq_encode(base, books).persist()
    queries = base.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = pq_topk_batch(queries, index, base, books, k=5, rerank=64)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["cos_sim"]))
    got = {k: sorted(v, key=lambda t: (-t[1], t[0])) for k, v in got.items()}
    for r in queries.collect():
        loop = [
            (x["vec_id"], x["cos_sim"])
            for x in pq_topk(
                index, base, books, [float(v) for v in r["embedding"]], k=5, rerank=64
            ).collect()
        ]
        assert got[r["query_id"]] == loop, f"query {r['query_id']} diverged"
    index.unpersist()


def test_semdedup_prunes_exactly_the_planted_copies(emb):
    """Planted ground truth for semdedup_prune: an exact copy quantizes
    to the identical int8 code vector, assigns to the same cluster
    (identical distances, same tie-break), sits at integer distance 0,
    and is pruned by its lower-id original — while no natural pair in
    this data falls under the threshold (min nonzero within-cluster
    sq-dist ≈ 1.1e5 >> 1e4), so the pruned set is EXACTLY the planted
    ids."""
    from spider_spark.functions.similarity import semdedup_prune

    e = emb.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    both = e.unionByName(
        e.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    out = semdedup_prune(both, k=8, threshold=10_000)
    pruned = {r["vec_id"] for r in out.filter("is_dup").collect()}
    planted = {r["vec_id"] + 1_000_000 for r in e.collect()}
    assert pruned == planted
    # copies land in their original's cluster
    pairs = (
        out.alias("a")
        .join(out.alias("b"), F.col("a.vec_id") + 1_000_000 == F.col("b.vec_id"))
        .filter(F.col("a.cluster") != F.col("b.cluster"))
        .count()
    )
    assert pairs == 0


def test_kmeans_assign_distance_is_true_argmin(emb):
    """quantized_kmeans_assign returns, for every vector, the MINIMUM
    integer distance over all k centroids (cross-checked in numpy)."""
    import numpy as np

    from spider_spark.functions.similarity import quantized_kmeans_assign

    e = emb.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    got = {r["vec_id"]: (r["cluster"], r["dist"]) for r in quantized_kmeans_assign(e, k=8).collect()}
    rows = sorted(e.collect(), key=lambda r: r["vec_id"])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = np.floor(m * (127.0 / np.abs(m).max(axis=1, keepdims=True)) + 0.5).astype(np.int64)
    cents = q[:8]
    for i, r in enumerate(rows):
        d = ((q[i] - cents) ** 2).sum(axis=1)
        cl, dist = got[r["vec_id"]]
        assert dist == d.min()
        assert cl == int(np.lexsort((np.arange(8), d))[0])

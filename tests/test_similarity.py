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

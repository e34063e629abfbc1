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

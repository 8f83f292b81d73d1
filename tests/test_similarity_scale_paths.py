"""Scale-path ANN variants: recall of IVF / LSH vs the exact baseline over
the real embeddings table."""

from esop_spark.operators import similarity


def test_ivf_topk_recall(spark):
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    )
    qids = list(range(5))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_topk(emb, query_ids=qids, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_ann_topk(
            emb, query_ids=qids, k=5, n_centroids=8, n_probe=4
        ).collect()
    }
    assert len(ivf) == len(exact) == 25
    recall = len(ivf & exact) / len(exact)
    # probing half the cells should recover well over half the true top-k
    assert recall >= 0.6, recall


def test_lsh_pairs_subset_of_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in similarity.lsh_cosine_pairs(emb, threshold=0.4).collect()
    }
    assert lsh <= exact  # verified candidates: no false positives
    if exact:
        assert len(lsh) / len(exact) >= 0.5  # decent recall at these params

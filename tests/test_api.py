"""The public facade works on arbitrary DataFrames and column names —
not just the driver testdata tables the queries bind to."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engage_spark import api


@pytest.fixture(scope="module")
def corpus(spark):
    """Tiny corpus with non-default column names and planted duplicates."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "THE  quick   brown fox jumps over the lazy dog "),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
        (4, "completely different content about databases and indexes"),
        (5, "another unrelated document discussing query planners"),
    ]
    return spark.createDataFrame(rows, ["uid", "body"])


def test_exact_dedup_stats_finds_planted_duplicate(corpus):
    stats = api.exact_dedup_stats(corpus, id_col="uid", text_col="body").toPandas()
    assert len(stats) == 4  # 5 docs, one collision
    dup = stats[stats.n_copies == 2]
    assert len(dup) == 1
    assert int(dup.keeper_id.iloc[0]) == 1


def test_exact_dedup_keepers_preserves_columns_and_drops_copy(corpus):
    kept = api.exact_dedup_keepers(corpus, id_col="uid", text_col="body").toPandas()
    assert sorted(kept.columns) == ["body", "uid"]
    assert sorted(kept.uid) == [1, 3, 4, 5]  # uid=2 lost to uid=1


def test_minhash_pairs_on_custom_columns(corpus):
    pairs = api.minhash_near_dup_pairs(
        corpus, id_col="uid", text_col="body", jaccard_threshold=0.4
    ).toPandas()
    found = {tuple(r) for r in pairs[["doc_a", "doc_b"]].itertuples(index=False)}
    assert (1, 2) in found  # exact dup must survive any threshold
    assert (1, 3) in found or (2, 3) in found  # near dup at 0.4


def test_simhash_pairs_on_custom_columns(corpus):
    pairs = api.simhash_near_dup_pairs(
        corpus, id_col="uid", text_col="body", max_hamming=10
    ).toPandas()
    found = {tuple(r) for r in pairs[["doc_a", "doc_b"]].itertuples(index=False)}
    assert (1, 2) in found  # identical normalized text -> hamming 0


def test_near_dup_components_clusters_the_triplet(corpus):
    pairs = api.minhash_near_dup_pairs(
        corpus, id_col="uid", text_col="body", jaccard_threshold=0.4
    )
    comp = api.near_dup_components(
        corpus.select("uid"), pairs, id_col="uid"
    ).toPandas()
    by_node = dict(zip(comp.node, comp.component))
    assert by_node[1] == by_node[2] == 1  # 1-2(-3) cluster keeps min id
    assert by_node[4] == 4 and by_node[5] == 5  # singletons keep themselves


def test_topk_cosine_matches_numpy_bruteforce(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(30, 8).astype("float32")
    pdf = pd.DataFrame(
        {"vid": range(30), "emb": [v.tolist() for v in vecs]}
    )
    df = spark.createDataFrame(pdf)
    queries = df.filter(F.col("vid") < 3)
    got = api.topk_cosine_search(
        df, queries, k=5, id_col="vid", emb_col="emb"
    ).toPandas()

    norms = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norms @ norms.T
    for qid in range(3):
        s = sims[qid].copy()
        s[qid] = -np.inf  # self excluded
        expect = set(np.argsort(-s)[:5])
        mine = set(got[got.query_id == qid].neighbor_id)
        assert mine == expect, f"query {qid}: {mine} != {expect}"


def test_hash_sample_is_deterministic_and_nested(spark):
    df = spark.range(0, 4000).withColumnRenamed("id", "k")
    s1 = api.hash_sample(df, 0.5, id_col="k")
    s2 = api.hash_sample(df, 0.5, id_col="k")
    assert s1.count() == s2.count()
    assert s1.exceptAll(s2).count() == 0  # identical selection
    n = s1.count()
    assert 0.4 * 4000 < n < 0.6 * 4000
    # nesting: the smaller-rate sample is a strict subset of the larger
    q = api.hash_sample(df, 0.25, id_col="k")
    assert q.exceptAll(s1).count() == 0
    assert 0 < q.count() < n


def test_hash_sample_rejects_bad_rate(spark):
    df = spark.range(3)
    with pytest.raises(ValueError):
        api.hash_sample(df, 1.5, id_col="id")


def test_token_stats_appends_columns(corpus):
    out = api.token_stats(corpus, text_col="body").toPandas()
    assert {"ws_tokens", "approx_llm_tokens"} <= set(out.columns)
    row1 = out[out.uid == 1].iloc[0]
    assert int(row1.ws_tokens) == 9


def test_embed_lsh_near_dup_pairs_on_custom_columns(spark):
    rng = np.random.RandomState(11)
    base = rng.randn(20, 64).astype("float32")
    vecs = list(base)
    vecs.append(base[0] + rng.randn(64).astype("float32") * 0.01)  # near-dup of 0
    pdf = pd.DataFrame({"eid": range(21), "vec": [v.tolist() for v in vecs]})
    df = spark.createDataFrame(pdf)
    pairs = api.embed_lsh_near_dup_pairs(
        df, id_col="eid", emb_col="vec", threshold=0.9
    ).toPandas()
    found = {tuple(r) for r in pairs[["vec_a", "vec_b"]].itertuples(index=False)}
    assert (0, 20) in found  # a 0.999-cosine pair collides in every band
    assert (pairs.cosine >= 0.9).all()

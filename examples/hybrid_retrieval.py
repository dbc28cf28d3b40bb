"""Hybrid retrieval over a curated corpus — lexical + semantic, fused.

Composes the engine's retrieval surface end to end:

  1. BM25 top-k (api.bm25_topk) over the `documents` text — the
     lexical leg; posting lists built in one scan, query terms
     broadcast.
  2. Semantic top-k over the `embeddings` table, BOTH ways the engine
     offers it: exact cosine (api.topk_cosine_search, the ground
     truth) and a PERSISTED IVF-PQ index (api.ivfpq_build +
     ivfpq_search — the 100 TB path: train once, search many).
  3. Reciprocal-rank fusion (api.rrf_fuse) of the lexical and
     semantic lists — rank-based, so no score normalization.
  4. Index health: api.ivfpq_recall_probe measures the persisted
     index's recall@k vs exact brute force on a deterministic sample —
     the drift signal a maintenance job watches to schedule a
     quantizer rebuild.

The testdata's `documents.doc_id` and `embeddings.vec_id` share an id
space, standing in for a corpus with both a text and an embedding
column (api.hybrid_search is the one-call form for that layout).

Run:  python examples/hybrid_retrieval.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, sf_dir: str, workdir: str) -> dict:
    from engage_spark import api

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # queries: the first-6-token prefix of docs 0-4 (lexical side) and
    # the same ids' embeddings (semantic side)
    queries = docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, 6), " "
        ).alias("query_text"),
    )
    qvecs = emb.filter(F.col("vec_id") < 5)

    lex = api.bm25_topk(docs, queries, k=10)

    exact = api.topk_cosine_search(emb, qvecs, k=10).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    fused_exact = api.rrf_fuse([lex, exact], k=10)

    # the at-scale semantic leg: persisted IVF-PQ index
    idx = f"{workdir}/ivfpq"
    api.ivfpq_build(emb, idx)
    ann = api.ivfpq_search(idx, qvecs, emb, k=10, rerank=50).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    fused_ann = api.rrf_fuse([lex, ann], k=10)

    # overlap of the two fused lists = how much the ANN approximation
    # moves the final ranking (the operational recall proxy)
    a = {(r.query_id, r.doc_id) for r in fused_exact.collect()}
    b = {(r.query_id, r.doc_id) for r in fused_ann.collect()}

    # index health: the probe -> nprobe policy (r12). Drift is first
    # answered by probing more lists (cheap, persisted into the index
    # meta); a quantizer rebuild is recommended only when the bounded
    # nprobe sweep cannot reach target.
    tune = api.ivfpq_autotune_nprobe(
        spark, idx, emb, target_recall=0.85, sample_queries=10, k=10
    )
    return {
        "lexical_rows": lex.count(),
        "fused_rows": len(a),
        "fused_overlap": len(a & b) / max(1, len(a)),
        "index_recall_at_10": tune["trace"][-1]["recall_at_k"],
        "tuned_nprobe": tune["tuned_nprobe"],
        "tuned_rerank": tune["tuned_rerank"],
        "initial_nprobe": tune["initial_nprobe"],
        "rebuild_recommended": tune["rebuild_recommended"],
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .appName("hybrid-retrieval")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    with tempfile.TemporaryDirectory() as tmp:
        print(run(spark, sf_dir, tmp))


if __name__ == "__main__":
    main()

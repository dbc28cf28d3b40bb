"""Embedding-space curation with the public API.

The lexical pipeline (curate_pretraining_corpus.py) catches exact and
near-verbatim duplicates; this example runs the EMBEDDING side — the
operators that catch paraphrases and translations sharing no n-grams,
and the similarity-search machinery a retrieval or dedup-audit job
needs. Every parameterized stage sizes itself from the corpus row
count (see SCALE.md "derive-params-from-corpus-size"):

    embeddings
      -> SemDeDup semantic prune (api.semdedup_prune: nearest-centroid
         clustering with k = n/96 hash-stride seeds, within-cluster
         cosine >= 0.35 keep-first dedup)
      -> embedding-LSH near-dup pairs on the SURVIVORS
         (api.embed_lsh_near_dup_pairs at lsh_banding_params(n) — the
         audit trail of what semantic dedup left behind)
      -> exact top-k cosine search over the survivors for a query set
         (api.topk_cosine_search — partial top-k keeps the exchange at
         partitions x queries x k rows)
      -> the same search compressed: PQ codes + ADC shortlist + exact
         re-rank (api.pq_topk_search — the scan reads 8-byte codes,
         32x less than raw floats; recall printed vs the exact path)
      -> and the production composition: true IVF-PQ
         (api.ivfpq_topk_search — coarse quantizer routes vectors to
         inverted lists, PQ encodes the residual, each query scans only
         its probed lists' codes)

Run:  python examples/semantic_dedup_and_search.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engage_spark import api


def run(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()  # a catalog statistic in production

    pruned = api.semdedup_prune(
        emb, id_col="vec_id", emb_col="embedding", threshold=0.35, n_rows=n
    )
    survivors = (
        pruned.filter(F.col("is_kept") == 1)
        .select("vec_id")
        .join(emb, "vec_id")
    )

    bands, rows = api.lsh_banding_params(n)
    residual_pairs = api.embed_lsh_near_dup_pairs(
        survivors, id_col="vec_id", emb_col="embedding",
        threshold=0.35, bands=bands, rows=rows,
    )

    queries = survivors.filter(F.col("vec_id") < 10)
    neighbors = api.topk_cosine_search(
        survivors, queries, k=5, id_col="vec_id", emb_col="embedding"
    )

    # the compressed-domain alternative: PQ codes (8 B/vector instead
    # of 256 B of floats) + ADC shortlist + exact re-rank — what the
    # same search costs when the corpus is too big to scan as floats
    pq_neighbors = api.pq_topk_search(
        survivors, queries, k=5, rerank=50, id_col="vec_id",
        emb_col="embedding",
    )

    # the production composition: coarse quantizer + PQ on residuals
    # (FAISS IndexIVFPQ shape) — sub-linear probed-list scanning AND
    # the 32x-compressed code scan in one index
    ivfpq_neighbors = api.ivfpq_topk_search(
        survivors, queries, k=5, rerank=50, id_col="vec_id",
        emb_col="embedding",
    )
    return {
        "semdedup": pruned,
        "residual_near_dups": residual_pairs,
        "topk_neighbors": neighbors,
        "pq_neighbors": pq_neighbors,
        "ivfpq_neighbors": ivfpq_neighbors,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("semantic-dedup-example")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = run(spark, sf_dir)
    kept = out["semdedup"].agg(F.sum("is_kept")).first()[0]
    total = out["semdedup"].count()
    print(f"semdedup: kept {kept}/{total}")
    print(f"residual near-dup pairs among survivors: "
          f"{out['residual_near_dups'].count()}")
    out["topk_neighbors"].orderBy("query_id", "rank").show(15, truncate=False)
    exact = {(r.query_id, r.neighbor_id) for r in out["topk_neighbors"].collect()}
    pq = {(r.query_id, r.neighbor_id) for r in out["pq_neighbors"].collect()}
    print(f"PQ (32x-compressed scan) recall vs exact: "
          f"{len(exact & pq) / max(len(exact), 1):.2f}")
    ivfpq = {(r.query_id, r.neighbor_id) for r in out["ivfpq_neighbors"].collect()}
    print(f"IVF-PQ (probed lists + residual codes) recall vs exact: "
          f"{len(exact & ivfpq) / max(len(exact), 1):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()

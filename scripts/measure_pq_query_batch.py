"""Measure the PQ query-side ADC table build at batch-retrieval query
counts (the r12 change: _pq_query_table / _ivfpq_query_table build the
(query_id, m, cid, dq) lookup rows DISTRIBUTED via queries.mapInPandas
against broadcast codebooks, where r11 ran a |Q| x M x K_SUB Python
triple loop on the driver).

What this pins: the table build must PARALLELIZE — wall time for the
build leg must grow far slower than the 1000x query-count blow-up
(10 -> 10^4 queries), because the rows are produced by Arrow batches
across executor threads instead of serialized driver Python. The
search end-to-end is also timed: a batch of 10^4 fused queries is the
decontamination / retrieval-augmentation shape this engine targets.

Usage: python scripts/measure_pq_query_batch.py [sf_dir] [n_queries]
Prints ONE JSON line:
  {"op": "pq_query_table", "n_corpus": ..., "q_small": 10,
   "q_big": N, "t_table_small": ..., "t_table_big": ...,
   "table_rows_big": ..., "t_search_big": ..., "growth_vs_q": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    q_big = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("pq-query-batch")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from engage_spark.api import _pq_query_table, pq_topk_search
    from engage_spark.queries.llm_similarity import _pq_codebooks

    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    n_corpus = e.count()
    cb = _pq_codebooks(spark, e, n_corpus)

    def queries_of(nq: int):
        # synthesize nq query rows by replicating the embedding table
        # with shifted ids (the table build's cost depends only on |Q|)
        copies = max(1, -(-nq // n_corpus))
        return (
            e.crossJoin(spark.range(copies).select(F.col("id").alias("__c")))
            .select(
                (F.col("vec_id") + F.col("__c") * n_corpus).alias("vec_id"),
                "embedding",
            )
            .filter(F.col("vec_id") < nq)
            .repartition(int(cpus))
        )

    def time_table(nq: int) -> tuple[float, int]:
        q = queries_of(nq)
        t0 = time.perf_counter()
        rows = _pq_query_table(spark, q, "vec_id", "embedding", cb).count()
        return round(time.perf_counter() - t0, 3), rows

    time_table(10)  # warm the Arrow/python-worker path
    t_small, _ = time_table(10)
    t_big, rows_big = time_table(q_big)

    t0 = time.perf_counter()
    pq_topk_search(
        e,
        queries_of(q_big),
        k=5,
        rerank=20,
        n_rows=n_corpus,
    ).count()
    t_search_big = round(time.perf_counter() - t0, 3)

    print(json.dumps({
        "op": "pq_query_table",
        "n_corpus": n_corpus,
        "q_small": 10,
        "q_big": q_big,
        "t_table_small": t_small,
        "t_table_big": t_big,
        "table_rows_big": rows_big,
        "t_search_big": t_search_big,
        "growth_vs_q": round(t_big / max(t_small, 1e-9), 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

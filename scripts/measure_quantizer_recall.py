"""Measure IVF-PQ recall@5: seeded (stride + one Lloyd step, the
DuckDB-oracle-able default) vs quantizer="kmeans" (MLlib fit, r14) on
the driver testdata. Ground truth = exact top-k cosine.

Usage: PYTHONPATH=. python scripts/measure_quantizer_recall.py [sf_dir]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from engage_spark import api
    from engage_spark.session import get_spark

    spark = get_spark()
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n = e.count()
    queries = e.filter("vec_id < 50")
    truth = {
        q: set(g["neighbor_id"])
        for q, g in api.topk_cosine_search(e, queries, k=5)
        .toPandas().groupby("query_id")
    }

    def recall(quantizer: str) -> tuple[float, float]:
        t0 = time.time()
        got = api.ivfpq_topk_search(
            e, queries, k=5, rerank=50, n_rows=n, quantizer=quantizer
        ).toPandas()
        wall = time.time() - t0
        hits = sum(
            len(set(g["neighbor_id"]) & truth[q])
            for q, g in got.groupby("query_id")
        )
        return hits / (5 * len(truth)), wall

    for qz in ("seeded", "kmeans"):
        r, w = recall(qz)
        print(f"{sf_dir} n={n} quantizer={qz}: recall@5={r:.3f} "
              f"wall={w:.1f}s")


if __name__ == "__main__":
    main()

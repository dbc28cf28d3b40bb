"""Measure x_semdedup_prune scaling on a density-preserving corpus
blow-up (same methodology as measure_lsh_scaling.py: extra copies are
cyclic rotations — norm-preserving, near-orthogonal to their source —
so true near-dup density stays that of the base corpus and growth comes
from corpus size alone).

What this pins: semdedup_params auto-scales k from the corpus row
count, holding per-cluster occupancy (and therefore pair volume per
row) constant — the registered query's pair join must grow LINEARLY.
A fixed k (the operator's first cut used the 10-label quantizer) grows
occupancy linearly and the pair join quadratically.

Usage: python scripts/measure_semdedup_scaling.py [sf_dir] [factor]
Prints ONE JSON line {"n1":..., "nN":..., "t1":..., "tN":...,
"growth":..., "k_1x":..., "k_Nx":...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("semdedup-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from engage_spark.queries.llm_similarity import (
        _embedding_dim,
        semdedup_params,
    )
    from engage_spark.registry import load_all

    q = load_all()["x_semdedup_prune"]
    dim = _embedding_dim(sf_dir)
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n1 = base.count()

    big_dir = "/tmp/semdedup_scale"
    shutil.rmtree(big_dir, ignore_errors=True)
    os.makedirs(big_dir)
    copies = []
    for c in range(factor):
        shift = (c * 7 + 1) % dim if c else 0
        rotated = (
            F.concat(
                F.slice("embedding", shift + 1, dim - shift),
                F.slice("embedding", 1, shift),
            )
            if shift
            else F.col("embedding")
        )
        copies.append(
            base.select(
                (F.col("vec_id") + F.lit(c * 10_000_000)).alias("vec_id"),
                rotated.alias("embedding"),
                F.col("label"),
            )
        )
    bigger = copies[0]
    for df in copies[1:]:
        bigger = bigger.unionByName(df)
    bigger.write.mode("overwrite").parquet(f"{big_dir}/embeddings.parquet")
    nN = spark.read.parquet(f"{big_dir}/embeddings.parquet").count()

    def run(d: str) -> float:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            q.fn(spark, d).write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        return round(best, 3)

    t1 = run(sf_dir)
    tN = run(big_dir)
    print(json.dumps({
        "n1": n1, "nN": nN, "t1": t1, "tN": tN,
        "growth": round(tN / t1, 2),
        "k_1x": semdedup_params(n1)[0], "k_Nx": semdedup_params(nN)[0],
    }))
    spark.stop()


if __name__ == "__main__":
    main()

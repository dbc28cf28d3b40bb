"""Measure the ANN search paths' scaling on the density-preserving
corpus blow-up (rotation-perturbed copies, as in measure_lsh_scaling /
measure_semdedup_scaling).

What this pins: both hand-built ANN paths derive their bucketing
parameters from the corpus row count (search_planes_count: P ~
log2(n/96) sign-bit planes; ivf_params: nlist ~ sqrt(n), nprobe ~
log2(nlist)), so per-QUERY candidate volume is polylog/sub-linear — a
fixed parameterization probes a constant corpus fraction and the
10-query batch would grow linearly with n.

Usage: python scripts/measure_ann_scaling.py [sf_dir] [factor]
Prints ONE JSON line per path:
  {"op": ..., "n1": ..., "nN": ..., "t1": ..., "tN": ...,
   "growth": ..., "params_1x": ..., "params_Nx": ...}
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
        .appName("ann-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from engage_spark.queries.llm_similarity import (
        _embedding_dim,
        ivf_params,
        search_planes_count,
    )
    from engage_spark.registry import load_all

    reg = load_all()
    dim = _embedding_dim(sf_dir)
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n1 = base.count()

    big_dir = "/tmp/ann_scale"
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

    def run(qname: str, d: str) -> float:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            reg[qname].fn(spark, d).write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        return round(best, 3)

    from engage_spark.queries.llm_similarity import pq_params

    for qname, params in [
        ("x3b_lsh_ann_search", lambda n: {"planes": search_planes_count(n)}),
        ("x3c_ivf_ann_search", lambda n: dict(
            zip(("nlist", "nprobe", "stride"), ivf_params(n)))),
        # PQ: codebook size is FIXED by design (bits per code), so the
        # expected growth driver is the code-table scan volume, linear
        # in n but 32x smaller than raw floats
        ("x3e2_pq_adc_search", lambda n: {"stride": pq_params(n)}),
        # IVF-PQ: probes scale like x3c, scan volume like x3e2 — the
        # composition should grow the SLOWEST of the three
        ("x3f_ivfpq_residual_search", lambda n: dict(
            zip(("nlist", "nprobe", "stride"), ivf_params(n)))),
    ]:
        t1 = run(qname, sf_dir)
        tN = run(qname, big_dir)
        print(json.dumps({
            "op": qname, "n1": n1, "nN": nN, "t1": t1, "tN": tN,
            "growth": round(tN / t1, 2),
            "params_1x": params(n1), "params_Nx": params(nN),
        }))
    spark.stop()


if __name__ == "__main__":
    main()

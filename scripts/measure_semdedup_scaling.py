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

r11 additions: (a) `coarse_rows_*` — the rows the TWO-LEVEL assignment
collects to the driver (the r10 single-level path collected all k
centroid rows; the fix collects only the ~sqrt(k) coarse seeds, so
driver memory must grow ~sqrt(N) while k grows N-fold); (b)
`cluster_agreement` / `kept_agreement` at 1x — how the two-level
assignment's clusters and prune decisions compare with a brute-force
single-level (global argmax) reference computed in numpy.

Usage: python scripts/measure_semdedup_scaling.py [sf_dir] [factor]
Prints ONE JSON line.
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

    import math

    def coarse_rows(d: str, n: int) -> int:
        k, stride = semdedup_params(n)
        cs = stride * max(1, math.isqrt(k))
        return (
            spark.read.parquet(f"{d}/embeddings.parquet")
            .filter(F.col("vec_id") % cs == 0).count()
        )

    # 1x agreement vs the single-level (global-argmax) reference —
    # brute force in numpy, fine at measurement scale
    import numpy as np

    rows = sorted(
        (r.vec_id, r.embedding)
        for r in base.select("vec_id", "embedding").collect()
    )
    ids = np.array([i for i, _ in rows], dtype=np.int64)
    mat = np.array([e for _, e in rows], dtype=np.float64)
    nrm = np.sqrt((mat * mat).sum(axis=1))
    nrm[nrm == 0] = 1.0
    k1, stride1 = semdedup_params(n1)
    seed_mask = ids % stride1 == 0
    sc_ids, sc_mat, sc_nrm = ids[seed_mask], mat[seed_mask], nrm[seed_mask]
    cos_all = (mat @ sc_mat.T) / np.outer(nrm, sc_nrm)
    ref_cluster = sc_ids[np.argmax(cos_all, axis=1)]
    pair_cos = (mat @ mat.T) / np.outer(nrm, nrm)
    ref_kept = np.ones(len(ids), dtype=bool)
    for ci in np.unique(ref_cluster):
        m = np.where(ref_cluster == ci)[0]
        sub = pair_cos[np.ix_(m, m)]
        for jj in range(1, len(m)):
            if (sub[:jj, jj] >= 0.35).any():
                ref_kept[m[jj]] = False
    got = {
        r.vec_id: (r.cluster_id, r.is_kept)
        for r in q.fn(spark, sf_dir).collect()
    }
    cl_agree = float(np.mean(
        [got[int(i)][0] == int(c) for i, c in zip(ids, ref_cluster)]
    ))
    kept_agree = float(np.mean(
        [got[int(i)][1] == int(kp) for i, kp in zip(ids, ref_kept)]
    ))

    # dup-pair RECALL vs brute-force ground truth (any smaller-id
    # partner >= 0.35 anywhere): the quality metric that matters —
    # cluster partitions can differ while catching the same dups
    gt_prune = np.zeros(len(ids), dtype=bool)
    for jj in range(1, len(ids)):
        if (pair_cos[:jj, jj] >= 0.35).any():
            gt_prune[jj] = True
    two_prune = np.array(
        [got[int(i)][1] == 0 for i in ids], dtype=bool
    )
    gt_n = max(1, int(gt_prune.sum()))
    recall_single = float((~ref_kept & gt_prune).sum()) / gt_n
    recall_two = float((two_prune & gt_prune).sum()) / gt_n

    print(json.dumps({
        "n1": n1, "nN": nN, "t1": t1, "tN": tN,
        "growth": round(tN / t1, 2),
        "k_1x": semdedup_params(n1)[0], "k_Nx": semdedup_params(nN)[0],
        "coarse_rows_1x": coarse_rows(sf_dir, n1),
        "coarse_rows_Nx": coarse_rows(big_dir, nN),
        "cluster_agreement": round(cl_agree, 4),
        "kept_agreement": round(kept_agree, 4),
        "gt_prunable": int(gt_prune.sum()),
        "recall_single_level": round(recall_single, 4),
        "recall_two_level": round(recall_two, 4),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

"""Attribute x2_minhash's sf0.1→sf1 wall growth between its phases
(r15, VERDICT r14 #5: 4.04x for 10x docs was the steepest subset line).

Phases measured cumulatively (each is the previous plus one stage) and
reported as increments:
  sig    — shingle hash + 32-perm MinHash signature (map-only Arrow
           pass, corpus-proportional by construction)
  bands  — + 8-band explode (map-only, 8 rows/doc)
  cand   — + the (band, key) shuffle, capped bucket self-join,
           distinct pairs (the part that grows with COLLISIONS, not
           corpus size)
  verify — + shingle-array rejoin and exact-Jaccard filter (grows
           with candidate pairs x shingle size)

Usage: python scripts/measure_minhash_phases.py [sf_dir ...]
One JSON line per sf_dir with phase increments + pair counts.
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
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/engage_sf1"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("minhash-phases")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from engage_spark.queries.llm_dedup import (
        _capped_bucket_pairs,
        minhash_band_rows,
        minhash_candidate_pairs,
        minhash_shingle_hashes,
        minhash_signature,
    )
    from engage_spark.io import spread_small_scan

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        return round(best, 3)

    # warm the Python worker pool once (bench.py's policy)
    noop(spark.range(int(cpus) * 4).select(F.col("id")))

    for d in dirs:
        docs = spread_small_scan(
            spark, spark.read.parquet(f"{d}/documents.parquet")
        )
        n_docs = docs.count()
        hashed = minhash_shingle_hashes(docs)
        sigs = hashed.select(
            "doc_id", minhash_signature(F.col("__h")).alias("sig")
        )
        bands = minhash_band_rows(hashed)
        cand = _capped_bucket_pairs(
            bands, ["band", "band_key"], "doc_id", "doc_a", "doc_b"
        )
        t_sig = timed(lambda: noop(sigs))
        t_bands = timed(lambda: noop(bands))
        t_cand = timed(lambda: noop(cand))
        t_full = timed(lambda: noop(minhash_candidate_pairs(docs)))
        n_cand = cand.count()
        n_pairs = minhash_candidate_pairs(docs).count()
        print(json.dumps({
            "op": "minhash_phases",
            "sf_dir": d,
            "docs": n_docs,
            "t_sig": t_sig,
            "t_bands_inc": round(t_bands - t_sig, 3),
            "t_cand_inc": round(t_cand - t_bands, 3),
            "t_verify_inc": round(t_full - t_cand, 3),
            "t_full": t_full,
            "candidate_pairs": n_cand,
            "verified_pairs": n_pairs,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

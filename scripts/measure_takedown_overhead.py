"""Measure the tombstone (takedown) overhead on index queries.

The delete path's scale claim is that a takedown costs O(batch) at
write time and a broadcast anti-join at query time — so query latency
should be flat in the number of tombstones (until vacuum-sized
backlogs). This script builds the minhash index over sf documents,
times the same near-dup query with 0 / 100 / 5000 tombstoned ids, then
vacuums and re-times.

Usage: PYTHONPATH=. python scripts/measure_takedown_overhead.py [sf_dir]
Prints one JSON line; the observed numbers are recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from engage_spark import api
    from engage_spark.session import get_spark

    spark = get_spark("measure-takedown")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    probe = docs.limit(20)
    work = tempfile.mkdtemp()
    idx = f"{work}/idx"
    try:
        n = api.minhash_index_build(docs, idx)

        def q() -> float:
            t0 = time.time()
            api.minhash_index_query(idx, probe).write.format("noop").mode(
                "overwrite"
            ).save()
            return round(time.time() - t0, 3)

        q()  # warm
        out = {"indexed": n, "query_no_tombstones": q()}
        api.minhash_index_delete(idx, range(1000, 1100), spark=spark)
        out["query_100_tombstones"] = q()
        api.minhash_index_delete(idx, range(2000, 6900), spark=spark)
        out["query_5000_tombstones"] = q()
        api.minhash_index_vacuum(spark, idx)
        out["query_after_vacuum"] = q()
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

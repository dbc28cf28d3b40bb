"""Materialize an sf1-scale dataset (10x the sf0.1 FACT tables) for
the second bench scale point (VERDICT r13 #6) — bench.py then runs
with SPARK_GRAFT_SF_DIR pointing here.

Blow-up rules (joins and dedup semantics preserved, growth honest):
- lineitem + orders: copy c shifts the SHARED order key by c*10M, so
  the j1/q-family joins keep 1:1 key relationships at 10x rows;
- events: copy c shifts event_id by c*10M (user_id kept — per-user
  event density grows, the realistic shape for windows);
- documents: copy c shifts doc_id and applies a PER-COPY TOKEN
  BIJECTION (every token suffixed `_c<N>`): cross-copy shingle sets
  are disjoint while each copy's INTERNAL Jaccard structure is
  byte-identical to the base corpus, so near-dup work and output grow
  exactly linearly with the blow-up. (r15 fix, two iterations: the
  original rule prepended ONE salt token, leaving copies ~identical
  under trigram Jaccard — near-dup OUTPUT grew ~940x for 10x docs and
  the x2 sf1 "4.04x" was the data's quadratic true-pair density, not
  engine scaling; an interleaved-salt attempt then DEGRADED shingle
  entropy (salted trigrams carry two real words) and blew up banding
  collisions instead. scripts/measure_minhash_phases.py attributes
  all of it);
- embeddings: copy c shifts vec_id (identical vectors: timing-only);
- dimension tables (region nation customer supplier part): 1x copies —
  dims do not grow with fact volume, and blowing them up would break
  key uniqueness.

Usage: python scripts/make_sf1.py [out_dir] [src_sf_dir] [factor]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_SHIFT = 10_000_000


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/engage_sf1"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "24g")
        .appName("make-sf1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def read(t):
        return spark.read.parquet(f"{src}/{t}.parquet")

    def fan(df, shifts: dict, salt_col: str | None = None):
        parts = []
        for c in range(factor):
            p = df
            for col in shifts:
                p = p.withColumn(col, F.col(col) + F.lit(c * _SHIFT))
            if salt_col is not None and c > 0:
                # per-copy token bijection: cross-copy shingles
                # disjoint, within-copy Jaccard structure preserved
                # exactly (see module docstring, r15)
                p = p.withColumn(
                    salt_col,
                    F.regexp_replace(F.col(salt_col), r"(\S+)", f"$1_c{c}"),
                )
            parts.append(p)
        o = parts[0]
        for p in parts[1:]:
            o = o.unionByName(p)
        return o

    plans = {
        "lineitem": fan(read("lineitem"), {"l_orderkey": 1}),
        "orders": fan(read("orders"), {"o_orderkey": 1}),
        "events": fan(read("events"), {"event_id": 1}),
        "documents": fan(read("documents"), {"doc_id": 1}, salt_col="text"),
        "embeddings": fan(read("embeddings"), {"vec_id": 1}),
    }
    for t in ("region", "nation", "customer", "supplier", "part"):
        plans[t] = read(t)
    for t, df in plans.items():
        n_files = 16 if t in ("lineitem", "orders", "events") else 4
        df.repartition(n_files).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: {spark.read.parquet(f'{out}/{t}.parquet').count()} rows")


if __name__ == "__main__":
    main()

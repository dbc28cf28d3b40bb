"""Measure the bucketed co-located join: one bucketed layout write
amortized over repeated fact-fact joins with ZERO exchange.

Setup: orders x lineitem from $SPARK_GRAFT_SF_DIR (default sf0.1,
~600k lineitem rows), broadcast disabled so the plain path must
shuffle both sides (the honest big-big shape — at 100 TB neither
fact side broadcasts). Times the join+aggregate at steady state
(min of 3 passes) in both layouts, asserts the bucketed plan carries
no hashpartitioning exchange, and reports the one-time bucketed write
cost that buys it.

Usage: python scripts/measure_bucketed_join.py [num_buckets]
Prints ONE JSON line:
  {"op": "bucketed_join", "rows_l": ..., "rows_o": ..., "buckets": ...,
   "t_write_bucketed": ..., "t_join_shuffle": ..., "t_join_bucketed": ...,
   "speedup": ..., "bucketed_exchanges": 0}
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


def _agg(joined):
    return joined.agg(
        F.count(F.lit(1)), F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    ).first()


def main() -> None:
    buckets = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("bucketed-join")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from engage_spark.io import write_bucketed

    base = "/tmp/_bucketed_join"
    shutil.rmtree(base, ignore_errors=True)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = {
        "op": "bucketed_join",
        "rows_l": lineitem.count(),
        "rows_o": orders.count(),
        "buckets": buckets,
    }

    t0 = time.time()
    write_bucketed(
        spark, orders, "mb_orders", ["o_orderkey"], buckets,
        path=f"{base}/orders",
    )
    write_bucketed(
        spark, lineitem, "mb_lineitem", ["l_orderkey"], buckets,
        path=f"{base}/lineitem",
    )
    out["t_write_bucketed"] = round(time.time() - t0, 3)

    def steady(mk):
        walls = []
        for _ in range(3):
            t0 = time.time()
            _agg(mk())
            walls.append(time.time() - t0)
        return round(min(walls), 3)

    out["t_join_shuffle"] = steady(
        lambda: orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
    )
    b_o, b_l = spark.table("mb_orders"), spark.table("mb_lineitem")
    out["t_join_bucketed"] = steady(
        lambda: b_o.join(b_l, b_o["o_orderkey"] == b_l["l_orderkey"])
    )
    plan = (
        b_o.join(b_l, b_o["o_orderkey"] == b_l["l_orderkey"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    out["bucketed_exchanges"] = plan.count("Exchange hashpartitioning")
    out["speedup"] = round(
        out["t_join_shuffle"] / max(out["t_join_bucketed"], 1e-9), 2
    )
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

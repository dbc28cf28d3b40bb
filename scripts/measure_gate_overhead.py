"""Commit-time expectation gate overhead (SCALE.md evidence).

Claim under test: the gate's cost is one extra COLUMN-PRUNED read of
the staged increment (fail mode: a counting aggregation; drop mode:
one Observation-carrying job that counts and writes survivors), never
a re-run of the upstream plan and never a function of the target
corpus size — so at 100 TB the gate adds increment-bounded work to an
append whose data write already dominates.

Method: version-logged events target; append the same slice four
ways at growing replication — ungated, gated-fail (clean data),
gated-drop (clean), gated-drop (20% dirty — event_id%10==1 hits 1 of
the 5 odd residues in the all-odd increment) — and report walls.

Usage: python scripts/measure_gate_overhead.py [sf_dir] [R...]
Prints ONE JSON line per replication:
  {"replication": R, "rows": n, "ungated_s": ..., "fail_clean_s": ...,
   "drop_clean_s": ..., "drop_dirty_s": ..., "dropped": n}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


RULES = [
    {"rule": "not_null", "col": "event_type"},
    {"rule": "in_range", "col": "v_cents", "lo": 0},
    {"rule": "expr", "id": "id_pos", "expr": "event_id >= 0"},
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = [int(r) for r in sys.argv[2:]] or [1, 10]

    from engage_spark.io import append_dataset, write_parquet
    from engage_spark.session import get_spark
    from engage_spark.versioning import version_log_enable

    spark = get_spark()
    root = tempfile.mkdtemp(prefix="gate_overhead_")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100 + 1e-9).cast("long").alias("v_cents"),
    )
    base = ev.filter(F.col("event_id") % 2 == 0)

    def slice_for(r: int):
        inc = ev.filter(F.col("event_id") % 2 == 1)
        parts = [
            inc.select(
                (F.col("event_id") + F.lit(10_000_000 * (k + 1))).alias(
                    "event_id"
                ),
                "event_type",
                "v_cents",
            )
            for k in range(r)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    for r in reps:
        inc = slice_for(r)
        n = inc.count()
        dirty = inc.withColumn(
            "v_cents",
            F.when(F.col("event_id") % 10 == 1, F.lit(-1).cast("long"))
            .otherwise(F.col("v_cents")),
        )
        walls = {}
        for tag, frame, kw in (
            ("ungated_s", inc, {}),
            ("fail_clean_s", inc, {"expectations": RULES}),
            (
                "drop_clean_s",
                inc,
                {"expectations": RULES, "on_violation": "drop"},
            ),
            (
                "drop_dirty_s",
                dirty,
                {"expectations": RULES, "on_violation": "drop"},
            ),
        ):
            tgt = f"{root}/t_{r}_{tag}"
            write_parquet(base, tgt)
            version_log_enable(spark, tgt)
            t0 = time.monotonic()
            res = append_dataset(spark, frame, tgt, **kw)
            walls[tag] = round(time.monotonic() - t0, 3)
            dropped = res.get("dropped_rows", 0)
        print(
            json.dumps(
                {"replication": r, "rows": n, **walls, "dropped": dropped}
            ),
            flush=True,
        )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> <suffix> [name ...]
Writes plans/<tag>/<name>_<suffix>.txt for each requested query (all
bench queries when no names are given). Lifecycle queries execute their
side-effect phases while the final frame is built; only the RETURNED
frame's plan is captured — which is exactly what the driver hashes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    tag = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("engage-spark-plans")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from engage_spark.registry import load_all

    registry = load_all()
    if not names:
        import bench

        names = [n for n in bench.HEADLINE if n in registry]
        names += [n for n in bench.OPTIONAL if n in registry]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            import contextlib
            import io

            df = registry[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 — record, keep going
            plan = f"ERROR capturing plan: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()

"""cProfile one registered query end-to-end (fn build + noop write).

Usage: python scripts/profile_query.py <name> [top_n]
Prints the top cumulative-time entries, engage_spark frames first —
the driver-side wall breakdown (Spark job waits show up inside the
py4j call frames of whichever engine function issued them).
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("engage-spark-profile")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from engage_spark.registry import load_all

    registry = load_all()

    def run() -> float:
        t0 = time.perf_counter()
        df = registry[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm-up pass: JVM/codegen/Python-worker pool out of the numbers
    warm = run()
    pr = cProfile.Profile()
    pr.enable()
    t = run()
    pr.disable()
    print(f"{name}: warm={warm:.3f}s profiled={t:.3f}s")
    buf = io.StringIO()
    st = pstats.Stats(pr, stream=buf).sort_stats("cumulative")
    st.print_stats("engage_spark", top_n)
    st.print_stats(top_n)
    print(buf.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()

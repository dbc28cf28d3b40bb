"""Time every registered query's Spark+oracle round at sf0.01.

Mirrors the driver's correctness sweep so we can see where its time
budget goes. Usage: python scripts/time_parity.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

from engage_spark.registry import load_all
from engage_spark.session import get_spark
from engage_spark.testing import compare_frames, duckdb_conn


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    t0 = time.time()
    spark = get_spark()
    registry = load_all()
    con = duckdb_conn(sf_dir)
    print(f"startup {time.time() - t0:.1f}s, {len(registry)} queries")
    timings = {}
    fails = []
    for qname, q in registry.items():
        t = time.time()
        try:
            spark_pdf = q.fn(spark, sf_dir).toPandas()
            t_spark = time.time() - t
            if q.oracle is None:
                ok, detail = True, f"rows-only:{len(spark_pdf)}"
            else:
                oracle_pdf = con.execute(q.oracle).df()
                r = compare_frames(qname, spark_pdf, oracle_pdf)
                ok, detail = r.ok, r.detail
        except Exception as e:  # noqa: BLE001
            ok, detail, t_spark = False, f"EXC:{e}", time.time() - t
        dt = time.time() - t
        timings[qname] = round(dt, 2)
        if not ok:
            fails.append((qname, detail))
        print(f"{'PASS' if ok else 'FAIL'} {qname} {dt:.2f}s (spark {t_spark:.2f}s)")
    total = time.time() - t0
    print(f"\nTOTAL {total:.1f}s for {len(timings)} queries")
    print("slowest:", sorted(timings.items(), key=lambda kv: -kv[1])[:12])
    if fails:
        print("FAILURES:")
        for n, d in fails:
            print(" ", n, d[:200])
    with open("/tmp/parity_timings.json", "w") as fh:
        json.dump({"total": total, "timings": timings}, fh)


if __name__ == "__main__":
    main()

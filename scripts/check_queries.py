"""Targeted oracle verification: named queries only, full_correctness
methodology (plain session, DuckDB oracle, order-insensitive value hash).

Usage: python3 scripts/check_queries.py name [name ...]
Env: SPARK_GRAFT_TEST_SF_DIR (default sf0.01).

The optimization-round inner loop: after touching an operator, prove the
declared queries it feeds still match their oracles before moving on —
minutes instead of the ~9-minute full-registry sweep.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from full_correctness import SF_DIR, TABLES, _value_hash  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m

    Q, O = m.queries(), m.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    n_fail = 0
    for name in names:
        if name not in Q:
            print(f"{name}: NOT REGISTERED")
            n_fail += 1
            continue
        try:
            sdf = Q[name](spark, SF_DIR)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in O:
                print(f"{name}: no oracle ({len(s_rows)} rows)")
                continue
            res = con.execute(O[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
            ok = (
                len(s_rows) == len(d_rows)
                and sorted(s_cols) == sorted(d_cols)
                and _value_hash(s_cols, s_rows) == _value_hash(d_cols, d_rows)
            )
            print(
                f"{name}: {'PASS' if ok else 'FAIL'} "
                f"(spark {len(s_rows)} rows, oracle {len(d_rows)})"
            )
            n_fail += not ok
        except Exception as e:  # noqa: BLE001 — report and keep going
            print(f"{name}: ERROR {type(e).__name__}: {e}"[:300])
            n_fail += 1
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

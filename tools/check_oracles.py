"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01; compare row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, floats rounded).

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from webgraph_algo_rs_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = f"{v:.9g}"
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return hashlib.md5("\n".join(out).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        took = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(s_rows)} rows, cols={s_cols} ({took:.1f}s) [rows-only]")
            if len(s_rows) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            res = con.sql(oracles[name])
            d_cols = [c for c in res.columns]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_cols = sorted(s_cols) == sorted(d_cols)
        ok_count = len(s_rows) == len(d_rows)
        ok_hash = ok_cols and canon(s_rows, s_cols) == canon(d_rows, d_cols)
        status = "OK  " if (ok_cols and ok_count and ok_hash) else "FAIL"
        print(
            f"{status}  {name}: rows {len(s_rows)}/{len(d_rows)} cols_ok={ok_cols} "
            f"hash_ok={ok_hash} ({took:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"      spark cols {sorted(s_cols)}")
                print(f"      duck  cols {sorted(d_cols)}")
            elif not ok_hash and len(s_rows) and len(d_rows):
                s_set = {tuple(r) for r in s_rows}
                d_set = {tuple(r) for r in d_rows}
                # align duck cols to spark order for the diff
                remap = [d_cols.index(c) for c in s_cols]
                d_set = {tuple(r[i] for i in remap) for r in d_rows}
                print(f"      spark-only sample: {list(s_set - d_set)[:3]}")
                print(f"      duck-only  sample: {list(d_set - s_set)[:3]}")
    print("FAILURES:", failures or "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

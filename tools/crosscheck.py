"""Local simulation of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet tables,
compare row counts and order-insensitive value hashes.

Usage: python tools/crosscheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if v != v:
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return repr(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return repr(int(v))
    return repr(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from go_lsh_spark.session import build_session

    spark = build_session(app_name="crosscheck", master="local[8]", shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only) [{time.time()-t0:.1f}s]")
            if len(srows) == 0:
                failures.append(name)
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            failures.append(name)
            continue
        count_ok = len(srows) == len(drows)
        schema_ok = sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols)
        hash_ok = count_ok and value_hash(srows, [c.lower() for c in scols]) == value_hash(
            drows, [c.lower() for c in dcols]
        )
        status = "OK   " if (count_ok and schema_ok and hash_ok) else "FAIL "
        print(
            f"{status} {name}: rows {len(srows)}/{len(drows)} schema={schema_ok} "
            f"hash={hash_ok} [{time.time()-t0:.1f}s]"
        )
        if status.startswith("FAIL"):
            failures.append(name)
            if count_ok and schema_ok and not hash_ok:
                sset = {tuple(norm_cell(v) for v in r) for r in srows}
                dset = {tuple(norm_cell(v) for v in r) for r in drows}
                print("   spark-only:", list(sset - dset)[:2])
                print("   duck-only: ", list(dset - sset)[:2])
    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

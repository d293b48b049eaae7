"""Local mirror of the driver's correctness gate.

Runs every `__spark_entry__.queries()` entry on Spark and its
`oracle_sql()` twin on DuckDB at a given sf dir, then compares row
count, column names, and an order-insensitive value hash (columns
sorted by name, rows sorted, values stringified) — the same contract
CORRECTNESS_r{N}.json records.  Queries without an oracle report
rows-only.

Usage:
  python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(str(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for row in canon:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from dude_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    spark = get_spark("check_oracle", master="local[8]", shuffle_partitions=8)
    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        spark_wall = time.monotonic() - t0
        if name not in oracles:
            print(f"{name:<24} rows-only  spark_rows={len(rows)}  [{spark_wall:.1f}s]")
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = [tuple(r) for r in ores.fetchall()]
        ok_rows = len(rows) == len(orows)
        ok_cols = sorted(cols) == sorted(ocols)
        ok_hash = ok_cols and value_hash(cols, rows) == value_hash(ocols, orows)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:<24} {status}  rows={len(rows)}/{len(orows)} "
            f"cols={'ok' if ok_cols else f'{cols} vs {ocols}'} "
            f"hash={'ok' if ok_hash else 'MISMATCH'}  [{spark_wall:.1f}s]"
        )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01; compare row count, column
names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from name_matching_spark.session import get_spark

    # 95+ queries run in ONE session; size the single-JVM heap for the
    # box (default 1g dies late in a full sf0.1 sweep)
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8,
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {str(e)[:200]}"))
            print(f"{name:24s} SPARK-ERROR")
            continue
        if name not in oracles:
            print(f"{name:24s} rows={len(srows):7d} (rows-only, no oracle)")
            if len(srows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {str(e)[:300]}"))
            print(f"{name:24s} DUCKDB-ERROR")
            continue
        problems = []
        # Guard against driver-fetch rendering divergence (r3 red-cell root
        # cause): DuckDB HUGEINT (sum over ints) / DECIMAL render as float64
        # via pandas/Arrow ("42.000000") while fetchall() gives int ("42").
        # Fail on any result column whose DuckDB type a pandas fetch would
        # re-render differently from the tuple fetch.
        safe_types = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT",
                      "UINTEGER", "USMALLINT", "UTINYINT", "DOUBLE", "FLOAT",
                      "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
                      "TIMESTAMP_NS", "TIMESTAMP WITH TIME ZONE"}
        try:
            rel = con.sql(oracles[name])
            weird = {c: str(t) for c, t in zip(rel.columns, rel.types)
                     if str(t) not in safe_types}
            if weird:
                problems.append(f"unsafe oracle result types {weird} "
                                "(HUGEINT/DECIMAL render as float via pandas)")
        except Exception:
            pass
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        else:
            hs = frame_hash(scols, srows)
            ho = frame_hash(ocols, orows)
            if hs != ho:
                problems.append("value-hash mismatch")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"{name:24s} FAIL: {'; '.join(problems)}")
        else:
            print(f"{name:24s} OK   rows={len(srows)}")
    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, p in failures:
            print(f"  {n}: {p}")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()

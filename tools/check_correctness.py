"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same parquet tables, compares row count, sorted column names, and an
order-insensitive value hash. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(value) -> str:
    if value is None:
        return "<NULL>"
    if isinstance(value, bool):
        return str(int(value))
    if isinstance(value, float):
        if value != value:
            return "nan"
        return f"{value:.9g}"
    return str(value)


def result_hash(columns: list[str], rows: list[tuple]) -> tuple[str, int, list[str]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return h, len(rows), sorted(columns)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # exactly what the driver runs: the entry module's registries (includes
    # the rows-only entries the battery module alone does not)
    import __spark_entry__ as entry
    from language_identification_spark.session import get_spark

    QUERIES = entry.queries()
    ORACLE_SQL = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark("check", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            sh, sn, sc = result_hash(s_cols, s_rows)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in ORACLE_SQL:
            print(f"okNA {name}: rows={sn} (no oracle, rows-only)")
            continue
        try:
            res = con.execute(ORACLE_SQL[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
            dh, dn, dc = result_hash(d_cols, d_rows)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            failures.append(name)
        elif sn != dn:
            print(f"FAIL {name}: rows {sn} vs {dn}")
            failures.append(name)
        elif sh != dh:
            print(f"FAIL {name}: value hash mismatch ({sn} rows)")
            # show a diff sample
            s_set = {
                "\x1f".join(canon(r[i]) for i in sorted(range(len(s_cols)), key=lambda i: s_cols[i]))
                for r in s_rows
            }
            d_set = {
                "\x1f".join(canon(r[i]) for i in sorted(range(len(d_cols)), key=lambda i: d_cols[i]))
                for r in d_rows
            }
            for x in list(s_set - d_set)[:3]:
                print(f"  spark-only: {x[:160]}")
            for x in list(d_set - s_set)[:3]:
                print(f"  duck-only:  {x[:160]}")
            failures.append(name)
        else:
            print(f"OK   {name}: rows={sn} hash={sh[:12]}")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

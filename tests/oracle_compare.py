"""Dev harness replicating the driver's Spark-vs-DuckDB comparison:
row count, column names, and order-insensitive value equality."""

from __future__ import annotations

import math
import sys


def load_oracle(sf_dir: str, sql: str):
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    rel = con.sql(sql)
    return rel.columns, rel.fetchall()


def normalize(v):
    import decimal

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, list):
        return tuple(normalize(x) for x in v)
    return v


def compare(name: str, spark_df, oracle_cols, oracle_rows) -> list:
    problems = []
    scols = spark_df.columns
    if [c.lower() for c in scols] != [c.lower() for c in oracle_cols]:
        problems.append(f"schema: spark={scols} oracle={oracle_cols}")
    srows = [tuple(normalize(v) for v in row) for row in spark_df.collect()]
    orows = [tuple(normalize(v) for v in row) for row in oracle_rows]
    if len(srows) != len(orows):
        problems.append(f"rowcount: spark={len(srows)} oracle={len(orows)}")
    if sorted(map(repr, srows)) != sorted(map(repr, orows)):
        sset = sorted(set(map(repr, srows)) - set(map(repr, orows)))
        oset = sorted(set(map(repr, orows)) - set(map(repr, srows)))
        problems.append(
            f"values: only-spark={sset[:3]} only-oracle={oset[:3]}")
    return problems


def main(sf_dir: str, only=None):
    sys.path.insert(0, ".")
    import __spark_entry__ as entry
    from fuzzy_search_spark.spark.session import get_spark

    spark = get_spark(master="local[8]")
    qmap = entry.queries()
    omap = entry.oracle_sql()
    failed = []
    for name, fn in qmap.items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        if name not in omap:
            n = df.count()
            print(f"{name:24s} rows-only: {n} rows")
            continue
        cols, rows = load_oracle(sf_dir, omap[name])
        problems = compare(name, df, cols, rows)
        status = "OK" if not problems else "FAIL"
        print(f"{name:24s} {status} ({len(rows)} rows)")
        for p in problems:
            print(f"    {p}")
        if problems:
            failed.append(name)
    spark.stop()
    print("FAILED:", failed or "none")
    return failed


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(sf, set(sys.argv[2:]) or None)

"""Local correctness gate mirroring the driver's CORRECTNESS check.

Runs every `queries()` entry from __spark_entry__.py on Spark and the matching
`oracle_sql()` string in DuckDB over the same parquet tables, then compares
row count, column names, and a value hash (columns sorted by name, rows sorted).

Usage:  python scripts/check_correctness.py [sf_dir] [query_name ...]
"""
import hashlib
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from ds_jedai_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            results[name] = {"status": "SPARK_ERROR", "error": str(e)[:300]}
            n_fail += 1
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            results[name] = {"status": "ROWS_ONLY", "rows": len(srows)}
            n_weak += 1
            print(f"weak  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            rel = con.execute(sql)
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:
            results[name] = {"status": "ORACLE_ERROR", "error": str(e)[:300]}
            n_fail += 1
            print(f"FAIL  {name}: oracle error: {str(e)[:200]}")
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_rows = len(srows) == len(orows)
        sh = table_hash(scols, srows)
        oh = table_hash(ocols, orows) if ok_cols else "-"
        ok_hash = ok_cols and sh == oh
        if ok_cols and ok_rows and ok_hash:
            results[name] = {"status": "PASS", "rows": len(srows)}
            n_pass += 1
            print(f"pass  {name}: {len(srows)} rows")
        else:
            results[name] = {
                "status": "MISMATCH",
                "spark_rows": len(srows), "oracle_rows": len(orows),
                "spark_cols": scols, "oracle_cols": ocols,
                "spark_hash": sh, "oracle_hash": oh,
            }
            n_fail += 1
            print(f"FAIL  {name}: rows {len(srows)} vs {len(orows)}, "
                  f"cols_ok={ok_cols}, hash {sh} vs {oh}")

    print(json.dumps({"pass": n_pass, "fail": n_fail, "rows_only": n_weak}))
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

"""Replay the driver's correctness gate locally: run every queries()
entry at sf0.01 AND its oracle_sql() in DuckDB, compare row count,
column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
from datetime import date, datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from xsd2json_spark.session import get_spark  # noqa: E402


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest(), lines


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.01"
    only = set(a for a in argv if not os.path.isdir(a))

    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    records = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:32s} rows={len(srows):6d}  (no oracle — rows-only check)")
            records[name] = {"rows": len(srows), "status": "no_oracle"}
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        srows_t = [tuple(r[c] for c in scols) for r in srows]
        sh, slines = table_hash(scols, srows_t)
        dh, dlines = table_hash(dcols, drows)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_hash = sh == dh
        status = "OK" if (ok_cols and ok_count and ok_hash) else "MISMATCH"
        records[name] = {
            "rows_spark": len(srows), "rows_oracle": len(drows),
            "cols_match": ok_cols, "hash_match": ok_hash, "status": status,
            "value_hash": sh,
        }
        print(f"{name:32s} rows={len(srows):6d}/{len(drows):6d} cols={'OK' if ok_cols else scols} hash={'OK' if ok_hash else 'DIFF'} -> {status}")
        if status != "OK":
            failures.append(name)
            if not ok_cols:
                print(f"   spark cols: {sorted(scols)}\n   duck  cols: {sorted(dcols)}")
            sset, dset = set(slines), set(dlines)
            for line in list(sset - dset)[:3]:
                print(f"   spark-only: {line[:160]}")
            for line in list(dset - sset)[:3]:
                print(f"   duck-only : {line[:160]}")
    print()
    if json_out:
        import json as _json

        n_oracle = sum(1 for r in records.values() if r["status"] != "no_oracle")
        payload = {
            "sf_dir": sf_dir,
            "n_queries": len(records),
            "n_oracle_checked": n_oracle,
            "n_ok": sum(1 for r in records.values() if r["status"] == "OK"),
            "n_no_oracle": len(records) - n_oracle,
            "failures": failures,
            "queries": records,
        }
        with open(json_out, "w") as fh:
            _json.dump(payload, fh, indent=1)
        print(f"wrote {json_out}")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracle comparisons OK")


if __name__ == "__main__":
    main()

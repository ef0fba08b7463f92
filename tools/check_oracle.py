"""Local replica of the driver's t2 correctness gate.

Runs every registered query through Spark AND its DuckDB oracle on the
same parquet, compares row-count, column names, and an order-insensitive
value hash (values normalized: floats rounded via repr, timestamps to
ISO).  Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def normalize_cell(v):
    import datetime
    import math
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_signature(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    norm_rows = sorted(
        tuple(normalize_cell(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for r in norm_rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return sorted_cols, len(norm_rows), h.hexdigest(), norm_rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from bigarrays_jl_spark.operators import ALL_ORACLES, ALL_QUERIES
    from bigarrays_jl_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in ALL_QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        sql = ALL_ORACLES.get(name)
        if sql is None:
            print(f"---- {name}: no oracle (rows-only) rows={len(srows)} "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        sc, sn, sh, snorm = table_signature(scols, [tuple(r) for r in srows])
        oc, on, oh, onorm = table_signature(ocols, orows)
        ok = (sc == oc) and (sn == on) and (sh == oh)
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name}: rows={sn}/{on} cols_match={sc == oc} "
              f"hash_match={sh == oh} [{time.time()-t0:.1f}s]")
        if not ok:
            failures.append(name)
            if sc != oc:
                print(f"   spark cols: {sc}\n   duck  cols: {oc}")
            else:
                sset, oset = set(snorm), set(onorm)
                for r in list(sset - oset)[:3]:
                    print(f"   spark-only: {r}")
                for r in list(oset - sset)[:3]:
                    print(f"   duck-only:  {r}")
    print(f"\n{len(failures)} failures: {failures}" if failures
          else "\nall queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

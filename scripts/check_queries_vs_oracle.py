"""Dev harness mirroring the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` in DuckDB at a
given sf dir; compare row count, sorted column names, and an
order-insensitive value hash."""

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:]) if len(sys.argv) > 2 else None

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
        return repr(round(v, 9))
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    import __spark_entry__ as entrymod
    from ontology_loader_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        t1 = time.time()
        if name not in osql:
            print(f"SKIP-ORACLE {name}: rows={len(srows)} ({t1 - t0:.1f}s)")
            continue
        try:
            rel = con.sql(osql[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_rows = len(srows) == len(drows)
        sh = value_hash(srows, scols)
        dh = value_hash(drows, dcols)
        ok_hash = sh == dh
        status = "OK  " if (ok_cols and ok_rows and ok_hash) else "FAIL"
        print(
            f"{status} {name}: spark_rows={len(srows)} duck_rows={len(drows)} "
            f"cols={'=' if ok_cols else f'{sorted(scols)}!={sorted(dcols)}'} "
            f"hash={'=' if ok_hash else 'MISMATCH'} ({t1 - t0:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_cols:
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sset = {tuple(norm_cell(r[i]) for i in order_s) for r in srows}
                dset = {tuple(norm_cell(r[i]) for i in order_d) for r in drows}
                print("   only-spark:", list(sset - dset)[:3])
                print("   only-duck :", list(dset - sset)[:3])

    spark.stop()
    print("FAILURES:", failures or "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

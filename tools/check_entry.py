"""Local replica of the driver's correctness gate: run every
queries()[name] against oracle_sql()[name] via DuckDB at a given sf.

Usage: PYTHONPATH=. python tools/check_entry.py [sf_dir] [query ...]
(optional query names restrict the run to just those gates)
"""

from __future__ import annotations

import math
import sys
import time

import duckdb


def normalize(rows, columns):
    """Sort columns by name, then rows — order-insensitive compare."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [columns[i] for i in order], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, ".")
    import __spark_entry__ as entrymod

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    only = set(sys.argv[2:])
    if only:
        unknown = only - set(qs)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows ({time.time()-t0:.1f}s) [rows-only]")
            if len(srows) == 0 and name not in ("minhash_near_dups",):
                failures.append((name, "0 rows in rows-only check"))
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            continue
        sc, sn = normalize(srows, scols)
        dc, dn = normalize(drows, dcols)
        if sc != dc:
            failures.append((name, f"columns differ: spark={sc} duck={dc}"))
            print(f"FAIL  {name}: columns differ: spark={sc} duck={dc}")
            continue
        if len(sn) != len(dn):
            failures.append((name, f"row counts differ: {len(sn)} vs {len(dn)}"))
            print(f"FAIL  {name}: rows {len(sn)} vs {len(dn)}")
            continue
        bad = None
        for a, b in zip(sn, dn):
            if a != b:
                ok = len(a) == len(b) and all(
                    (
                        isinstance(x, float)
                        and isinstance(y, float)
                        and math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
                    )
                    or x == y
                    for x, y in zip(a, b)
                )
                if not ok:
                    bad = (a, b)
                    break
        if bad:
            failures.append((name, f"values differ: {bad[0]} vs {bad[1]}"))
            print(f"FAIL  {name}: values differ:\n  spark={bad[0]}\n  duck ={bad[1]}")
        else:
            print(f"ok    {name}: {len(sn)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at the given sf dir, runs the
matching ``oracle_sql()`` in DuckDB (with the driver's pre-registered
views), and compares row count, column names, and an order-insensitive
value hash.  Usage::

    python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(pdf: pd.DataFrame) -> str:
    """Order-insensitive hash: sort columns by name, round floats,
    stringify rows, sort, md5."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols].copy()
    for c in cols:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
    rows = sorted(
        "|".join("NULL" if pd.isna(v) else str(v) for v in rec)
        for rec in pdf.itertuples(index=False, name=None))
    h = hashlib.md5()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    args = sys.argv[1:]
    out_path = None
    if "--json" in args:  # write a machine-readable sweep artifact
        i = args.index("--json")
        out_path = args[i + 1]
        del args[i:i + 2]
    if args and os.path.isdir(args[0]):
        sf_dir, only = args[0], set(args[1:])
    else:  # all args are query names; default sf dir
        sf_dir, only = "/root/testdata/sf0.01", set(args)
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir

    import __spark_entry__ as entrymod
    from stumpy_spark.session import get_spark

    spark = get_spark(app_name="verify-oracle", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    record = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            record[name] = {"status": "spark_error"}
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows ({t_spark:.1f}s) "
                  f"[rows-only]")
            record[name] = {"status": "rows_only", "rows": len(sdf),
                            "spark_sec": round(t_spark, 1)}
            continue
        t0 = time.time()
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            failures.append(name)
            record[name] = {"status": "duckdb_error"}
            continue
        t_duck = time.time() - t0
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns {sorted(sdf.columns)} vs "
                            f"{sorted(odf.columns)}")
        if not problems:
            hs, ho = value_hash(sdf), value_hash(odf)
            if hs != ho:
                problems.append("value-hash mismatch")
                _debug_mismatch(sdf, odf, name)
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} "
                  f"(spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)")
            failures.append(name)
            record[name] = {"status": "mismatch", "problems": problems}
        else:
            print(f"OK    {name}: {len(sdf)} rows "
                  f"(spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)")
            record[name] = {"status": "ok", "rows": len(sdf),
                            "spark_sec": round(t_spark, 1),
                            "duckdb_sec": round(t_duck, 1)}
    spark.stop()
    print("FAILURES:", failures if failures else "none")
    if out_path:
        import json
        with open(out_path, "w") as f:
            json.dump({"sf_dir": sf_dir,
                       "n_ok": sum(1 for v in record.values()
                                   if v["status"] == "ok"),
                       "n_fail": len(failures),
                       "failures": failures,
                       "queries": record}, f, indent=1)
    return 1 if failures else 0


def _debug_mismatch(sdf: pd.DataFrame, odf: pd.DataFrame,
                    name: str) -> None:
    cols = sorted(sdf.columns)
    a = sdf[cols].copy()
    b = odf[cols].copy()
    for c in cols:
        if a[c].dtype.kind == "f":
            a[c] = a[c].round(6)
        if b[c].dtype.kind == "f":
            b[c] = b[c].round(6)
    a["_k"] = a.astype(str).agg("|".join, axis=1)
    b["_k"] = b.astype(str).agg("|".join, axis=1)
    only_a = set(a._k) - set(b._k)
    only_b = set(b._k) - set(a._k)
    for r in list(only_a)[:3]:
        print(f"      spark-only: {r}")
    for r in list(only_b)[:3]:
        print(f"      duckdb-only: {r}")


if __name__ == "__main__":
    sys.exit(main())

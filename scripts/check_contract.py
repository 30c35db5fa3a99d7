"""Self-check harness mimicking the driver's correctness gate:
run each queries()[name] on Spark and oracle_sql()[name] on DuckDB over
the same sf dir, compare row count + column names + order-insensitive
value hash.  Usage: python scripts/check_contract.py [sf_dir] [q...]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from metasra_pipeline_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        kind = str(df[c].dtype)
        if kind == "object":
            df[c] = df[c].astype(str)
        elif kind.startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif kind.startswith("float"):
            df[c] = df[c].astype("float64").round(6)
        elif kind.startswith("datetime"):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("contract-check", cores=os.environ.get(
        "SPARK_GRAFT_CPUS", "8"), shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{os.path.join(sf, t + '.parquet')}'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows "
                  f"({time.time() - t0:.0f}s)")
            n_pass += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {str(e)[:200]}")
            n_fail += 1
            continue
        a, b = norm(sdf), norm(odf)
        ok_cols = list(a.columns) == list(b.columns)
        ok_rows = len(a) == len(b)
        ok_vals = ok_cols and ok_rows and a.equals(b)
        status = "PASS" if (ok_cols and ok_rows and ok_vals) else "FAIL"
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        print(f"{status} {name}: rows {len(a)}/{len(b)} cols_ok={ok_cols} "
              f"vals_ok={ok_vals} ({time.time() - t0:.0f}s)")
        if status == "FAIL" and ok_cols and ok_rows:
            diff = (a != b).any(axis=1)
            print("  first diffs:\n", a[diff].head(3), "\n  vs\n",
                  b[diff].head(3))
        elif status == "FAIL" and not ok_cols:
            print("  spark cols:", list(a.columns), " oracle:",
                  list(b.columns))
    print(f"\n{n_pass} pass, {n_fail} fail")


if __name__ == "__main__":
    main()

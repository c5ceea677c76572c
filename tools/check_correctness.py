"""Local replica of the driver's correctness gate: run every `queries()` entry
on Spark AND its `oracle_sql()` on DuckDB at sf0.01, compare row count, schema,
and order-insensitive values. Stricter than the driver (exact non-float match,
1e-9 float tolerance) so a local pass implies a driver pass.

    python tools/check_correctness.py [--sf-dir /root/testdata/sf0.01] [--only q21,q26]
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    errs = []
    if len(spark_pdf) != len(oracle_pdf):
        return [f"rows {len(spark_pdf)} != {len(oracle_pdf)}"]
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return [f"cols {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"]
    a, b = canon(spark_pdf), canon(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = np.allclose(
                av.astype(float).fillna(np.nan),
                bv.astype(float).fillna(np.nan),
                rtol=1e-9, atol=1e-12, equal_nan=True,
            )
        else:
            ok = av.equals(bv) or (av.astype(str).equals(bv.astype(str)))
        if not ok:
            diff_i = next(
                (i for i in range(len(av)) if str(av.iat[i]) != str(bv.iat[i])), None
            )
            errs.append(
                f"col {c} mismatch (first diff row {diff_i}: "
                f"{av.iat[diff_i] if diff_i is not None else '?'} vs "
                f"{bv.iat[diff_i] if diff_i is not None else '?'})"
            )
    return errs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from crawlingathome_worker_spark.session import get_spark

    spark = get_spark(app_name="check-correctness", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    n_pass = n_fail = n_noor = 0
    for name, fn in qs.items():
        if only and name not in only and name.split("_")[0] not in only:
            continue
        try:
            spark_pdf = fn(spark, args.sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"NO_ORACLE {name}: {len(spark_pdf)} rows")
            n_noor += 1
            continue
        try:
            oracle_pdf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {e}")
            n_fail += 1
            continue
        errs = compare(spark_pdf, oracle_pdf)
        if errs:
            print(f"FAIL {name}: {'; '.join(errs)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(spark_pdf)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noor} no-oracle")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

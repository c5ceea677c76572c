"""Materialize golden/queries/qNN.parquet from tests/golden_queries.py.

Run after intentional semantic changes:  python -m tests.gen_query_goldens
The goldens are the DuckDB-side oracle for the UDF-backed driver queries
(`__spark_entry__.oracle_sql` reads them via read_parquet); the live pytest
check is tests/test_query_goldens.py, which compares the Spark queries to
these files value-by-value at sf0.01.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

from crawlingathome_worker_spark.sources.fixtures import ensure_fixtures
from tests.golden_queries import GOLDEN_QUERIES, REPO

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(REPO, "golden", "queries")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    fx_dir = ensure_fixtures(os.path.join(REPO, ".fixtures"))
    for name, fn in GOLDEN_QUERIES.items():
        table = fn(SF_DIR, fx_dir)
        path = os.path.join(OUT, f"{name.split('_')[0]}.parquet")
        pq.write_table(table, path)
        print(f"{name}: {table.num_rows} rows -> {path}")


if __name__ == "__main__":
    main()

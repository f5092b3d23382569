#!/usr/bin/env python3
"""Measure the DuckDB baseline for every SparkEntry.oracleSql query.

    python3 tools/duckdb_baseline.py <sfDir> <outDirWithOracleJson>

Runs each oracle SQL in DuckDB (warm, min-of-3, all cores) over the
same parquet tables and prints per-query + total seconds as JSON.
Record the total in BASELINE.md and export it as
SPARK_GRAFT_DUCKDB_TOTAL_SEC when running graft.Bench so the bench
line carries the ratio.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    per = {}
    for name, sql in sorted(oracle.items()):
        con.sql(sql).fetchall()  # warm
        best = min(
            (lambda t0: (con.sql(sql).fetchall(), time.perf_counter() - t0)[1])(
                time.perf_counter())
            for _ in range(3))
        per[name] = round(best, 4)
    print(json.dumps({"total_sec": round(sum(per.values()), 4),
                      "queries": per, "sf": sf_dir}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

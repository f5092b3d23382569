#!/usr/bin/env python3
"""Time the DuckDB oracle both ways for the SERVED queries: the
recompute oracle (oracle_sql.json — the correctness gate's semantics)
and the served twin (served_sql.json — duck reading the same prepared
parquet artifacts the Spark side serves from). Round-11 verdict item
3: the headline ratio mixed a served numerator with a rebuilt
denominator for ~12 entries; this records both duck numbers so the
bench line can publish the symmetric ratio alongside the headline.

    python3 tools/duckdb_bake_served.py <sfDir> <outDirWithBothJson>

<outDir> must contain oracle_sql.json (from graft.Verify) and
served_sql.json + served/ (from graft.ServedBake).
Output: JSON with per-query {recompute, served} seconds and totals.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def best_of(con, sql, reps=3):
    con.sql(sql).fetchall()  # warm
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)


def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = Path(sf_dir) / f"{t}.parquet"
        if path.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    served = json.loads((Path(out_dir) / "served_sql.json").read_text())
    rows = {}
    for name, ssql in sorted(served.items()):
        rec = best_of(con, oracle[name]) if name in oracle else None
        srv = best_of(con, ssql)
        rows[name] = {"recompute": rec, "served": srv,
                      "delta": round((rec or 0) - srv, 4)}
    out = {
        "sf": sf_dir,
        "queries": rows,
        "recompute_total": round(
            sum(r["recompute"] or 0 for r in rows.values()), 4),
        "served_total": round(
            sum(r["served"] for r in rows.values()), 4),
        "delta_total": round(
            sum(r["delta"] for r in rows.values()), 4),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

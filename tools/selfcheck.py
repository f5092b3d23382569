#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
  python3 tools/selfcheck.py <sfDir> <outDir>

For each <outDir>/<name> parquet dir, runs oracle_sql.json[name] in
DuckDB over the same parquet tables and compares:
  - schema (column names, after sorting columns by name)
  - row count
  - value hash: columns sorted by name, floats canonicalized %.6f,
    timestamps in UTC ISO, rows hashed in order.
Mirrors SURVEY.md §5.2 canonicalization; the driver may differ in
detail, but a pass here is a strong signal.
"""
import json
import hashlib
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None).isoformat() if v.tz is None else \
            v.tz_convert("UTC").tz_localize(None).isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_df(df: pd.DataFrame) -> tuple[str, int, list[str]]:
    cols = sorted(df.columns)
    df = df[cols]
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update("|".join(canon_cell(v) for v in row).encode())
        h.update(b"\n")
    return h.hexdigest(), len(df), cols


def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    results = {}
    for name, sql in sorted(oracle.items()):
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            results[name] = "MISSING spark output"
            continue
        try:
            got = pd.read_parquet(spark_dir)
        except Exception as e:
            results[name] = f"spark read error: {e}"
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            results[name] = f"oracle error: {e}"
            continue
        gh, gn, gc = canon_df(got)
        eh, en, ec = canon_df(exp)
        if gc != ec:
            results[name] = f"SCHEMA mismatch: spark={gc} oracle={ec}"
        elif gn != en:
            results[name] = f"ROWS mismatch: spark={gn} oracle={en}"
        elif gh != eh:
            # locate first differing row for debugging
            got2 = got[sorted(got.columns)]
            exp2 = exp[sorted(exp.columns)]
            diff = ""
            for i in range(min(len(got2), len(exp2))):
                a = "|".join(canon_cell(v) for v in got2.iloc[i])
                b = "|".join(canon_cell(v) for v in exp2.iloc[i])
                if a != b:
                    diff = f" first diff row {i}:\n  spark:  {a}\n  oracle: {b}"
                    break
            results[name] = f"HASH mismatch ({gn} rows){diff}"
        else:
            results[name] = f"OK ({gn} rows)"
    width = max(len(k) for k in results)
    fails = 0
    for k, v in sorted(results.items()):
        print(f"{k:<{width}}  {v}")
        if not v.startswith("OK"):
            fails += 1
    print(f"\n{len(results) - fails}/{len(results)} OK")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

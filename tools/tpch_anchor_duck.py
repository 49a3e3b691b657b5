#!/usr/bin/env python3
"""DuckDB side of the TPC-H comparative anchor.

NOT part of the engine — a builder-side harness. Runs the q_tpch_*
oracle SQL (the exact SQL the correctness gate already validates
against the engine's results) on the SAME inflated parquet tables
graft.tools.TpchAnchor timed, and prints a side-by-side table.

Usage: python3 tools/tpch_anchor_duck.py <inflatedDir> <oracleSqlJson>
  <inflatedDir>    e.g. /tmp/graft_tpch_x10 (must contain spark_times.json)
  <oracleSqlJson>  a Verify dump's oracle_sql.json
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(dst, oracle_path):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{dst}/{t}.parquet/*.parquet'")
    oracle = json.load(open(oracle_path))
    spark = json.load(open(f"{dst}/spark_times.json"))["queries"]
    rows = []
    for i in range(1, 23):
        name = f"q_tpch_q{i}"
        sql = oracle[name]
        t0 = time.time()
        con.sql(sql).fetchall()
        cold = time.time() - t0
        t0 = time.time()
        con.sql(sql).fetchall()
        warm = time.time() - t0
        s = spark[f"q{i}"]
        rows.append((f"q{i}", s, warm, s / warm if warm > 0 else float("inf")))
        print(f"q{i:<3} duck cold {cold:6.2f}s warm {warm:6.2f}s   "
              f"spark {s:6.2f}s   ratio {s/warm:5.2f}x")
    total_s = sum(r[1] for r in rows)
    total_d = sum(r[2] for r in rows)
    print(f"\nTOTAL  spark {total_s:.1f}s  duckdb {total_d:.1f}s  "
          f"ratio {total_s/total_d:.2f}x")
    print("\n| q | spark s | duckdb s | ratio |")
    print("|---|---|---|---|")
    for n, s, d, r in rows:
        print(f"| {n} | {s:.2f} | {d:.2f} | {r:.2f}x |")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

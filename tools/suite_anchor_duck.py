#!/usr/bin/env python3
"""DuckDB side of the FULL-SUITE comparative anchor.

NOT part of the engine — a builder-side harness, the tpch_anchor
generalized. Runs every oracle SQL (the exact SQL the correctness gate
validates against the engine's results) on the SAME inflated parquet
tables graft.tools.SuiteAnchor timed, and prints a side-by-side table.

Each query gets a watchdog: DuckDB is interrupted after TIMEOUT_S and
the entry is recorded as a timeout — at inflated scale some of the
oracle CTEs (shingle self-joins written for CHECKING, not for scale)
are expected to blow up on a single node; that asymmetry is itself a
datapoint, not an error. Timeouts and engine-side io-shaped entries
(writes the read-only SQL has no equivalent of) are excluded from the
headline totals on BOTH sides.

Usage: python3 tools/suite_anchor_duck.py <inflatedDir> <oracleSqlJson>
  <inflatedDir>    e.g. /tmp/graft_suite_x10 (must contain spark_suite_times.json)
  <oracleSqlJson>  a Verify dump's oracle_sql.json
"""
import json
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
TIMEOUT_S = 120.0


def timed(con, sql):
    """(seconds, status): run sql with an interrupt watchdog."""
    done = threading.Event()

    def watchdog():
        if not done.wait(TIMEOUT_S):
            con.interrupt()

    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    t0 = time.time()
    try:
        con.sql(sql).fetchall()
        return time.time() - t0, "ok"
    except duckdb.InterruptException:
        return time.time() - t0, "timeout"
    except Exception as e:  # malformed-at-scale, OOM, ...
        return time.time() - t0, f"error:{type(e).__name__}"
    finally:
        done.set()


def main(dst, oracle_path):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{dst}/{t}.parquet/*.parquet'")
    oracle = json.load(open(oracle_path))
    spark = json.load(open(f"{dst}/spark_suite_times.json"))["queries"]

    rows = []
    for name in sorted(spark):
        if name not in oracle:
            continue
        s, io = spark[name]["warm_s"], spark[name]["io"]
        cold, st = timed(con, oracle[name])
        if st == "ok":
            warm, st = timed(con, oracle[name])
        else:
            warm = cold
        ratio = s / warm if warm > 0 else float("inf")
        rows.append((name, s, warm, ratio, io, st))
        print(f"{name:<28} duck {st:<7} warm {warm:7.2f}s   "
              f"spark {s:7.2f}s   ratio {ratio:6.2f}x{'  [io]' if io else ''}")

    comp = [r for r in rows if r[5] == "ok" and not r[4]]
    n_to = sum(1 for r in rows if r[5] == "timeout")
    n_io = sum(1 for r in rows if r[4])
    # The exhaustive-oracle watchdog rows (DuckDB pays the quadratic
    # scan the engine's operator exists to avoid) finish or time out
    # run-to-run, historically swinging the single headline total
    # 0.93x-1.70x. Report BOTH totals as fixed columns every run:
    # the ex-swing total is deterministic; the inc-swing total prints
    # a measured ratio when DuckDB finished and a bound (duck time
    # >= watchdog) when it didn't — the regime is visible either way.
    SWING = {"q_join_editdist"}
    stable = [r for r in comp if r[0] not in SWING]
    total_s = sum(r[1] for r in stable)
    total_d = sum(r[2] for r in stable)
    print(f"\nCOMPARABLE ({len(comp)} queries; excluded {n_io} io-shaped, "
          f"{n_to} duckdb-timeouts)")
    print(f"TOTAL-EX-SWING ({len(stable)} q, deterministic)  "
          f"spark {total_s:.1f}s  duckdb {total_d:.1f}s  "
          f"ratio {total_s/total_d:.2f}x")
    swing = [r for r in rows if r[0] in SWING and not r[4]]
    sw_s = sum(r[1] for r in swing)
    if swing and all(r[5] == "ok" for r in swing):
        sw_d = sum(r[2] for r in swing)
        print(f"TOTAL-INC-SWING ({len(stable) + len(swing)} q, measured)  "
              f"spark {total_s + sw_s:.1f}s  duckdb {total_d + sw_d:.1f}s  "
              f"ratio {(total_s + sw_s)/(total_d + sw_d):.2f}x")
    elif swing and all(r[5] in ("ok", "timeout") for r in swing):
        sw_d_min = sum(TIMEOUT_S if r[5] == "timeout" else r[2] for r in swing)
        print(f"TOTAL-INC-SWING ({len(stable) + len(swing)} q, BOUND — "
              f"duckdb swing row hit the {TIMEOUT_S:.0f}s watchdog)  "
              f"spark {total_s + sw_s:.1f}s  duckdb >{total_d + sw_d_min:.1f}s  "
              f"ratio <={(total_s + sw_s)/(total_d + sw_d_min):.2f}x")
    elif swing:
        # a crashed oracle (OOM, malformed-at-scale) produced NO result:
        # its time-until-crash is not a lower bound on completion, so
        # the inc-swing column reports the row incomparable instead of
        # dressing the crash up as a watchdog bound
        bad = ", ".join(f"{r[0]} ({r[5]})" for r in swing if r[5].startswith("error"))
        print(f"TOTAL-INC-SWING: INCOMPARABLE — duckdb swing row(s) "
              f"errored, no bound derivable: {bad}")
    print("\nworst 10 by ratio (comparable only):")
    for n, s, d, r, _, _ in sorted(comp, key=lambda r: -r[3])[:10]:
        print(f"| {n} | {s:.2f} | {d:.2f} | {r:.2f}x |")
    print("\nbest 10 by ratio (comparable only):")
    for n, s, d, r, _, _ in sorted(comp, key=lambda r: r[3])[:10]:
        print(f"| {n} | {s:.2f} | {d:.2f} | {r:.2f}x |")
    if n_to:
        print("\nduckdb timeouts (engine completed; single-node SQL did not):")
        for n, s, d, r, io, st in rows:
            if st == "timeout":
                print(f"| {n} | spark {s:.2f}s | duckdb >{TIMEOUT_S:.0f}s |")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

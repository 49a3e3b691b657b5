#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate.

NOT part of the engine (the engine is pure Scala/Spark) — this is a
builder-side harness that reruns what the driver does: for each query
result parquet dumped by graft.Verify, run the matching oracle SQL in
DuckDB over the same sf tables and compare schema + values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    """Representation-level canonicalization mirroring the driver.

    The driver hashes value REPRESENTATIONS, so -0.0 and 0.0 are
    different hashes even though Python tuple compare says they are
    equal (the round-7 q_agg_stats red row: DuckDB round() preserves
    the sign bit, Spark does not). Map -0.0 to a distinct token so
    this gate fails exactly where the driver would.
    """
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0.0"
        return v
    return v


def neg_zero_cols(cols, rows):
    """Columns containing any -0.0 — a latent representation hazard
    even when both sides happen to agree this run (another engine or
    scale may flip the sign of a near-zero rounded statistic)."""
    out = set()
    for r in rows:
        for c, v in zip(cols, r):
            if isinstance(v, float) and v == 0.0 and \
                    math.copysign(1.0, v) < 0:
                out.add(c)
    return sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = got.columns
            got_rows = got.fetchall()
            exp = con.sql(sql)
            exp_cols = exp.columns
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        # Driver-comparator capability guard: its pandas-based compare
        # crashes on array/map/struct values (sort_values -> factorize,
        # "unhashable type"), so any non-scalar column in an
        # oracle-checked output is an automatic FAIL here even though
        # this harness's tuple compare would handle lists fine.
        nested = [c for c, r in zip(got_cols, zip(*got_rows)) if any(
            isinstance(v, (list, dict, tuple)) for v in r)] if got_rows else []
        nested += [c for c, r in zip(exp_cols, zip(*exp_rows)) if any(
            isinstance(v, (list, dict, tuple)) for v in r)] if exp_rows else []
        if nested:
            print(f"FAIL {name}: non-scalar columns {sorted(set(nested))} — "
                  "driver comparator cannot hash array/map/struct values")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        g_cols = [got_cols[i] for i in gi]
        e_cols = [exp_cols[i] for i in ei]
        if g_cols != e_cols:
            print(f"FAIL {name}: columns {g_cols} != {e_cols}")
            n_fail += 1
            continue
        g = [tuple(norm(r[i]) for i in gi) for r in got_rows]
        e = [tuple(norm(r[i]) for i in ei) for r in exp_rows]
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount {len(g)} != {len(e)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(g, e) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: "
                  f"got={bad[0][0]} exp={bad[0][1]}")
            n_fail += 1
            continue
        hazard = sorted(set(neg_zero_cols(got_cols, got_rows)
                            + neg_zero_cols(exp_cols, exp_rows)))
        if hazard:
            print(f"PASS {name} ({len(g)} rows) "
                  f"[WARN: -0.0 present in {hazard} — normalize with "
                  "'+ 0.0' before both sides agree only by luck]")
        else:
            print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

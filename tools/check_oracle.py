#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [nameFilter...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir parquet
tables, sorts columns by name + rows, and compares values exactly.

Pass the same name-prefix filters that were given to graft.Verify to restrict
the check to the dumped subset. Without filters a missing parquet dump counts
as a FAIL (Verify swallows per-query exceptions, so a crashed query would
otherwise vanish silently).
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9) if not math.isnan(v) else "nan"
            rr.append(str(v))
        out.append(tuple(rr))
    out.sort()
    return out


def types_of(con, sql):
    """Column name -> DuckDB type string for an arbitrary SELECT."""
    return {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    filters = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    # oracle_sql.json carries each oracle under both "<name>" and
    # "<name>.parquet" (the driver looks up by output filename); check each
    # query once, via the bare-name key.
    oracles = {k: v for k, v in oracles.items() if not k.endswith(".parquet")}
    for name, sql in sorted(oracles.items()):
        if filters and not any(name.startswith(p) for p in filters):
            continue
        if not os.path.isdir(f"{out_dir}/{name}.parquet"):
            # In a full run every oracled query must have produced a dump;
            # Verify catches per-query exceptions, so treat absence as failure.
            print(f"FAIL {name}: no parquet dump (query crashed in Verify?)")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}.parquet/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        # Type lint: the driver's hash is TYPE-sensitive (round 6: DuckDB
        # widened uncast window sum() outputs to HUGEINT and the driver went
        # red while this string-comparing mimic stayed green). Mirror the
        # driver by requiring the oracle's DESCRIBE types to equal the Spark
        # dump's parquet types column-for-column.
        try:
            got_t = types_of(
                con,
                f"SELECT * FROM read_parquet('{out_dir}/{name}.parquet/*.parquet')")
            exp_t = types_of(con, sql)
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE exception {e}")
            n_fail += 1
            continue
        huge = sorted(c for c, t in exp_t.items()
                      if t.upper() in ("HUGEINT", "UHUGEINT"))
        if huge:
            print(f"FAIL {name}: oracle emits HUGEINT column(s) {huge} — "
                  f"CAST the aggregate in the oracle's output list")
            n_fail += 1
            continue
        diff_t = {c: (got_t[c], exp_t[c]) for c in exp_t if got_t[c] != exp_t[c]}
        if diff_t:
            print(f"FAIL {name}: type mismatch spark!=oracle: {diff_t}")
            n_fail += 1
            continue
        g, e = canon(got_rows, got_cols), canon(exp_rows, exp_cols)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
        elif g != e:
            diffs = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at rows {diffs}")
            for i in diffs[:2]:
                print(f"  spark: {g[i]}\n  duck : {e[i]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

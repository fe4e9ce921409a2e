#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
from oracle_sql.json in DuckDB over the same parquet tables and compare
against the Verify-dumped Spark results (columns sorted by name, values
hashed). Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os, threading
import duckdb
import pandas as pd

# Optional per-oracle wall clock (seconds) via CHECK_ORACLE_TIMEOUT:
# several oracles are deliberately naive O(N^2) all-pairs recomputations
# (exact jaccard over every doc pair) that are fine at the driver's
# sf0.01 gate but unbounded at sf1+. The ENGINE side scales (that's the
# point of the sf1 run); it's the oracle that can't. A timed-out oracle
# records SKIP (oracle timeout), never a FAIL — the Spark result still
# exists and its row count is reported.
ORACLE_TIMEOUT = float(os.environ.get("CHECK_ORACLE_TIMEOUT", "0")) or None

def run_oracle(con, sql):
    """fetchdf with an interrupt-based timeout; returns (df, timed_out)."""
    if ORACLE_TIMEOUT is None:
        return con.execute(sql).fetchdf(), False
    timer = threading.Timer(ORACLE_TIMEOUT, con.interrupt)
    timer.start()
    try:
        return con.execute(sql).fetchdf(), False
    except duckdb.InterruptException:
        return None, True
    except RuntimeError as e:  # older duckdb raises RuntimeError on interrupt
        if "INTERRUPT" in str(e).upper():
            return None, True
        raise
    finally:
        timer.cancel()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for hashing: ints -> int64, floats -> float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # Scale-proof runs (sf1+) can pass session knobs, e.g.
    #   CHECK_DUCKDB_SETUP="SET memory_limit='28GB'; SET threads=24;
    #                       SET disabled_optimizers='join_order'"
    # The near-dup oracles hide cardinalities behind AS MATERIALIZED
    # fences (deliberate — DuckDB 1.0 re-evaluates inlined CTEs per
    # reference), and with estimates blocked the optimizer may pick a
    # token-only tok-x-tok join order (~42B rows at sf1, OOM); the
    # syntactic order (candidates first) is the correct one there.
    # Unset (the driver's sf0.01 regime) nothing changes.
    for stmt in os.environ.get("CHECK_DUCKDB_SETUP", "").split(";"):
        if stmt.strip():
            con.execute(stmt)
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        # ScaleFixture writes <table>.parquet as a DIRECTORY of part files
        src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    only = {s.strip() for s in os.environ.get("CHECK_ONLY", "").split(",") if s.strip()}
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_path, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {spark_path}")
            n_fail += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            want_raw, timed_out = run_oracle(con, sql)
            if timed_out:
                print(f"SKIP {name}: oracle timeout after {ORACLE_TIMEOUT:.0f}s "
                      f"(spark result: {len(got)} rows)")
                n_skip += 1
                continue
            want = canon(want_raw)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
        elif not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            print(f"FAIL {name}: value mismatch in {int(neq.to_numpy().sum())} cells")
            print("  spark:", got[neq.any(axis=1)].head(3).to_dict("records"))
            print("  duckdb:", want[neq.any(axis=1)].head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # queries without oracles: rows-only check
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if os.path.isdir(d) and name not in oracle:
            files = glob.glob(os.path.join(d, "*.parquet"))
            rows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWS-ONLY {name}: {rows} rows")
    skip = f" / {n_skip} oracle-timeout-skip" if n_skip else ""
    print(f"\n{n_pass} pass / {n_fail} fail{skip}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Scale audit for the SKETCH gates: their oracles assert exact equality,
which holds in the below-capacity regime the sf0.01 driver gate pins
(KMV k=1024 > distinct texts, MG k=4096 > distinct users, KLL exact
below k) but CANNOT hold at sf1+ — a bounded-memory summary over 10x
the data is approximate BY DESIGN. Equality-FAILs there are not engine
errors; the engine is wrong only if it leaves the sketch's published
error bound. This tool checks exactly that:

  KMV/theta distinct counts   relative error <= 3/sqrt(k) (3-sigma)
  KLL quantiles               reported value's true rank within
                              eps = 1.7/k of the target rank
  Misra-Gries heavy hitters   est <= true and true - est <= n_total/k

Usage: audit_sketch.py <sfDir> <verifyOutDir>
Writes <verifyOutDir>/../AUDIT_SKETCH.json; exit 1 on any bound breach.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

KMV_K = 1024     # functions/KmvSketch.scala default
MG_K = 4096      # stream_heavy_hitters gate
KLL_K = 256      # functions/KllQuantiles.scala gate usage
KMV_TOL = 3.0 / math.sqrt(KMV_K)   # ~9.4%
KLL_EPS = 1.7 / KLL_K              # ~0.66% rank error (KLL single-level bound proxy)

def spark_result(out_dir, name):
    files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
    return pd.concat([pd.read_parquet(f) for f in files]) if files else None

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

    report = {}
    failures = 0

    def record(name, ok, detail):
        nonlocal failures
        if not ok:
            failures += 1
        report[name] = {"ok": bool(ok), **detail}
        print(f"{'PASS' if ok else 'FAIL'} {name}: {detail}")

    def distinct_gate(gate, approx_cols, key_cols):
        """Every approx col within KMV_TOL of the oracle's exact value;
        every non-approx col exactly equal."""
        got = spark_result(out_dir, gate)
        want = con.execute(oracle[gate]).fetchdf()
        if got is None or len(got) != len(want):
            record(gate, False, {"error": "row count mismatch"})
            return
        key = key_cols or None
        if key:
            got = got.sort_values(key).reset_index(drop=True)
            want = want.sort_values(key).reset_index(drop=True)
        worst = 0.0
        exact_bad = 0
        for c in want.columns:
            if c in approx_cols:
                rel = ((got[c].astype("float64") - want[c].astype("float64")).abs()
                       / want[c].astype("float64").clip(lower=1.0)).max()
                worst = max(worst, float(rel))
            elif not got[c].reset_index(drop=True).equals(want[c].reset_index(drop=True)):
                exact_bad += 1
        record(gate, worst <= KMV_TOL and exact_bad == 0,
               {"worst_rel_err": round(worst, 5), "bound": round(KMV_TOL, 5),
                "exact_col_mismatches": exact_bad})

    # --- KMV / theta distinct sketches ---
    distinct_gate("doc_sql_pipeline", {"n_distinct_texts"}, ["lang"])
    distinct_gate("rel_stats", {"ndv"}, ["column_name"])
    distinct_gate("rel_theta_sets",
                  {"n_f", "n_o", "n_union", "n_intersect", "n_f_only"}, [])
    distinct_gate("stream_distinct_sketch", {"n_users"}, ["event_type"])

    # --- KLL quantiles: rank of the reported value within eps of target ---
    def quantile_gate(gate, table, valcol, groupcol, targets):
        got = spark_result(out_dir, gate)
        if got is None:
            record(gate, False, {"error": "no spark output"})
            return
        worst = 0.0
        for _, row in got.iterrows():
            for col_name, q in targets.items():
                v = float(row[col_name])
                g = row[groupcol]
                frac = con.execute(
                    f"""SELECT CAST(count(*) FILTER (WHERE {valcol} <= ?) AS DOUBLE)
                               / count(*) AS r,
                               CAST(count(*) FILTER (WHERE {valcol} < ?) AS DOUBLE)
                               / count(*) AS rlo
                        FROM {table} WHERE {groupcol} = ?""",
                    [v, v, g]).fetchone()
                # true rank interval of the reported value; distance to target
                err = max(0.0, q - frac[0], frac[1] - q)
                worst = max(worst, err)
        record(gate, worst <= KLL_EPS,
               {"worst_rank_err": round(worst, 5), "bound": round(KLL_EPS, 5)})

    quantile_gate("rel_quantile_sketch", "orders", "o_totalprice", "o_orderpriority",
                  {"p50": 0.5, "p90": 0.9, "p99": 0.99})
    quantile_gate("stream_quantiles", "events", "value", "event_type",
                  {"p50": 0.5, "p90": 0.9})

    # --- Misra-Gries: est <= true, true - est <= n/k ---
    got = spark_result(out_dir, "stream_heavy_hitters")
    if got is None:
        record("stream_heavy_hitters", False, {"error": "no spark output"})
    else:
        n_total = con.execute("SELECT count(*) FROM events").fetchone()[0]
        bound = n_total / MG_K
        con.register("mg", got)
        r = con.execute("""
          WITH t AS (
            SELECT lpad(CAST(user_id AS VARCHAR), 6, '0') AS u_key, count(*) AS true_n
            FROM events GROUP BY 1)
          SELECT count(*) FILTER (WHERE m.n > t.true_n) AS overest,
                 max(t.true_n - m.n) AS max_underest
          FROM mg m JOIN t USING (u_key)""").fetchone()
        record("stream_heavy_hitters",
               r[0] == 0 and (r[1] or 0) <= bound,
               {"overestimates": int(r[0]), "max_underestimate": int(r[1] or 0),
                "bound_n_over_k": round(bound, 1), "n_total": int(n_total)})

    out_path = os.path.join(os.path.dirname(os.path.abspath(out_dir)), "AUDIT_SKETCH.json")
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "checks": report}, f, indent=1)
    print(f"\nsketch audit: {sum(1 for c in report.values() if c['ok'])} ok / "
          f"{sum(1 for c in report.values() if not c['ok'])} fail -> {out_path}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

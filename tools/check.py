#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--time]
           [--budget SEC] [--per-budget SEC] [--oracle-only]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from <verifyOutDir>/oracle_sql.json in
DuckDB over the same parquet tables, sorts columns by name and rows by
value, and reports per-query match status. Dev-only tool — the shipped
library is pure Scala/Spark.

--time        record per-oracle DuckDB seconds, print the table sorted
              by cost, and FAIL if total exceeds --budget (default 300)
              or any single oracle exceeds --per-budget (default 30).
              This is the oracle-cost gate: a checker whose DuckDB side
              blows its wall-clock budget zeroes the round even when
              every query matches (round 13's failure mode).
--oracle-only time every oracle in oracle_sql.json WITHOUT comparing
              against Spark results (use before declaring a new query,
              when Verify hasn't been run yet). Implies --time.
"""
import sys, os, json, glob, time
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    argv = sys.argv[1:]
    opts = {a for a in argv if a.startswith("--") and "=" not in a
            and a not in ("--budget", "--per-budget")}

    def flagval(name, default):
        if name in argv:
            return float(argv[argv.index(name) + 1])
        return default

    pos = [a for i, a in enumerate(argv)
           if not a.startswith("--") and (i == 0 or argv[i - 1] not in
                                          ("--budget", "--per-budget"))]
    sf_dir, out_dir = pos[0], pos[1]
    oracle_only = "--oracle-only" in opts
    timing = "--time" in opts or oracle_only
    budget = flagval("--budget", 300.0)
    per_budget = flagval("--per-budget", 30.0)
    times = {}
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # Verify writes the queries it attempted; anything attempted but
    # missing its result dir FAILED at construction time. Names absent
    # from the manifest were deliberately skipped (targeted dev run).
    mpath = os.path.join(out_dir, "attempted.txt")
    attempted = (set(open(mpath).read().split())
                 if os.path.exists(mpath) else set(oracle))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        if oracle_only:
            t0 = time.time()
            try:
                con.execute(sql).fetchdf()
                times[name] = time.time() - t0
                n_pass += 1
            except Exception as e:
                times[name] = time.time() - t0
                print(f"FAIL {name}: oracle error {type(e).__name__}: {e}")
                n_fail += 1
            continue
        if name not in attempted and not os.path.isdir(res_dir):
            continue  # targeted Verify run — only check what was dumped
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            t0 = time.time()
            want = con.execute(sql).fetchdf()
            times[name] = time.time() - t0
            want = canon(want)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        # dtype first: got.equals() requires identical dtypes, so a dtype
        # mismatch IS the failure reason even when object-level values agree
        dt_mismatch = [(c, str(got[c].dtype), str(want[c].dtype))
                       for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
        if dt_mismatch:
            print(f"FAIL {name}: dtype mismatch {dt_mismatch}")
            n_fail += 1
        elif not got.equals(want):
            # show first differing cell
            diff = None
            for c in got.columns:
                neq = got[c].astype(object) != want[c].astype(object)
                both_nan = got[c].isna() & want[c].isna()
                neq = neq & ~both_nan
                if neq.any():
                    i = neq.idxmax()
                    diff = (c, i, got[c][i], want[c][i])
                    break
            print(f"FAIL {name}: value diff {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    over = False
    if timing and times:
        total = sum(times.values())
        print("\n== oracle DuckDB seconds (worst first) ==")
        for name, sec in sorted(times.items(), key=lambda kv: -kv[1])[:25]:
            mark = "  OVER-PER-BUDGET" if sec > per_budget else ""
            print(f"{sec:8.2f}  {name}{mark}")
        print(f"{total:8.2f}  TOTAL over {len(times)} oracles "
              f"(budget {budget:.0f}s, per-query {per_budget:.0f}s)")
        worst = max(times.values())
        if total > budget:
            print(f"BUDGET FAIL: total {total:.1f}s > {budget:.0f}s")
            over = True
        if worst > per_budget:
            print(f"BUDGET FAIL: slowest oracle {worst:.1f}s > {per_budget:.0f}s")
            over = True
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if (n_fail or over) else 0)


if __name__ == "__main__":
    main()

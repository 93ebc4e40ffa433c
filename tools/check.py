#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracles in oracle_sql.json and diff.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
        # normalize int flavors
        if str(df[c].dtype) in ("int32", "uint32", "int16", "Int64", "object"):
            try:
                if str(df[c].dtype) != "object":
                    df[c] = df[c].astype("int64")
            except Exception:
                pass
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Oracle-SQL lint: bare `ceil(<decimal literal> * ...)` — DuckDB parses
    # the literal as DECIMAL and ceils exactly, while the Spark side of every
    # such site computes lit(x: Double) * n in binary doubles; whether the
    # two agree depends on a per-site half-ulp analysis nobody should have
    # to redo (the r11 winsorize red was exactly this class). Convention:
    # always ceil(CAST(x AS DOUBLE) * ...) so both engines share the IEEE
    # chain. Fails the gate on any bare site.
    import re as _re
    ceil_bare = _re.compile(r"ceil\(\s*\d+\.\d+\s*\*", _re.IGNORECASE)
    # Lint-failing oracles are EXCLUDED from the comparison loop below:
    # counting the same oracle in both lanes would let n_pass+n_fail
    # exceed the oracle count and overstate the PASS tally on a lint hit.
    lint_failed = set()
    for name, sql in sorted(oracles.items()):
        hits = ceil_bare.findall(sql)
        if hits:
            print(f"FAIL {name}: bare decimal-literal ceil in oracle SQL "
                  f"({hits[0]}...) — use ceil(CAST(x AS DOUBLE) * ...)")
            n_fail += 1
            lint_failed.add(name)
    for name, sql in sorted(oracles.items()):
        if name in lint_failed:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = norm(pd.concat([pd.read_parquet(f) for f in files]))
            duck_df = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        # dtype parity (the driver's hash lane is dtype-sensitive even when
        # values agree: DuckDB HUGEINT fetches as float64 vs Spark int64;
        # Spark DECIMAL parquet reads as object vs DuckDB float64). Fail on
        # any cross-CLASS divergence after norm, so the class dies locally.
        def dclass(dt):
            s = str(dt)
            if s.startswith("datetime"):
                return "datetime"
            if np.issubdtype(dt, np.bool_):
                return "bool"
            if np.issubdtype(dt, np.integer):
                return "int"
            if np.issubdtype(dt, np.floating):
                return "float"
            return "object"
        dbad = [f"{c}: spark={spark_df[c].dtype} duck={duck_df[c].dtype}"
                for c in spark_df.columns
                if dclass(spark_df[c].dtype) != dclass(duck_df[c].dtype)]
        if dbad:
            print(f"FAIL {name}: dtype parity {dbad[:3]}")
            n_fail += 1
            continue
        bad = []
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                af = a.astype(float).to_numpy()
                bf = b.astype(float).to_numpy()
                ok = (np.isnan(af) & np.isnan(bf)) | (af == bf)
                if not ok.all():
                    i = int(np.argmin(ok))
                    bad.append(f"{c}[{i}]: {af[i]!r} vs {bf[i]!r}")
            else:
                eq = (a.astype(str).to_numpy() == b.astype(str).to_numpy())
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad.append(f"{c}[{i}]: {a.iloc[i]!r} vs {b.iloc[i]!r}")
        if bad:
            print(f"FAIL {name}: value mismatch {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    # queries without oracles: just check rows exist
    import os
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracles:
            files = glob.glob(f"{p}/*.parquet")
            rows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWS {d}: {rows}")
    # SURVEY <-> registry sync (the RegistrySyncSpec twin for full
    # Verify runs): every dumped query dir must be named in SURVEY.md
    # section 2, so a green-but-undocumented operator fails the local
    # gate too. Only meaningful when the dump is the FULL registry
    # (VerifyOne subsets would false-flag nothing, since we only check
    # dump -> SURVEY direction).
    import re
    try:
        survey = open("SURVEY.md", encoding="utf-8").read()
        sec = survey[survey.index("## §2"):survey.index("## §3")]
        documented = set(re.findall(r"`([a-z0-9_]+)`", sec))
        dumped = {d for d in os.listdir(out_dir)
                  if os.path.isdir(os.path.join(out_dir, d))}
        undocumented = sorted(dumped - documented)
        if undocumented:
            print(f"SYNC FAIL: queries with no SURVEY §2 row: {undocumented}")
            n_fail += 1
    except (FileNotFoundError, ValueError):
        pass
    # Bench quiet-gate lint (r14): a committed bench headline taken at
    # pre_l1 >= 1 carries ambient-load weather the round-over-round
    # comparison then has to archaeologize away (the r13 nit: the
    # committed detail artifact shipped at pre_l1 = 1.48 against the
    # builder's own < 1 bar). Warn loudly — the bench is a separate
    # lane, so this does not fail the correctness gate.
    for bench_path in sorted(glob.glob("bench_detail*.json")) + sorted(
            glob.glob("BENCH_r*.json"))[-1:]:
        try:
            with open(bench_path) as fh:
                b = json.load(fh)
            pre = b.get("load", {}).get("pre_l1")
            if pre is not None and pre >= 1.0:
                print(f"WARN {bench_path}: pre_l1 = {pre} >= 1 — headline "
                      f"taken on a loud machine; retake under the quiet gate")
        except Exception:
            pass
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

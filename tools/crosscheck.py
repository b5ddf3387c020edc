#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only — the shipped
library is pure Scala/Spark; this script exists to catch oracle drift before
the driver does).

Usage: python3 tools/crosscheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against <sfDir>/*.parquet, sorts
columns by name, canonicalizes values, and reports match/mismatch per query.
"""
import json, os, sys, glob, math
import duckdb
import numpy as np
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            # width-normalize only (float32 parquet vs float64 duckdb); a
            # float-vs-INT mismatch is deliberately NOT healed here — the
            # driver's hash distinguishes 1.0 from 1, so we must too.
            df[c] = df[c].astype("float64")
    # Sort on a rounded view so near-equal floats land in the same order in
    # both frames, but keep full-precision values for the isclose compare.
    key = df.copy()
    for c in key.columns:
        if pd.api.types.is_float_dtype(key[c]):
            key[c] = key[c].round(6)
    order = key.sort_values(by=list(key.columns)).index
    return df.loc[order].reset_index(drop=True)

def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    """Column-wise equality: floats via isclose (round-then-equals flakes on
    values straddling a rounding boundary), everything else exact."""
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            if not np.allclose(a[c], b[c], rtol=1e-9, atol=1e-12, equal_nan=True):
                return False
        else:
            neq = (a[c] != b[c]) & ~(a[c].isna() & b[c].isna())
            if neq.any():
                return False
    return True

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].replace(".parquet", "")
        # driver testdata is one file per table; Spark-synthesized dirs
        # (graft.ScaleUp's sf1) are part-file directories — glob those
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        pdir = f"{out_dir}/{name}"
        try:
            marker = f"{pdir}/_FAILED"
            if glob.glob(marker):
                msg = open(marker).read().strip().splitlines()[:1]
                print(f"FAIL {name}: spark query FAILED: {msg[0][:160] if msg else ''}")
                n_bad += 1; continue
            spark_df = canon(pd.concat([pd.read_parquet(f) for f in
                                        sorted(glob.glob(f"{pdir}/*.parquet"))]))
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_bad += 1; continue
        try:
            duck_df = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_bad += 1; continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_bad += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}"); n_bad += 1; continue
        # Dtype-strict after canonicalization: the driver hashes typed values,
        # so e.g. a DuckDB HUGEINT (-> pandas float64) vs Spark BIGINT (int64)
        # fails its hash even when every value is numerically identical
        # (the w3_sessionize round-3 red row). Mirror that strictness here.
        dt_bad = [f"{c}: spark={spark_df[c].dtype} duck={duck_df[c].dtype}"
                  for c in spark_df.columns
                  if spark_df[c].dtype != duck_df[c].dtype]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch after canon ({'; '.join(dt_bad)})")
            n_bad += 1; continue
        if not frames_equal(spark_df, duck_df):
            neq = (spark_df != duck_df) & ~(spark_df.isna() & duck_df.isna())
            bad_cols = [c for c in spark_df.columns if neq[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                i = neq[c].idxmax()
                print(f"   row {i} col {c}: spark={spark_df[c][i]!r} duck={duck_df[c][i]!r}")
            n_bad += 1; continue
        print(f"ok   {name} ({len(spark_df)} rows)"); n_ok += 1
    # Deliberately oracle-less queries (sketch family): report the Verify-
    # emitted rationale so the artifact is self-explaining, and fail loudly
    # if a new oracle-less query slipped in WITHOUT a documented rationale.
    rat_path = f"{out_dir}/no_oracle_rationale.json"
    rationale = json.load(open(rat_path)) if os.path.exists(rat_path) else {}
    produced = {os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                if os.path.isdir(d)}
    for name in sorted(produced - set(oracle)):
        # a crashed query must not hide behind its documented skip: Verify
        # writes _FAILED into the output dir on any exception
        if os.path.exists(f"{out_dir}/{name}/_FAILED"):
            msg = open(f"{out_dir}/{name}/_FAILED").read().strip().splitlines()[:1]
            print(f"FAIL {name}: spark query FAILED: {msg[0][:160] if msg else ''}")
            n_bad += 1
            continue
        why = rationale.get(name)
        if why:
            print(f"skip {name}: no_oracle — {why}")
        else:
            print(f"FAIL {name}: no oracle SQL and no documented rationale")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

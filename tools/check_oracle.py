#!/usr/bin/env python3
"""Local dev harness mirroring the driver's DuckDB-oracle compare.

NOT part of the engine (the Scala library has zero Python deps) — this
only pre-validates oracleSql parity before the driver's official
CORRECTNESS_r{N}.json run.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

def _kind(series):
    """The driver hashes pandas-rendered values, so its effective type
    equivalence is the pandas dtype KIND after conversion: int32==int64
    (both render '3'), double==DECIMAL(p,s>0) (both arrive float64), but
    a HUGEINT/DECIMAL(38,0) oracle column arrives float64 and renders
    '130.0' against Spark's int64 '130' — a hash mismatch the old
    value-compare (130 == 130.0) could not see. Empirically calibrated
    against CORRECTNESS_r10: q09/q110/q275 int-width diffs and q121's
    decimal(7,6) passed the driver; q278's HUGEINT failed it."""
    k = series.dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return "timestamp"
    return k

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    n_skip = 0
    for qname in sorted(oracle):
        if not os.path.isdir(f"{out_dir}/{qname}"):
            n_skip += 1  # subset Verify run — query not requested
            continue
        files = glob.glob(f"{out_dir}/{qname}/*.parquet")
        if not files:
            print(f"FAIL {qname}: no spark output"); continue
        spark_df = pq.read_table(files[0]).to_pandas()
        try:
            duck_df = con.execute(oracle[qname]).fetchdf()
        except Exception as e:
            print(f"FAIL {qname}: duckdb error: {e}"); continue
        # driver semantics: sort columns by name, then compare values
        spark_df = spark_df[sorted(spark_df.columns)]
        duck_df = duck_df[sorted(duck_df.columns)]
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {qname}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            continue
        # type gate: the driver's hash is render-sensitive; a value-equal
        # HUGEINT/DECIMAL(38,0) oracle column (float64 in pandas) still
        # hash-mismatches Spark's int64.
        type_bad = None
        for c in spark_df.columns:
            st, dt = _kind(spark_df[c]), _kind(duck_df[c])
            if st != dt:
                type_bad = (c, st, dt)
                break
        if type_bad:
            c, st, dt = type_bad
            print(f"FAIL {qname}: TYPE col={c} spark={st} duck={dt}")
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {qname}: rows spark={len(spark_df)} duck={len(duck_df)}")
            continue
        mismatch = None
        for c in spark_df.columns:
            sv, dv = spark_df[c].tolist(), duck_df[c].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if a != b and not (a is None and b is None):
                    try:
                        if a == b or (a != a and b != b):  # nan==nan
                            continue
                    except Exception:
                        pass
                    mismatch = (c, i, a, b)
                    break
            if mismatch: break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {qname}: col={c} row={i} spark={a!r} duck={b!r}")
        else:
            n_ok += 1
            print(f"ok   {qname} ({len(spark_df)} rows)")
    checked = len(oracle) - n_skip
    skipnote = f" ({n_skip} not in this Verify subset)" if n_skip else ""
    print(f"== {n_ok}/{checked} queries match =={skipnote}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

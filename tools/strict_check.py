#!/usr/bin/env python3
"""Strict mimic of the driver's hash-based correctness gate.

Usage: python3 tools/strict_check.py <sfDir> <verifyOutDir> [query ...]

Unlike local_check.py (tolerant float compare), this reproduces what the
driver appears to do per CORRECTNESS_r01.json + its pandas traceback:
read ALL parquet part files of the Spark output, read the DuckDB oracle
result, sort columns by name, sort rows by all columns (pandas
sort_values), then require EXACT cell equality (repr-level). Reports the
first differing cell with both reprs + dtypes so the fix is obvious.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import pyarrow.parquet as pq


def load_spark(res_dir):
    files = sorted(glob.glob(os.path.join(res_dir, "*.parquet")))
    if not files:
        return None
    import pyarrow as pa
    return pa.concat_tables([pq.read_table(f) for f in files])


def type_problems(name, st, dt):
    """Round-1 driver evidence: decimal128 output columns hash-mismatch, list
    columns crash the driver's sort. Flag them plus any arrow type diff."""
    probs = []
    for c in sorted(st.column_names):
        a, b = st.schema.field(c).type, dt.schema.field(c).type
        if str(a) != str(b):
            probs.append(f"type diff {c}: spark={a} duck={b}")
        for side, t in (("spark", a), ("duck", b)):
            s = str(t)
            if s.startswith("decimal") or s.startswith("list") or s.startswith("large_list"):
                probs.append(f"unsafe output type {c} ({side}): {t}")
    return probs


def canon(df):
    df = df[sorted(df.columns)]
    try:
        df = df.sort_values(by=list(df.columns))
    except TypeError:
        df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        # Spark-written tables are DIRECTORIES of part files (the MakeScale
        # sf1 layout); driver-written testdata is a single file
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        stbl = load_spark(os.path.join(out_dir, name))
        if stbl is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            dtbl = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sdf, ddf = stbl.to_pandas(), dtbl.to_pandas()
        if sorted(stbl.column_names) == sorted(dtbl.column_names):
            probs = type_problems(name, stbl, dtbl)
            if probs:
                print(f"FAIL {name}: " + "; ".join(probs))
                n_fail += 1
                continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"FAIL {name}: cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
            n_fail += 1
            continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows {len(sdf)} vs {len(ddf)}")
            n_fail += 1
            continue
        try:
            s, d = canon(sdf), canon(ddf)
        except Exception as e:
            print(f"FAIL {name}: sort error (driver would crash too): {e}")
            n_fail += 1
            continue
        bad = None
        for c in s.columns:
            sv, dv = s[c].tolist(), d[c].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                ra, rb = repr(a), repr(b)
                if ra != rb and not (a != a and b != b):  # NaN==NaN ok
                    bad = (c, i, ra, type(a).__name__, str(s[c].dtype),
                           rb, type(b).__name__, str(d[c].dtype))
                    break
            if bad:
                break
        if bad:
            c, i, ra, ta, dta, rb, tb, dtb = bad
            print(f"FAIL {name}: col={c} row={i}")
            print(f"  spark={ra} ({ta}, dtype={dta})")
            print(f"  duck ={rb} ({tb}, dtype={dtb})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/local_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dir (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB with the sf
tables registered as views, sorts columns by name + rows, and compares
values cell-by-cell (exact; floats via repr equality then 1e-9 rel tol).
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq


def norm_cell(v):
    # pyarrow/duckdb scalar → comparable python value
    if hasattr(v, "as_py"):
        v = v.as_py()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def cells_equal(a, b):
    a, b = norm_cell(a), norm_cell(b)
    if a == b:
        return True
    try:
        fa, fb = float(a), float(b)
        if math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-12):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, list) and isinstance(b, list) and len(a) == len(b):
        return all(cells_equal(x, y) for x, y in zip(a, b))
    return False


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        # Spark-written tables are DIRECTORIES of part files (the MakeScale
        # sf1 layout); driver-written testdata is a single file
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        res_dir = os.path.join(out_dir, name)
        files = sorted(glob.glob(os.path.join(res_dir, "*.parquet")))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        import pyarrow as pa
        tbl = pa.concat_tables([pq.read_table(f) for f in files])
        spark_cols = sorted(tbl.column_names)
        spark_rows = [
            tuple(norm_cell(tbl.column(c)[i]) for c in spark_cols)
            for i in range(tbl.num_rows)
        ]
        try:
            duck = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        duck_cols = sorted(duck.column_names)
        duck_rows = [
            tuple(norm_cell(duck.column(c)[i]) for c in duck_cols)
            for i in range(duck.num_rows)
        ]
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns {spark_cols} vs {duck_cols}")
            n_fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rowcount {len(spark_rows)} vs {len(duck_rows)}")
            n_fail += 1
            continue
        key = lambda r: tuple(str(x) for x in r)
        bad = None
        for i, (a, b) in enumerate(zip(sorted(spark_rows, key=key),
                                       sorted(duck_rows, key=key))):
            if not all(cells_equal(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

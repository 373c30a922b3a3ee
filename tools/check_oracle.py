#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs oracleSql, mimicking the
driver's DuckDB compare: for each query, load the Verify-dumped parquet and
run the oracle SQL in DuckDB over the same testdata tables; compare row
count, column names (sorted), and cell values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_df()
            duck_df = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns {s_cols} != {d_cols}")
            n_fail += 1
            continue
        # The driver's hash is dtype-sensitive (float64 vs int64 fails it
        # even when Python == passes), so enforce dtype equality here too.
        # int32 vs int64 is the one tolerated divergence (Spark row_number
        # is int32, DuckDB's is int64; the driver accepts it).
        INT = {"int32", "int64"}
        dtype_bad = [
            (c, str(spark_df[c].dtype), str(duck_df[c].dtype))
            for c in s_cols
            if str(spark_df[c].dtype) != str(duck_df[c].dtype)
            and not (str(spark_df[c].dtype) in INT and str(duck_df[c].dtype) in INT)]
        if dtype_bad:
            print(f"FAIL {name}: dtype mismatch {dtype_bad}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} != {len(duck_df)}")
            n_fail += 1
            continue
        s = spark_df[s_cols]
        d = duck_df[d_cols]
        mismatch = None
        for c in s_cols:
            sv = [norm(v) for v in s[c].tolist()]
            dv = [norm(v) for v in d[c].tolist()]
            if sv != dv:
                for i, (a, b) in enumerate(zip(sv, dv)):
                    if a != b:
                        mismatch = (c, i, a, b)
                        break
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} duck={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql vs Verify.scala output.

Replicates the driver's compare loop: for each query, read the Spark
result parquet (written by `sbt "runMain graft.Verify <sfDir> <outDir>"`)
and run the oracle SQL in DuckDB over views of the same sf parquet
tables; sort columns by name, sort rows, compare values.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

import decimal

def norm(v):
    # EXACT compare: the driver hashes values, so doubles must be
    # bit-identical between Spark and DuckDB, and TYPES must agree
    # (DuckDB sum(int) -> HUGEINT -> decimal128/float64 driver-side
    # hash-mismatches Spark int64 even when values are equal).
    if v is None: return None
    if isinstance(v, bool): return ("b", v)
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v.hex()
    if isinstance(v, decimal.Decimal): return ("dec", str(v))
    if isinstance(v, bytes): return v.hex()
    if isinstance(v, list): return tuple(norm(x) for x in v)
    return v

def rows_of(names, cols):
    # sort columns by name, then rows lexicographically
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = list(zip(*[cols[i] for i in order])) if cols else []
    rows = [tuple(norm(v) for v in r) for r in rows]
    return sorted(rows, key=lambda r: tuple((v is None, str(v)) for v in r)), [names[i] for i in order]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d): continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "EMPTY_SPARK_OUTPUT"; continue
        st = pq.read_table(files)
        s_rows, s_names = rows_of(st.column_names,
                                  [st.column(i).to_pylist() for i in range(st.num_columns)])
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(s_rows)}"; continue
        try:
            # .arrow() preserves DuckDB's real output types (HUGEINT ->
            # decimal128 etc.), replicating the driver's hash compare.
            ot = con.execute(oracle[name]).arrow()
            o_names = ot.column_names
        except Exception as e:
            results[name] = f"ORACLE_ERROR {e}"; continue
        o_cols = [ot.column(i).to_pylist() for i in range(ot.num_columns)]
        o_rows, o_names_sorted = rows_of(o_names, o_cols)
        if s_names != o_names_sorted:
            results[name] = f"SCHEMA_MISMATCH spark={s_names} oracle={o_names_sorted}"
        elif len(s_rows) != len(o_rows):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(s_rows)} oracle={len(o_rows)}"
        elif s_rows != o_rows:
            diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            results[name] = f"VALUE_MISMATCH first_diffs={diffs}"
        else:
            results[name] = f"OK rows={len(s_rows)}"
    bad = 0
    for k, v in sorted(results.items()):
        flag = "  " if v.startswith(("OK", "ROWS_ONLY")) else "!!"
        if flag == "!!": bad += 1
        print(f"{flag} {k}: {v}")
    print(f"\n{len(results)-bad}/{len(results)} clean")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

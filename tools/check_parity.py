#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares
each query's parquet dump against its DuckDB oracle — columns sorted by
name, values compared in row order.

Usage: python3 tools/check_parity.py <sfDir> <outDir>
"""
import sys, json, math, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); failures += 1; continue
        sdf = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: columns {scols} vs oracle {ocols}"); failures += 1; continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows {len(sdf)} vs oracle {len(odf)}"); failures += 1; continue
        o = odf[ocols].values.tolist(); s = sdf[scols].values.tolist()
        bad = None
        for i, (orow, srow) in enumerate(zip(o, s)):
            no = [norm(x) for x in orow]; ns = [norm(x) for x in srow]
            # pandas may surface ints as numpy types; compare stringified after norm
            if [str(x) for x in no] != [str(x) for x in ns]:
                bad = (i, no, ns); break
        if bad:
            print(f"FAIL {name}: row {bad[0]} oracle={bad[1]} spark={bad[2]}"); failures += 1
        else:
            print(f"OK   {name}: {len(sdf)} rows x {len(scols)} cols")
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

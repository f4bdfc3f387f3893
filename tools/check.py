#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify's parquet
outputs + oracle_sql.json, run each oracle in DuckDB over the same
parquet tables, and compare (rows / schema / value-hash with columns
sorted by name, rows sorted by all columns). Dev tool only — the
shipped engine is the Scala code under src/.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [q1,q2,...]

The optional third argument restricts the gate to a comma-separated
query subset — used by the large-SF scale audit, where a handful of
oracles (brute-force pair joins, deep recursive CTEs) are intractable
in DuckDB and are gated at the smaller SFs instead.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
seen = set()
for qdir in sorted(glob.glob(f"{outdir}/q*")):
    name = os.path.basename(qdir)
    if only is not None and name not in only:
        continue
    seen.add(name)
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        print(f"{name}: NO OUTPUT")
        fails += 1
        continue
    spark_df = pq.read_table(files[0]).to_pandas()
    if name not in oracles:
        print(f"{name}: rows-only ({len(spark_df)} rows)" +
              (" EMPTY!" if len(spark_df) == 0 else ""))
        continue
    try:
        oracle_df = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        print(f"{name}: COLUMN MISMATCH spark={list(a.columns)} oracle={list(b.columns)}")
        fails += 1
        continue
    if len(a) != len(b):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}")
        fails += 1
        continue
    # dtype comparison (loose: compare kind + itemsize via pyarrow-ish str)
    dta, dtb = [str(t) for t in a.dtypes], [str(t) for t in b.dtypes]
    if dta != dtb:
        print(f"{name}: DTYPE note spark={dta} oracle={dtb}")
    try:
        eq = a.equals(b)
        if not eq:
            # elementwise with float tolerance-free compare
            diff = (a != b) & ~(a.isna() & b.isna())
            ndiff = int(diff.to_numpy().sum())
            if ndiff:
                print(f"{name}: VALUE MISMATCH ({ndiff} cells)")
                mask = diff.any(axis=1)
                print(pd.concat([a[mask].head(3).add_suffix('_spark'),
                                 b[mask].head(3).add_suffix('_oracle')], axis=1))
                fails += 1
                continue
    except Exception as e:
        print(f"{name}: COMPARE ERROR {e}")
        fails += 1
        continue
    print(f"{name}: OK ({len(a)} rows)")
# a typo'd subset name (or a query that produced no output dir) must
# not silently pass the gate
if only is not None:
    for missing in sorted(only - seen):
        print(f"{missing}: SUBSET NAME NEVER SEEN (typo or missing output)")
        fails += 1
print(f"\n{'FAIL' if fails else 'PASS'} ({fails} failures)")
sys.exit(1 if fails else 0)

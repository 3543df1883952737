#!/usr/bin/env python3
# Local replica of the driver oracle check: runs each SparkEntry.oracleSql in
# DuckDB over the raw parquet tables and bit-compares against the Verify
# parquet dumps. Usage: python3 tools/check_oracle.py [sfDir]  (after running
# graft.Verify <sfDir> <outDir>)
import duckdb, json, glob, sys, os
import pyarrow.parquet as pq
con = duckdb.connect()
sf=sys.argv[1] if len(sys.argv)>1 else '/root/testdata/sf0.01'
out=sys.argv[2] if len(sys.argv)>2 else '/tmp/verify_out'
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
errs_path = f'{out}/errors.json'
if os.path.exists(errs_path):
    errs = json.load(open(errs_path))
    if errs:
        print(f'!! {len(errs)} queries FAILED during Verify:', ', '.join(errs))
fails=[]
for name in sorted(oracle):
    sql = oracle[name]
    try:
        files = glob.glob(f'{out}/{name}/*.parquet')
        if not files: print(name, 'NO OUTPUT'); fails.append(name); continue
        got = pq.read_table(files[0]).to_pandas()
        exp = con.execute(sql).fetchdf()
        got = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
        exp = exp[sorted(exp.columns)].sort_values(by=sorted(exp.columns)).reset_index(drop=True)
        if got.shape != exp.shape:
            print(name, 'SHAPE', got.shape, exp.shape); fails.append(name); continue
        bad = [c for c in got.columns if not (got[c].isna().equals(exp[c].isna()) and (got[c].fillna(0).values == exp[c].fillna(0).values).all())]
        if bad:
            print(name, 'DIFF cols', bad); fails.append(name)
        else:
            print(name, 'OK rows=%d' % len(got))
    except Exception as e:
        print(name, 'ORACLE ERROR', str(e).split(chr(10))[0][:200]); fails.append(name)
print('FAILS:', fails if fails else 'none')

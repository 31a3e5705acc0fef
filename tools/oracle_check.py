import duckdb, json, sys, glob
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
oracles = json.load(open(f'{outdir}/oracle_sql.json'))
npass = nfail = 0

def frames_equal(gs, es):
    """Column-wise compare: exact for ints/strings, exact-with-NaN-identity
    for floats (NaN=='nan' string tricks and cross-engine float formatting
    differences both avoided)."""
    for c in gs.columns:
        a, b = gs[c], es[c]
        # float path ONLY when both sides are float: casting an int64 side
        # to float64 would lose bits above 2^53 and mask real mismatches
        if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
            av, bv = a.values, b.values
            if not bool(((av == bv) | (np.isnan(av) & np.isnan(bv))).all()):
                return False
        else:
            if not a.astype(str).equals(b.astype(str)):
                return False
    return True

for name, sql in sorted(oracles.items()):
    files = sorted(glob.glob(f'{outdir}/{name}/*.parquet'))
    if not files:
        print(f'{name}: NO SPARK OUTPUT'); nfail += 1; continue
    got = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f'{name}: ORACLE SQL ERROR {e}'); nfail += 1; continue
    # driver-style compare: sort columns by name, sort rows, compare values
    gs = got.reindex(sorted(got.columns), axis=1)
    es = exp.reindex(sorted(exp.columns), axis=1)
    if list(gs.columns) != list(es.columns):
        print(f'{name}: SCHEMA MISMATCH spark={list(gs.columns)} duck={list(es.columns)}'); nfail += 1; continue
    if len(gs) != len(es):
        print(f'{name}: ROWCOUNT MISMATCH spark={len(gs)} duck={len(es)}'); nfail += 1; continue
    gs = gs.sort_values(by=list(gs.columns)).reset_index(drop=True)
    es = es.sort_values(by=list(es.columns)).reset_index(drop=True)
    try:
        eq = frames_equal(gs, es)
    except Exception:
        eq = False
    if eq: npass += 1; print(f'{name}: PASS ({len(gs)} rows)')
    else:
        nfail += 1
        diff = (gs.astype(str) != es.astype(str)).any(axis=1)
        print(f'{name}: VALUE MISMATCH ({diff.sum()}/{len(gs)} rows differ)')
        print('  spark:', gs[diff].head(2).to_dict('records'))
        print('  duck :', es[diff].head(2).to_dict('records'))
print(f'== {npass} pass / {nfail} fail ==')

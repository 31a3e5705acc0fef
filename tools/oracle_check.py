import duckdb, json, sys, glob
import pyarrow.parquet as pq

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
oracles = json.load(open(f'{outdir}/oracle_sql.json'))
npass = nfail = 0
for name, sql in sorted(oracles.items()):
    files = glob.glob(f'{outdir}/{name}/*.parquet')
    if not files:
        print(f'{name}: NO SPARK OUTPUT'); nfail += 1; continue
    got = pq.read_table(files[0]).to_pandas()
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
        import pandas as pd
        eq = gs.astype(str).equals(es.astype(str))
    except Exception as e:
        eq = False
    if eq: npass += 1; print(f'{name}: PASS ({len(gs)} rows)')
    else:
        nfail += 1
        diff = (gs.astype(str) != es.astype(str)).any(axis=1)
        print(f'{name}: VALUE MISMATCH ({diff.sum()}/{len(gs)} rows differ)')
        print('  spark:', gs[diff].head(2).to_dict('records'))
        print('  duck :', es[diff].head(2).to_dict('records'))
print(f'== {npass} pass / {nfail} fail ==')

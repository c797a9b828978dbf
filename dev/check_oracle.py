import duckdb, json, glob, sys, hashlib
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f'{out}/oracle_sql.json'))
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).fetchdf()
        files = glob.glob(f'{out}/{name}/*.parquet')
        sdf = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        # normalize: sort columns by name, sort rows by all columns
        odf = odf[sorted(odf.columns)]
        sdf = sdf[sorted(sdf.columns)]
        if list(odf.columns) != list(sdf.columns):
            print(f"{name}: SCHEMA MISMATCH oracle={list(odf.columns)} spark={list(sdf.columns)}")
            continue
        odf = odf.sort_values(by=list(odf.columns)).reset_index(drop=True)
        sdf = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True)
        if len(odf) != len(sdf):
            print(f"{name}: ROWCOUNT MISMATCH oracle={len(odf)} spark={len(sdf)}")
            continue
        ho = hashlib.md5(odf.to_csv(index=False).encode()).hexdigest()
        hs = hashlib.md5(sdf.to_csv(index=False).encode()).hexdigest()
        if ho == hs:
            print(f"{name}: OK ({len(odf)} rows)")
        else:
            print(f"{name}: VALUE MISMATCH ({len(odf)} rows)")
            import pandas as pd
            diff = (odf != sdf)
            for c in odf.columns:
                if diff[c].any():
                    i = diff[c].idxmax()
                    print(f"   col {c}: oracle={odf[c][i]!r} spark={sdf[c][i]!r} (row {i}, dtype o={odf[c].dtype} s={sdf[c].dtype})")
    except Exception as e:
        print(f"{name}: ERROR {e}")

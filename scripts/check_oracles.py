# Local pre-validation of the driver's correctness gate: run every
# SparkEntry.oracleSql entry in DuckDB over the same parquet tables and
# diff against the Verify output parquet (columns sorted by name, rows
# sorted, numeric tolerance). Usage:
#   python3 scripts/check_oracles.py /root/testdata/sf0.001 /tmp/vout_r5
import sys, os, json, glob
import duckdb, pyarrow.parquet as pq

sf_dir, vout = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(vout, "oracle_sql.json")))
fail, no_oracle = [], []
for q in sorted(os.listdir(vout)):
    qdir = os.path.join(vout, q)
    if not os.path.isdir(qdir):
        continue
    got = pq.read_table(qdir).to_pandas()
    if q not in oracle:
        no_oracle.append(q)
        print(f"{q:24s} no_oracle rows={len(got)}")
        continue
    try:
        want = con.sql(oracle[q]).df()
    except Exception as e:
        fail.append(q); print(f"{q:24s} ORACLE SQL ERROR: {e}"); continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        fail.append(q); print(f"{q:24s} SCHEMA MISMATCH spark={gc} duck={wc}"); continue
    if len(got) != len(want):
        fail.append(q); print(f"{q:24s} ROWS {len(got)} vs {len(want)}"); continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    w = want[wc].sort_values(wc).reset_index(drop=True)
    ok = True
    for c in gc:
        gv, wv = g[c], w[c]
        try:
            import pandas as pd
            if gv.dtype.kind in "fc" or wv.dtype.kind in "fc":
                import numpy as np
                a = gv.astype(float).to_numpy(); b = wv.astype(float).to_numpy()
                if not np.allclose(a, b, rtol=1e-9, atol=1e-9, equal_nan=True):
                    ok = False; break
            else:
                if not (gv.astype(str).values == wv.astype(str).values).all():
                    ok = False; break
        except Exception as e:
            ok = False; break
    if ok:
        print(f"{q:24s} OK rows={len(got)}")
    else:
        fail.append(q); print(f"{q:24s} VALUE MISMATCH col={c}")
print(f"\n{len(fail)} failures, {len(no_oracle)} no_oracle")
sys.exit(1 if fail else 0)

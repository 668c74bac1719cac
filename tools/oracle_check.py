import duckdb, json, glob, os, sys
d = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
con = duckdb.connect()
for p in glob.glob(f"{d}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
oracle = json.load(open(f"{out}/oracle_sql.json"))
def canon(rel):
    df = rel.df()
    df = df[sorted(df.columns)]
    vals = df.astype(str).values.tolist()
    vals.sort()
    return sorted(df.columns), vals
for name in sorted(os.listdir(out)):
    if not os.path.isdir(f"{out}/{name}"): continue
    spark = con.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
    if name not in oracle:
        print(f"{name}: rows={len(spark.df())} (no oracle — rows-only)")
        continue
    ora = con.sql(oracle[name])
    sc, sv = canon(spark); oc, ov = canon(ora)
    if sc != oc:
        print(f"{name}: SCHEMA MISMATCH spark={sc} oracle={oc}")
    elif len(sv) != len(ov):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(sv)} oracle={len(ov)}")
    elif sv != ov:
        bad = [(a, b) for a, b in zip(sv, ov) if a != b][:3]
        print(f"{name}: VALUE MISMATCH rows={len(sv)} first_diffs={bad}")
    else:
        print(f"{name}: values=OK rows={len(sv)}")

#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py /tmp/verify_r2 /root/testdata/sf0.01

For each <name>/ parquet dir in outDir, runs oracle_sql.json[name] in DuckDB
(with each sf table registered as a view) and compares: row count, column
names (sorted), and values (columns sorted by name, rows sorted by repr).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize numeric types for comparison
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
    rows = sorted(df.itertuples(index=False, name=None), key=repr)
    return pd.DataFrame(rows, columns=df.columns)

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dataset dir (GenScale sf1 corpus)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"MISS  {name}: no parquet output"); n_fail += 1; continue
        got = pd.read_parquet(files[0]) if len(files) == 1 else pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracles:
            print(f"SKIP  {name}: no oracle ({len(got)} rows)"); continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"ERR   {name}: oracle SQL failed: {e}"); n_fail += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} vs oracle {list(e.columns)}"); n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} vs oracle {len(e)}"); n_fail += 1; continue
        try:
            # Driver-strict (VERDICT r3 #2, third listing): dtypes must match
            # and values must be exact — both engines are built to produce
            # bit-identical results (integer-cents sums, portable hashing),
            # so any inexactness here is a real bug the driver would flag.
            pd.testing.assert_frame_equal(g.reset_index(drop=True), e.reset_index(drop=True),
                                          check_dtype=True, check_exact=True)
            print(f"PASS  {name} ({len(g)} rows)"); n_pass += 1
        except AssertionError as ex:
            msg = str(ex).splitlines()
            print(f"FAIL  {name}: {msg[0]} | {' '.join(msg[1:4])}"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

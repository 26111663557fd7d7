#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate: run each
oracle SQL in DuckDB over the sf parquet tables, compare (schema-insensitive:
columns sorted by name, rows sorted) against the Verify.scala parquet dumps.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    # Dataframe-based on purpose: the driver compares pandas dataframes, so
    # DuckDB's HUGEINT surfaces as float64 here exactly as it does there
    # ("1000.0" vs "1000"). fetchall() would mask that class of oracle typing
    # bug (HUGEINT -> Python int -> str identical to Spark's int64).
    df = df[sorted(df.columns)]
    out = []
    for r in df.itertuples(index=False):
        rr = []
        for v in r:
            if isinstance(v, float):
                v = round(v, 9)
            rr.append(str(v))
        out.append("|".join(rr))
    return sorted(out)

fail = ok = 0
for name in sorted(oracle):
    res_dir = f"{outdir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"MISSING  {name} (no verify output)"); fail += 1; continue
    try:
        try:
            gdf = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'").df()
            wdf = con.execute(oracle[name]).df()
        except duckdb.OutOfMemoryException:
            # Transient host-memory pressure surfaces as tiny-block
            # allocation failures ("Failed to allocate block of 16384
            # bytes") on queries that pass standalone — the bench-drift
            # lesson applied to this gate: retry ONCE on a fresh
            # connection before reporting, so a flake adjudicates itself
            # instead of burning a round-trip. A real memory blow-up
            # fails identically twice.
            con2 = duckdb.connect()
            for t in ["region","nation","customer","supplier","part","orders",
                      "lineitem","events","documents","embeddings"]:
                con2.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
            gdf = con2.execute(f"SELECT * FROM '{res_dir}/*.parquet'").df()
            wdf = con2.execute(oracle[name]).df()
            print(f"RETRY-OK {name}: transient DuckDB allocation failure, "
                  f"clean on a fresh connection")
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1; continue
    if sorted(gdf.columns) != sorted(wdf.columns):
        print(f"SCHEMA   {name}: got {sorted(gdf.columns)} want {sorted(wdf.columns)}"); fail += 1; continue
    cg, cw = canon(gdf), canon(wdf)
    if cg == cw:
        print(f"OK       {name} ({len(cg)} rows)"); ok += 1
    else:
        print(f"MISMATCH {name}: {len(cg)} vs {len(cw)} rows")
        gs, ws = set(cg), set(cw)
        for x in list(gs - ws)[:3]: print(f"  spark-only: {x}")
        for x in list(ws - gs)[:3]: print(f"  oracle-only: {x}")
        fail += 1

# rows-only queries (no oracle)
for d in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name in oracle: continue
    try:
        n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
        print(f"{'ROWS-OK ' if n > 0 else 'EMPTY!  '} {name} ({n} rows)")
        if n == 0: fail += 1
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1
print(f"\n{ok} oracle-ok, {fail} problems")
sys.exit(1 if fail else 0)

#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB against the
same sf parquet tables, loads the Spark result parquet, and compares
(schema-by-sorted-column-name, row-sorted, exact value compare with float
diff reporting). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    con = duckdb.connect()
    return con.execute(
        "SELECT * FROM read_parquet([" + ",".join(f"'{f}'" for f in files) + "])"
    ).fetchdf()

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        if "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def compare(name, sp, du):
    if sorted(sp.columns) != sorted(du.columns):
        return f"SCHEMA: spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    for c in sp.columns:
        a, b = str(sp[c].dtype), str(du[c].dtype)
        if a != b and not (a == "object" and b == "object"):
            ints = ("int32", "int64")
            if a in ints and b in ints:
                continue
            print(f"  [dtype] {name}.{c}: spark={a} duck={b}")
    if len(sp) != len(du):
        return f"ROWS: spark={len(sp)} duck={len(du)}"
    sp, du = norm(sp), norm(du)
    for c in sp.columns:
        a, b = sp[c], du[c]
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
            af = a.astype(float).to_numpy(); bf = b.astype(float).to_numpy()
            both_nan = np.isnan(af) & np.isnan(bf)
            exact = (af == bf) | both_nan
            if not exact.all():
                d = np.nanmax(np.abs(af - bf))
                return f"FLOATDIFF col={c} maxabs={d:.3e} nbad={int((~exact).sum())}"
        else:
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                i = int(np.argmax(~eq.to_numpy()))
                return f"VALUEDIFF col={c} row{i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r}"
    return None

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # Iterate the oracle key set UNION existing output dirs — iterating only
    # dirs lets a query that errored before writing anything vanish from the
    # report instead of counting as a failure (how r3/r4 hid 16 red queries).
    dirs = {os.path.basename(p) for p in glob.glob(f"{outdir}/*") if os.path.isdir(p)}
    names = sorted(dirs | set(oracle))
    npass = nfail = 0
    for name in names:
        # A _FAILED marker (written by Verify on exception/timeout) is a hard
        # fail even if a cancelled straggler committed parquet afterwards.
        if os.path.exists(f"{outdir}/{name}/_FAILED"):
            msg = open(f"{outdir}/{name}/_FAILED").read().strip()
            print(f"FAIL   {name}: _FAILED marker: {msg}"); nfail += 1; continue
        sp = load_spark(outdir, name)
        if sp is None:
            print(f"MISS   {name}: no spark output"); nfail += 1; continue
        if name not in oracle:
            print(f"NOORA  {name}: rows={len(sp)} (rows-only check)")
            npass += 1
            continue
        try:
            du = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"SQLERR {name}: {e}"); nfail += 1; continue
        err = compare(name, sp, du)
        if err:
            print(f"FAIL   {name}: {err}"); nfail += 1
        else:
            print(f"PASS   {name}: {len(sp)} rows"); npass += 1
    print(f"== {npass} pass / {nfail} fail ==")
    return 1 if nfail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

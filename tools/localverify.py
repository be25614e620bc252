#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/localverify.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>'s parquet tables, and
compares after canonical ordering (columns sorted by name, rows sorted by all
columns). Reports exact and approx (1e-9 isclose) verdicts per query.
"""
import sys, json, os, glob
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns, strings to object
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def kind(s: pd.Series) -> str:
    """Dtype kind as the driver's hash sees it: int vs float vs bool vs
    object. DuckDB sum(BIGINT) returns HUGEINT -> pandas float64/object,
    which hash-mismatches Spark's int64 even when every value is equal
    (the r03 q89/q90/q115/q120 regression class) — so a kind difference
    is a FAIL here even if the values compare equal as floats."""
    k = s.dtype.kind
    return {"i": "int", "u": "int", "f": "float", "b": "bool",
            "M": "ts", "O": "obj"}.get(k, k)

def compare(name, sdf, odf):
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"FAIL cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return f"FAIL rows spark={len(sdf)} oracle={len(odf)}"
    dk = [(c, kind(sdf[c]), kind(odf[c])) for c in sorted(sdf.columns)
          if kind(sdf[c]) != kind(odf[c])]
    if dk:
        return f"FAIL dtype {dk}"
    sdf, odf = canon(sdf), canon(odf)
    bad = []
    for c in sdf.columns:
        a, b = sdf[c], odf[c]
        if a.dtype.kind in "fc" or b.dtype.kind in "fc":
            an, bn = a.astype(float).to_numpy(), b.astype(float).to_numpy()
            exact = np.array_equal(an, bn, equal_nan=True)
            # rtol 1e-11: double sums over 10^6+ rows are association-order
            # dependent in the last few hundred ulps, and a pre-rounded
            # column can straddle a round(x,2) boundary (q04's sf1 revenue:
            # 3867847300.29 vs .30, 2.6e-12 relative) — absolute atol alone
            # misreads magnitude
            close = np.allclose(an, bn, rtol=1e-11, atol=1e-9, equal_nan=True)
            if not exact:
                bad.append((c, "close" if close else "DIFF",
                            float(np.nanmax(np.abs(an - bn))) if len(an) else 0))
        else:
            if not a.astype(str).equals(b.astype(str)):
                n = (a.astype(str) != b.astype(str)).sum()
                bad.append((c, "DIFF", f"{n} rows"))
    if not bad:
        return "OK"
    if all(kind == "close" for _, kind, _ in bad):
        return f"CLOSE {bad}"
    return f"FAIL {bad}"

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single parquet files; GenData scale-up
        # corpora are Spark-written DIRECTORIES of part files — glob those
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            results[name] = "FAIL no spark output"
            continue
        sdf = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        try:
            odf = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"FAIL oracle error: {e}"
            continue
        results[name] = compare(name, sdf, odf)
    ok = sum(1 for v in results.values() if v == "OK")
    for name, v in results.items():
        print(f"{name:28s} {v}")
    print(f"\n{ok}/{len(results)} OK")
    # queries without oracle: rows-only check
    for d in sorted(os.listdir(outdir)):
        if os.path.isdir(os.path.join(outdir, d)) and d not in oracle:
            n = len(con.sql(f"SELECT * FROM '{outdir}/{d}/*.parquet'").df())
            print(f"(rows-only) {d:24s} rows={n}")

if __name__ == "__main__":
    main()

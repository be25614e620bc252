#!/usr/bin/env python3
"""Pin sf0.01 goldens for deterministic queries DuckDB can't compute
(engine-specific hashes / sketches / seeded draws).

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout"`,
    python3 tools/pin_goldens.py /tmp/vout [query ...]

Reads each query's Spark parquet dump and emits a VALUES-based oracle into
src/main/resources/graft/goldens/<name>.sql, CASTing the first row so DuckDB
unifies every column to the exact pandas dtype Spark's parquet produces
(the driver's hash is dtype-sensitive — see tools/localverify.py `kind`).
Validates the round trip (strict dtype + exact values) before writing.

Only pin queries proven partition-independent: rerun graft.Verify with
SPARK_GRAFT_CPUS=2/4/8 and diff the dumps first.
"""
import sys, glob
import duckdb
import numpy as np
import pandas as pd

DTYPE_SQL = {"int64": "BIGINT", "int32": "INT", "float64": "DOUBLE",
             "object": "VARCHAR", "bool": "BOOLEAN"}

HEADER = ("-- Pinned sf0.01 golden (deterministic; verified bit-stable "
          "across 2/4/8-CPU runs).\n"
          "-- Regenerate: dump via graft.Verify at sf0.01, then "
          "tools/pin_goldens.py.\n")

DEFAULT = ["q26_approx_percentile", "q34b_rolling_fingerprint",
           "q37_simhash_neardup", "q60_stratified_sample"]


def fmt(v, dt, cast):
    if dt == "object":
        s = "'" + str(v).replace("'", "''") + "'"
    elif dt == "float64":
        s = repr(float(v))  # shortest round-trip repr -> exact double
    elif dt == "bool":
        s = "true" if v else "false"
    else:
        s = str(int(v))
    return f"CAST({s} AS {DTYPE_SQL[dt]})" if cast else s


def pin(outdir, name):
    df = pd.read_parquet(glob.glob(f"{outdir}/{name}/*.parquet")[0])
    dts = [str(df[c].dtype) for c in df.columns]
    rows = ["  (" + ", ".join(fmt(v, dt, i == 0)
                              for v, dt in zip(row, dts)) + ")"
            for i, row in enumerate(df.itertuples(index=False))]
    sql = (HEADER + "SELECT * FROM (VALUES\n" + ",\n".join(rows) +
           f")\n  AS t({', '.join(df.columns)})")
    odf = duckdb.sql(sql).df()
    key = sorted(df.columns)
    odf = odf.reindex(key, axis=1).sort_values(by=key, ignore_index=True)
    sdf = df.reindex(key, axis=1).sort_values(by=key, ignore_index=True)
    assert list(odf.dtypes) == list(sdf.dtypes), \
        (name, list(odf.dtypes), list(sdf.dtypes))
    for c in key:
        if sdf[c].dtype.kind == "f":
            assert np.array_equal(sdf[c].to_numpy(), odf[c].to_numpy(),
                                  equal_nan=True), (name, c)
        else:
            assert sdf[c].astype(str).equals(odf[c].astype(str)), (name, c)
    path = f"src/main/resources/graft/goldens/{name}.sql"
    open(path, "w").write(sql)
    print(f"{name}: {len(df)} rows -> {path} ({len(sql)} bytes)")


if __name__ == "__main__":
    outdir = sys.argv[1]
    for q in (sys.argv[2:] or DEFAULT):
        pin(outdir, q)

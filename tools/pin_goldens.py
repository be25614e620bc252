#!/usr/bin/env python3
"""Pin sf0.01 goldens for deterministic queries DuckDB can't compute
(engine-specific hashes / sketches / seeded draws).

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout"`,
    python3 tools/pin_goldens.py /tmp/vout [query ...]
    python3 tools/pin_goldens.py --scale sf1 /tmp/vout_sf1 [query ...]

Reads each query's Spark parquet dump and emits a VALUES-based oracle into
src/main/resources/graft/goldens/<name>.sql, CASTing the first row so DuckDB
unifies every column to the exact pandas dtype Spark's parquet produces
(the driver's hash is dtype-sensitive — see tools/localverify.py `kind`).
Validates the round trip (strict dtype + exact values) before writing.

--scale <sfbase> writes to goldens/<sfbase>/<name>.sql instead: SCALE
goldens, consumed only by tools/scaleverify.py (the registry and the
driver's sf0.01 gate keep loading the top-level files). A scale golden is
valid ONLY against the canonical deterministic GenData corpus of that
name — record the exact GenData invocation when introducing a new scale.

Scale outputs above DIGEST_ROWS rows (q37's sf1 pair list is 2.4M rows /
50 MB as VALUES) pin a DIGEST golden instead — <name>.digest.json holding
{rows, md5 of the canonically-sorted CSV} — same bit-exact discriminating
power, fixture-sized file. scaleverify recomputes the digest from the
Spark dump with the identical canonicalization (localverify.canon).

Only pin queries proven partition-independent: rerun graft.Verify with
SPARK_GRAFT_CPUS=2/4/8 (or 8/32 at scale) and diff the dumps first.
"""
import sys, glob, os, json, hashlib
import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import localverify  # noqa: E402  (canon — MUST match scaleverify's digest)

DIGEST_ROWS = 5000

DTYPE_SQL = {"int64": "BIGINT", "int32": "INT", "float64": "DOUBLE",
             "object": "VARCHAR", "bool": "BOOLEAN"}

HEADER = ("-- Pinned sf0.01 golden (deterministic; verified bit-stable "
          "across 2/4/8-CPU runs).\n"
          "-- Regenerate: dump via graft.Verify at sf0.01, then "
          "tools/pin_goldens.py.\n")

SCALE_HEADER = ("-- Pinned {scale} golden (deterministic; verified bit-stable "
                "across 8/32-CPU runs).\n"
                "-- Valid ONLY against the canonical corpus: "
                "graft.GenData /root/testdata/sf0.1 testdata/{scale} "
                "{r} (default dense/disjoint modes).\n"
                "-- Regenerate: graft.Verify at testdata/{scale}, then "
                "tools/pin_goldens.py --scale {scale}.\n")

SCALE_R = {"sf1": 10, "sf5": 50, "sf10": 100}

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


def digest(df):
    """Order-invariant bit-exact digest: md5 of the canonically-sorted CSV
    (columns sorted by name, rows by all columns — localverify.canon)."""
    csv = localverify.canon(df).to_csv(index=False)
    return hashlib.md5(csv.encode()).hexdigest()


def pin(outdir, name, scale=None):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if scale and len(df) > DIGEST_ROWS:
        path = f"src/main/resources/graft/goldens/{scale}/{name}.digest.json"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        rec = {"rows": len(df), "md5": digest(df),
               "columns": sorted(df.columns),
               "corpus": f"graft.GenData /root/testdata/sf0.1 testdata/{scale} "
                         f"{SCALE_R.get(scale, '?')}"}
        open(path, "w").write(json.dumps(rec, indent=1) + "\n")
        print(f"{name}: {len(df)} rows -> {path} (digest)")
        return
    dts = [str(df[c].dtype) for c in df.columns]
    rows = ["  (" + ", ".join(fmt(v, dt, i == 0)
                              for v, dt in zip(row, dts)) + ")"
            for i, row in enumerate(df.itertuples(index=False))]
    header = (SCALE_HEADER.format(scale=scale, r=SCALE_R.get(scale, "?"))
              if scale else HEADER)
    sql = (header + "SELECT * FROM (VALUES\n" + ",\n".join(rows) +
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
    sub = f"{scale}/" if scale else ""
    path = f"src/main/resources/graft/goldens/{sub}{name}.sql"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    open(path, "w").write(sql)
    print(f"{name}: {len(df)} rows -> {path} ({len(sql)} bytes)")


if __name__ == "__main__":
    args = sys.argv[1:]
    scale = None
    if args and args[0] == "--scale":
        scale = args[1]
        args = args[2:]
    outdir = args[0]
    for q in (args[1:] or DEFAULT):
        pin(outdir, q, scale)

#!/usr/bin/env python3
"""Bit-stability diff between two graft.Verify dumps (e.g. 8-vs-32-CPU).

Usage: python3 tools/bitdiff.py <dumpA> <dumpB>

For every query present in both dumps, canonicalizes each parquet result
(localverify.canon — columns sorted by name, rows by all columns) and
compares the md5 of the canonical CSV: the exact digest pin_goldens.py and
scaleverify.py use. STABLE means the query's output is partition-layout-
independent bit-for-bit and is eligible for a scale golden; DRIFT means it
is not (seed/partition-shaped) and must stay sf0.01-pinned with a
documented reason. Exit code = number of DRIFT + error queries.
"""
import sys, os, glob
import hashlib
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import localverify  # noqa: E402


def digest(path):
    df = pd.read_parquet(path)
    csv = localverify.canon(df).to_csv(index=False)
    return hashlib.md5(csv.encode()).hexdigest(), len(df)


def main(a, b):
    # a graft.Verify dump holds one DIRECTORY per query (no .parquet
    # suffix); accept both that layout and bare <name>.parquet files
    def qdirs(root):
        out = {}
        for p in glob.glob(os.path.join(root, "*")):
            base = os.path.basename(p)
            if base == "oracle_sql.json":
                continue
            name = base[:-8] if base.endswith(".parquet") else base
            out[name] = p
        return out
    qa, qb = qdirs(a), qdirs(b)
    names = sorted(set(qa) & set(qb))
    bad = 0
    for n in names:
        try:
            da, ra = digest(qa[n])
            db, rb = digest(qb[n])
        except Exception as e:
            print(f"{n:32s} ERROR {type(e).__name__}: {e}", flush=True)
            bad += 1
            continue
        if da == db:
            print(f"{n:32s} STABLE  rows={ra} md5={da}", flush=True)
        else:
            print(f"{n:32s} DRIFT   rows={ra}/{rb}", flush=True)
            bad += 1
    return bad


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

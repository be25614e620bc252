#!/usr/bin/env python3
"""Oracle-verify a Verify dump at a SCALE-UP corpus (sf1/sf5/...).

Usage: python3 tools/scaleverify.py <sfDir> <verifyOutDir> [perQueryTimeoutSec]

Same compare as tools/localverify.py (imported), with the two adaptations a
10x-100x corpus needs:

- PER-QUERY TIMEOUT (default 180 s), enforced by running each oracle query
  in a fork()ed child: DuckDB is a single-node engine and some oracles are
  deliberately brute-force (q39's exact top-k is n^2*dim), so at scale a
  handful become infeasible THERE while the Spark side is fine. A timeout
  is reported as ORACLE-TIMEOUT, not a failure of the engine.
- GOLDEN CLASSIFICATION: oracle entries that embed pinned sf0.01 VALUES
  (ANN/sketch/seeded paths) can only match at sf0.01 — the driver's gate
  scale. At any other sf they are reported as GOLDEN-PINNED and excluded
  from the pass denominator instead of counting as failures. q21* goldens
  run on the constant HL7 fixture corpus, not the sf tables, so they are
  expected to PASS at every sf and stay in the denominator.

Streams one line per query (flushed) so progress is visible in a log tail.
"""
import sys, os, glob, json, multiprocessing as mp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import localverify  # noqa: E402  (compare(), TABLES)


def run_oracle(sfdir, sql, q):
    """Child-process body: own DuckDB connection, push result via queue."""
    import duckdb
    con = duckdb.connect()
    for t in localverify.TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    try:
        q.put(con.sql(sql).df())
    except Exception as e:  # oracle-side error, not engine-side
        q.put(f"ORACLE-ERROR {type(e).__name__}: {e}")


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 180.0
    import duckdb
    con = duckdb.connect()
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # q21* goldens verify the constant HL7 fixtures — scale-independent
    pinned = {k for k, v in oracle.items()
              if ("VALUES" in v or "goldens" in v) and not k.startswith("q21")}
    # SCALE GOLDENS (round 8): goldens/<sfbase>/<name>.sql, pinned by
    # tools/pin_goldens.py --scale against the canonical GenData corpus of
    # that name — substituting them for the sf0.01 fixtures moves the
    # pinned family INTO the pass denominator at that scale. Keyed by the
    # sfdir's basename so only the matching corpus uses them.
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sfbase = os.path.basename(os.path.normpath(sfdir))
    scale_goldens = {}
    for f in glob.glob(f"{root}/src/main/resources/graft/goldens/{sfbase}/*.sql"):
        scale_goldens[os.path.basename(f)[:-4]] = open(f).read()
    counts = {"OK": 0, "CLOSE": 0, "FAIL": 0, "GOLDEN": 0, "TIMEOUT": 0}
    fails = []
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"{name:28s} FAIL no spark output", flush=True)
            counts["FAIL"] += 1; fails.append(name)
            continue
        if name in pinned and name not in scale_goldens:
            print(f"{name:28s} GOLDEN-PINNED (sf0.01 fixture; driver-gate scale only)",
                  flush=True)
            counts["GOLDEN"] += 1
            continue
        sql = scale_goldens.get(name, oracle[name]) if name in pinned else oracle[name]
        q = mp.Queue()
        child = mp.Process(target=run_oracle, args=(sfdir, sql, q))
        child.start()
        try:
            odf = q.get(timeout=timeout)
        except Exception:
            odf = None
        if child.is_alive():
            child.terminate()
        child.join()
        if odf is None:
            print(f"{name:28s} ORACLE-TIMEOUT >{timeout:.0f}s (DuckDB side)", flush=True)
            counts["TIMEOUT"] += 1
            continue
        if isinstance(odf, str):
            print(f"{name:28s} {odf}", flush=True)
            counts["FAIL"] += 1; fails.append(name)
            continue
        sdf = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        v = localverify.compare(name, sdf, odf)
        key = "OK" if v == "OK" else ("CLOSE" if v.startswith("CLOSE") else "FAIL")
        counts[key] += 1
        if key == "FAIL":
            fails.append(name)
        print(f"{name:28s} {v}", flush=True)
    denom = counts["OK"] + counts["CLOSE"] + counts["FAIL"]
    print(f"\n{counts['OK']}/{denom} OK at {sfdir} "
          f"(+{counts['CLOSE']} close, {counts['FAIL']} fail, "
          f"{counts['GOLDEN']} golden-pinned skipped, "
          f"{counts['TIMEOUT']} oracle-timeout)", flush=True)
    if fails:
        print("FAILURES: " + ", ".join(fails), flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())

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
- SCALE GOLDENS + PROPERTY CHECKS (round 8) put the pinned family back in
  the denominator at scale: goldens/<sfbase>/<name>.sql (pinned by
  pin_goldens.py --scale after an 8-vs-32-CPU bit-stability diff) replace
  the sf0.01 fixture for queries whose sf1 output is partition-independent;
  the two that are NOT (q26's sketch-merge order, q60's per-partition
  sampling RNG) verify scale-invariant PROPERTIES instead — the declared
  1% rank-error bound resp. exact/binomial stratum counts.

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


def _views(sfdir):
    import duckdb
    c = duckdb.connect()
    for t in localverify.TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


def prop_q26(con, sdf):
    """approx_percentile(accuracy=100) declares rank error <= 1/100: the
    returned value's rank interval [count(<v), count(<=v)]/N must intersect
    q +/- 0.01. The exact_median column is interpolated-exact on both
    engines and must match directly. Partition-count-invariant by the
    sketch's own contract, unlike its bit values."""
    eps = 0.01 + 1e-9
    for _, r in sdf.iterrows():
        g = r["l_returnflag"]
        n, med = con.sql("SELECT count(*), median(l_extendedprice) "
                         f"FROM lineitem WHERE l_returnflag='{g}'").fetchone()
        if abs(r["exact_median"] - med) > 1e-6 * max(1.0, abs(med)):
            return f"exact_median {r['exact_median']} != {med} ({g})"
        for q, cn in [(0.25, "approx_p25"), (0.5, "approx_p50"),
                      (0.75, "approx_p75")]:
            v = r[cn]
            lo, hi = con.sql(
                f"SELECT count(*) FILTER (l_extendedprice < {v}), "
                f"count(*) FILTER (l_extendedprice <= {v}) "
                f"FROM lineitem WHERE l_returnflag='{g}'").fetchone()
            if not (lo / n - eps <= q <= hi / n + eps):
                return (f"{cn}={v} rank [{lo/n:.4f},{hi/n:.4f}] "
                        f"outside {q}+/-0.01 ({g})")
    return None


def prop_q60(con, sdf):
    """sampleBy is per-row Bernoulli: fraction-1.0 strata must keep ALL
    rows exactly; 0.5 strata must land within 5 sigma of the binomial
    mean. The sampled SET is seeded-RNG/partition-order-specific, the
    counts' distribution is not."""
    pop = dict(con.sql("SELECT lang, count(*) FROM documents WHERE lang IN "
                       "('en','es','fr','de','zh') GROUP BY lang").fetchall())
    frac = {"en": 0.5, "es": 0.5, "fr": 1.0, "de": 1.0, "zh": 1.0}
    got = dict(zip(sdf["lang"], sdf["n_sampled"]))
    if set(got) - set(frac):
        return f"unexpected strata {sorted(set(got) - set(frac))}"
    for lang, f in frac.items():
        n, s = pop.get(lang, 0), int(got.get(lang, 0))
        if f == 1.0:
            if s != n:
                return f"{lang}: kept {s} != population {n} at fraction 1.0"
        else:
            tol = 5 * (n * f * (1 - f)) ** 0.5
            if abs(s - f * n) > tol:
                return f"{lang}: {s} vs expected {f*n:.0f}+/-{tol:.0f}"
    return None


def prop_q185(con, sdf):
    """Scale-invariant anchor for q185 alongside its pinned golden (the
    golden is engine-output-pinned because the live wedge-closure SQL is
    disk-infeasible at sf1+, so golden-only would be regression-only —
    ADVICE r11). Three independent checks:
    1. per-row: 0 < n_triangles <= C(degree,2) and clust_coef equals
       round(2*tri/(d*(d-1)), 4) (the engine's own declared formula);
    2. global: sum(n_triangles) % 3 == 0 (every triangle is counted at
       exactly its 3 corners);
    3. sampled wedge-closure recheck: for 3 deterministic small-degree
       nodes, recompute the co-purchase neighborhood and the triangles at
       that node LIVE in DuckDB with the node id pushed into the scan —
       feasible at any scale because the quadratic stages are filtered to
       one node's neighborhood."""
    tri_min_co = 2
    total = 0
    for _, r in sdf.iterrows():
        d, t, cc = int(r["degree"]), int(r["n_triangles"]), float(r["clust_coef"])
        if not (0 < t <= d * (d - 1) // 2):
            return f"node {r['partkey']}: n_triangles {t} vs C({d},2)"
        want = (2.0 * t) / (d * (d - 1))
        if abs(cc - want) > 5.001e-5:
            return f"node {r['partkey']}: clust_coef {cc} != round({want}, 4)"
        total += t
    if total % 3 != 0:
        return f"sum(n_triangles) = {total} not divisible by 3"
    picks = sdf.sort_values(["degree", "partkey"]).head(3)
    for _, r in picks.iterrows():
        n, d, t = int(r["partkey"]), int(r["degree"]), int(r["n_triangles"])
        if d > 60:
            continue  # keep the neighborhood recheck cheap
        nbrs = [int(x[0]) for x in con.sql(
            "WITH io AS (SELECT DISTINCT l_orderkey o, l_partkey p FROM lineitem), "
            f"ion AS (SELECT o FROM io WHERE p = {n}) "
            f"SELECT b.p FROM io b JOIN ion USING (o) WHERE b.p <> {n} "
            f"GROUP BY 1 HAVING count(*) >= {tri_min_co}").fetchall()]
        if len(nbrs) != d:
            return f"node {n}: recomputed degree {len(nbrs)} != reported {d}"
        ids = ",".join(str(x) for x in nbrs)
        (tri,) = con.sql(
            "WITH sel AS (SELECT DISTINCT l_orderkey o, l_partkey p FROM lineitem "
            f"WHERE l_partkey IN ({ids})) "
            "SELECT count(*) FROM (SELECT a.p, b.p FROM sel a JOIN sel b "
            "ON a.o = b.o AND a.p < b.p "
            f"GROUP BY a.p, b.p HAVING count(*) >= {tri_min_co})").fetchone()
        if int(tri) != t:
            return f"node {n}: recomputed n_triangles {tri} != reported {t}"
    return None


PROPERTY_CHECKS = {"q26_approx_percentile": prop_q26,
                   "q60_stratified_sample": prop_q60}

# Property checks that run IN ADDITION to a passing scale golden (the
# golden proves bit-identity to the pinned run; the property anchors the
# pinned values to the corpus independently — ADVICE r11 on q185's
# engine-output-pinned goldens).
GOLDEN_PLUS_PROPERTY = {"q185_triangle_count": prop_q185}


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 180.0
    import duckdb
    con = duckdb.connect()
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # q21* goldens verify the constant HL7 fixtures — scale-independent.
    # COMPUTED_VALUES: oracles whose VALUES clause is an input dimension
    # (q171's campaign windows), not a pinned result — fully scale-checkable.
    COMPUTED_VALUES = {"q171_campaign_overlap"}
    # NB: the HL7 fixture family is q21_*/q21b_* — a bare "q21" prefix
    # would also swallow q217/q218/q219 (found when q217b's sf1 scale
    # golden was silently compared against its sf0.01 fixture instead).
    pinned = {k for k, v in oracle.items()
              if ("VALUES" in v or "goldens" in v)
              and not (k.startswith("q21_") or k.startswith("q21b_"))
              and k not in COMPUTED_VALUES}
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
    # digest goldens: {rows, md5-of-canonical-CSV} for outputs too large to
    # pin as VALUES (see pin_goldens.py DIGEST_ROWS) — same bit-exactness.
    scale_digests = {}
    for f in glob.glob(f"{root}/src/main/resources/graft/goldens/{sfbase}/*.digest.json"):
        scale_digests[os.path.basename(f)[: -len(".digest.json")]] = json.load(open(f))
    # Live oracles MEASURED DuckDB-infeasible at a scale (spill exceeds
    # free disk, aborts with IOException): the engine output is verified
    # against a bit-stability-pinned scale golden instead. Round 11:
    # q185's wedge-closure SQL spilled >75 GB at sf1 and aborted (the
    # q182/q69 class) — the corpus is unchanged (the r8-era sf1 goldens
    # still verify), the budget is the host's free disk. Listed per scale
    # so a feasible live oracle is never silently bypassed.
    INFEASIBLE_LIVE = {"sf1": {"q185_triangle_count"},
                       "sf10": {"q185_triangle_count"}}
    # Fail FAST if an INFEASIBLE_LIVE member has no scale golden/digest for
    # this sfbase: the get(name, oracle[name]) substitution below would
    # otherwise silently fall back to running the live oracle that was just
    # declared infeasible, burning the timeout/disk the table exists to
    # avoid (ADVICE r11).
    missing = INFEASIBLE_LIVE.get(sfbase, set()) - set(scale_goldens) - set(scale_digests)
    if missing:
        print(f"FATAL: INFEASIBLE_LIVE[{sfbase}] members with no scale "
              f"golden/digest under goldens/{sfbase}/: {sorted(missing)} — "
              "pin them (tools/pin_goldens.py --scale) before routing their "
              "live oracle away", flush=True)
        return 2
    counts = {"OK": 0, "CLOSE": 0, "FAIL": 0, "GOLDEN": 0, "TIMEOUT": 0}
    # SCALEVERIFY_SKIP: comma-separated names known DuckDB-infeasible at
    # this scale (q149's curate SQL spills >75 GB at 10x — round 7) —
    # classified as oracle-timeouts without burning the full cap on each.
    skip = set(filter(None, os.environ.get("SCALEVERIFY_SKIP", "").split(",")))
    fails = []
    for name in sorted(oracle):
        if name in skip:
            print(f"{name:28s} ORACLE-INFEASIBLE (SCALEVERIFY_SKIP; "
                  "constituent stages verify individually)", flush=True)
            counts["TIMEOUT"] += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"{name:28s} FAIL no spark output", flush=True)
            counts["FAIL"] += 1; fails.append(name)
            continue
        if name in scale_digests:
            import hashlib
            sdf = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            exp = scale_digests[name]
            csv = localverify.canon(sdf).to_csv(index=False)
            got = {"rows": len(sdf), "md5": hashlib.md5(csv.encode()).hexdigest()}
            if got["rows"] == exp["rows"] and got["md5"] == exp["md5"]:
                print(f"{name:28s} OK (digest golden, {exp['rows']} rows)", flush=True)
                counts["OK"] += 1
            else:
                print(f"{name:28s} FAIL digest {got} != {{rows: {exp['rows']}, "
                      f"md5: {exp['md5']}}}", flush=True)
                counts["FAIL"] += 1; fails.append(name)
            continue
        if name in PROPERTY_CHECKS and name not in scale_goldens:
            sdf = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            pcon = _views(sfdir)
            try:
                err = PROPERTY_CHECKS[name](pcon, sdf)
            finally:
                pcon.close()
            if err is None:
                print(f"{name:28s} OK (scale-invariant property)", flush=True)
                counts["OK"] += 1
            else:
                print(f"{name:28s} FAIL property: {err}", flush=True)
                counts["FAIL"] += 1; fails.append(name)
            continue
        if name in pinned and name not in scale_goldens:
            print(f"{name:28s} GOLDEN-PINNED (sf0.01 fixture; driver-gate scale only)",
                  flush=True)
            counts["GOLDEN"] += 1
            continue
        use_golden = name in pinned or name in INFEASIBLE_LIVE.get(sfbase, set())
        sql = scale_goldens.get(name, oracle[name]) if use_golden else oracle[name]
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
        if v == "OK" and use_golden and name in GOLDEN_PLUS_PROPERTY:
            # golden passed — ALSO anchor the pinned values to the corpus
            # via the scale-invariant property (ADVICE r11)
            pcon = _views(sfdir)
            try:
                err = GOLDEN_PLUS_PROPERTY[name](pcon, sdf)
            finally:
                pcon.close()
            v = "OK (golden + property)" if err is None else f"FAIL property: {err}"
        key = "OK" if v.startswith("OK") else ("CLOSE" if v.startswith("CLOSE") else "FAIL")
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

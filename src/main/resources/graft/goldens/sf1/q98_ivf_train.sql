-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(2513 AS BIGINT), CAST(0.1995 AS DOUBLE), CAST(2411.22 AS DOUBLE)),
  (29, 2390, 0.2053, 2287.72),
  (58, 2445, 0.1968, 2348.12),
  (87, 2514, 0.2039, 2409.9),
  (116, 2339, 0.1967, 2247.52),
  (145, 2607, 0.1986, 2503.27),
  (174, 2611, 0.2063, 2500.15),
  (203, 2581, 0.2013, 2474.59))
  AS t(cent_id, n_members, cnorm, sse)
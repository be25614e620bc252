-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST(232 AS BIGINT), CAST(20222 AS BIGINT), CAST(4691 AS BIGINT), CAST(19381.08 AS DOUBLE), CAST(4527.16 AS DOUBLE), CAST(1.0069 AS DOUBLE)),
  (145, 20359, 4459, 19552.06, 4307.94, 1.006),
  (174, 20745, 5429, 19880.35, 5224.49, 1.0042),
  (116, 19383, 5211, 18649.4, 5042.54, 1.0057),
  (87, 19601, 5681, 18806.79, 5461.29, 1.0019),
  (261, 19651, 4773, 18840.77, 4593.69, 1.0038),
  (203, 20083, 4796, 19268.86, 4625.26, 1.0051),
  (0, 19956, 4960, 19147.18, 4784.7, 1.0054))
  AS t(cent_id, n_existing, n_new, sse_existing, sse_new, drift)
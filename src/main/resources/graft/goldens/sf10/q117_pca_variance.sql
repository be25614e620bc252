-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST(1 AS INT), CAST(0.01831 AS DOUBLE), CAST(0.0183 AS DOUBLE)),
  (2, 0.01816, 0.0365),
  (3, 0.01806, 0.0545),
  (4, 0.01785, 0.0724),
  (5, 0.01774, 0.0901),
  (6, 0.01759, 0.1077),
  (7, 0.01743, 0.1252),
  (8, 0.01738, 0.1426))
  AS t(component, eigenvalue, cum_ratio)
-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST('click' AS VARCHAR), CAST(298450.0 AS DOUBLE), CAST(600000 AS BIGINT), CAST(0.9918 AS DOUBLE), CAST(3 AS BIGINT)),
  ('error', 292400.0, 600000, 0.9603, 5),
  ('purchase', 302950.0, 600000, 1.0159, 2),
  ('signup', 309600.0, 600000, 1.0526, 1),
  ('view', 296600.0, 600000, 0.982, 4))
  AS t(item, wins, n_comparisons, rating, rank)
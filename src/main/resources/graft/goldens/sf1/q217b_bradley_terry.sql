-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST('click' AS VARCHAR), CAST(29845.0 AS DOUBLE), CAST(60000 AS BIGINT), CAST(0.9918 AS DOUBLE), CAST(3 AS BIGINT)),
  ('error', 29240.0, 60000, 0.9603, 5),
  ('purchase', 30295.0, 60000, 1.0159, 2),
  ('signup', 30960.0, 60000, 1.0526, 1),
  ('view', 29660.0, 60000, 0.982, 4))
  AS t(item, wins, n_comparisons, rating, rank)
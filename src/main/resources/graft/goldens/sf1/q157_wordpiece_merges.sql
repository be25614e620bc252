-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST(1 AS INT), CAST('q' AS VARCHAR), CAST('u' AS VARCHAR), CAST('qu' AS VARCHAR), CAST(2.201e-06 AS DOUBLE)),
  (2, 'i', 'n', 'in', 1.328e-06),
  (3, 'f', 'i', 'fi', 2.78e-06),
  (4, 'b', 'i', 'bi', 3.7e-06),
  (5, 'bi', 'g', 'big', 2.218e-06),
  (6, 'fi', 'l', 'fil', 1.378e-06),
  (7, 'in', 'd', 'ind', 1.225e-06),
  (8, 'w', 'ind', 'wind', 2.762e-06),
  (9, 'm', 'n', 'mn', 1.115e-06),
  (10, 'u', 'mn', 'umn', 2.736e-06))
  AS t(merge_rank, lhs, rhs, merged, score)
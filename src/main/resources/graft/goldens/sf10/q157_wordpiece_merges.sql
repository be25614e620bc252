-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST(1 AS INT), CAST('q' AS VARCHAR), CAST('u' AS VARCHAR), CAST('qu' AS VARCHAR), CAST(2.2e-07 AS DOUBLE)),
  (2, 'i', 'n', 'in', 1.33e-07),
  (3, 'f', 'i', 'fi', 2.78e-07),
  (4, 'b', 'i', 'bi', 3.7e-07),
  (5, 'bi', 'g', 'big', 2.22e-07),
  (6, 'fi', 'l', 'fil', 1.38e-07),
  (7, 'in', 'd', 'ind', 1.23e-07),
  (8, 'w', 'ind', 'wind', 2.76e-07),
  (9, 'm', 'n', 'mn', 1.11e-07),
  (10, 'u', 'mn', 'umn', 2.74e-07))
  AS t(merge_rank, lhs, rhs, merged, score)
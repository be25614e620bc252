-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST(1 AS INT), CAST('q' AS VARCHAR), CAST('u' AS VARCHAR), CAST('qu' AS VARCHAR), CAST(0.000220264 AS DOUBLE)),
  (2, 'i', 'n', 'in', 0.000130469),
  (3, 'f', 'i', 'fi', 0.000288615),
  (4, 'b', 'i', 'bi', 0.000367512),
  (5, 'bi', 'g', 'big', 0.000223514),
  (6, 'fi', 'l', 'fil', 0.000135943),
  (7, 'in', 'd', 'ind', 0.000117502),
  (8, 'w', 'ind', 'wind', 0.000275255),
  (9, 'j', 'o', 'jo', 0.000109254),
  (10, 'jo', 'in', 'join', 0.000533618))
  AS t(merge_rank, lhs, rhs, merged, score)
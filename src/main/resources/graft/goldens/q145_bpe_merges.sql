-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST(1 AS INT), CAST('e' AS VARCHAR), CAST('r' AS VARCHAR), CAST('er' AS VARCHAR), CAST(4568 AS BIGINT)),
  (2, 'i', 'n', 'in', 2760),
  (3, 'o', 'w', 'ow', 2747),
  (4, 'o', 'r', 'or', 2696),
  (5, 's', 't', 'st', 2676),
  (6, 'm', 'er', 'mer', 1852),
  (7, 'a', 't', 'at', 1845),
  (8, 'l', 'u', 'lu', 1831),
  (9, 'a', 'r', 'ar', 1758),
  (10, 'p', 'ar', 'par', 1758))
  AS t(merge_rank, lhs, rhs, merged, weight)
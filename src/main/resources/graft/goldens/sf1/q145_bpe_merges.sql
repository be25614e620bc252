-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST(1 AS INT), CAST('e' AS VARCHAR), CAST('r' AS VARCHAR), CAST('er' AS VARCHAR), CAST(450890 AS BIGINT)),
  (2, 'e', '_', 'e_', 407601),
  (3, 'i', 'n', 'in', 271900),
  (4, 'o', 'r', 'or', 270950),
  (5, 's', 't', 'st', 270600),
  (6, 'o', 'w', 'ow', 270440),
  (7, 'er', '_', 'er_', 243459),
  (8, 'ow', '_', 'ow_', 243396),
  (9, 't', 'a', 'ta', 182480),
  (10, 'l', 'u', 'lu', 182390))
  AS t(merge_rank, lhs, rhs, merged, weight)
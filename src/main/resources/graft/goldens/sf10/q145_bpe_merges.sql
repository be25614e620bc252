-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST(1 AS INT), CAST('e' AS VARCHAR), CAST('r' AS VARCHAR), CAST('er' AS VARCHAR), CAST(4508900 AS BIGINT)),
  (2, 'e', '_', 'e_', 4483611),
  (3, 'i', 'n', 'in', 2719000),
  (4, 'o', 'r', 'or', 2709500),
  (5, 's', 't', 'st', 2706000),
  (6, 'o', 'w', 'ow', 2704400),
  (7, 'er', '_', 'er_', 2678049),
  (8, 'ow', '_', 'ow_', 2677356),
  (9, '_', '1', '_1', 1884520),
  (10, '_', '2', '_2', 1884520))
  AS t(merge_rank, lhs, rhs, merged, weight)
-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST('N' AS VARCHAR), CAST(1994037 AS BIGINT), CAST(20012500 AS BIGINT)),
  ('A', 1994514, 19985000),
  ('R', 1994594, 20002500))
  AS t(l_returnflag, approx_parts, n_rows)
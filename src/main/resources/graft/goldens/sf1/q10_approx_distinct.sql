-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST('N' AS VARCHAR), CAST(199108 AS BIGINT), CAST(2001250 AS BIGINT)),
  ('A', 198975, 1998500),
  ('R', 199119, 2000250))
  AS t(l_returnflag, approx_parts, n_rows)
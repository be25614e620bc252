-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST('O' AS VARCHAR), CAST(146760 AS BIGINT), CAST(144580 AS BIGINT)),
  ('P', 148090, 144590),
  ('F', 147270, 144890),
  ('ALL', 153040, 149990))
  AS t(o_orderstatus, approx_customers, exact_customers)
-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST('O' AS VARCHAR), CAST(1452183 AS BIGINT), CAST(1445800 AS BIGINT)),
  ('P', 1465498, 1445900),
  ('F', 1468787, 1448900),
  ('ALL', 1514354, 1499900))
  AS t(o_orderstatus, approx_customers, exact_customers)
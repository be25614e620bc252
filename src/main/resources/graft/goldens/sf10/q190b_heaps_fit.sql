-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST(50 AS BIGINT), CAST(50 AS BIGINT), CAST(1.0 AS DOUBLE), CAST(0.0001 AS DOUBLE)))
  AS t(n_fit, n_growth, beta, k)
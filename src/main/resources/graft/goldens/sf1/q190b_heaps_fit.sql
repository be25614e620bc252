-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST(50 AS BIGINT), CAST(10 AS BIGINT), CAST(0.7662 AS DOUBLE), CAST(0.0034 AS DOUBLE)))
  AS t(n_fit, n_growth, beta, k)
-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST(50 AS BIGINT), CAST(1 AS BIGINT), CAST(0.0 AS DOUBLE), CAST(31.0 AS DOUBLE)))
  AS t(n_fit, n_growth, beta, k)
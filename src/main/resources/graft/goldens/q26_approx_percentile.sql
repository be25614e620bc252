-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST('N' AS VARCHAR), CAST(25942.55 AS DOUBLE), CAST(52943.36 AS DOUBLE), CAST(78394.31 AS DOUBLE), CAST(53052.91499999999 AS DOUBLE)),
  ('R', 26716.12, 52626.94, 78611.95, 53230.485),
  ('A', 26280.79, 51949.69, 78241.25, 52840.435))
  AS t(l_returnflag, approx_p25, approx_p50, approx_p75, exact_median)
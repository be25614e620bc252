-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST(232 AS BIGINT), CAST(34 AS BIGINT), CAST(8 AS BIGINT), CAST(31.24 AS DOUBLE), CAST(7.66 AS DOUBLE), CAST(1.0415 AS DOUBLE)),
  (0, 59, 9, 55.18, 8.74, 1.0381),
  (174, 54, 7, 49.59, 6.89, 1.0713),
  (261, 53, 16, 49.33, 15.64, 1.0503),
  (203, 58, 15, 54.43, 14.57, 1.0352),
  (87, 52, 16, 47.71, 15.54, 1.0587),
  (145, 50, 18, 46.62, 17.74, 1.0569),
  (116, 40, 11, 36.07, 10.54, 1.0627))
  AS t(cent_id, n_existing, n_new, sse_existing, sse_new, drift)
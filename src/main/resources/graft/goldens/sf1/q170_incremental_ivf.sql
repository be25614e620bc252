-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST(232 AS BIGINT), CAST(2022 AS BIGINT), CAST(437 AS BIGINT), CAST(1935.23 AS DOUBLE), CAST(421.67 AS DOUBLE), CAST(1.0082 AS DOUBLE)),
  (145, 2145, 473, 2059.11, 457.45, 1.0075),
  (174, 2028, 542, 1938.28, 521.16, 1.0061),
  (116, 1889, 486, 1812.64, 469.89, 1.0076),
  (87, 1964, 577, 1879.83, 554.95, 1.0048),
  (261, 1951, 497, 1868.44, 479.29, 1.007),
  (203, 2001, 495, 1913.85, 477.12, 1.0078),
  (0, 2000, 493, 1914.1, 475.71, 1.0082))
  AS t(cent_id, n_existing, n_new, sse_existing, sse_new, drift)
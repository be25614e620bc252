-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST(12 AS INT), CAST(2083 AS BIGINT), CAST(224940 AS BIGINT), CAST(28676898480 AS BIGINT), CAST(127.4869 AS DOUBLE)),
  (10, 2083, 187480, 23905564976, 127.5099),
  (13, 2083, 243698, 31066278310, 127.4786),
  (14, 2084, 262626, 33484961308, 127.5006),
  (9, 2083, 168723, 21517725012, 127.5328),
  (11, 2084, 206338, 26310612436, 127.5122),
  (8, 2084, 150056, 19133458016, 127.5088),
  (15, 2083, 281145, 35836068616, 127.4647))
  AS t(width, n_images, n_pixels, luma_sum, mean_luma)
-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST(6 AS INT), CAST(3334 AS BIGINT), CAST(10002 AS BIGINT), CAST(750150 AS BIGINT), CAST(95638531352 AS BIGINT), CAST(127.4925 AS DOUBLE)),
  (7, 3333, 13332, 1099824, 140231821608, 127.5039),
  (8, 3333, 13332, 1199904, 152983536512, 127.4965),
  (5, 3333, 9999, 674973, 86061227530, 127.5032),
  (4, 3333, 6666, 399952, 51001418464, 127.5188))
  AS t(n_frames, n_videos, n_sampled, n_pixels, luma_sum, mean_luma)
-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST(10000 AS INT), CAST(6 AS INT), CAST(33334 AS BIGINT), CAST(938205604033272 AS BIGINT), CAST(1707916019449806 AS BIGINT)),
  (14000, 6, 33333, 938216773538250, 1707832392476867),
  (8000, 6, 33333, 938182605713055, 1707901335549987),
  (12000, 6, 33333, 938205301818381, 1707807694243995),
  (16000, 6, 33334, 938228463095388, 1707906165946802))
  AS t(sample_rate, dom_bin, n_clips, sum_peak, sum_power)
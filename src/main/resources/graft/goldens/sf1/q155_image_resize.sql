-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST(12 AS INT), CAST(2083 AS BIGINT), CAST(12745479984 AS BIGINT), CAST(127.4752 AS DOUBLE)),
  (10, 2083, 12745386880, 127.4743),
  (13, 2083, 12742615984, 127.4466),
  (14, 2084, 12761610208, 127.5753),
  (9, 2083, 12747606560, 127.4965),
  (11, 2084, 12757430016, 127.5335),
  (8, 2084, 12750900608, 127.4682),
  (15, 2083, 12739296336, 127.4133))
  AS t(src_width, n_images, luma_sum, mean_luma)
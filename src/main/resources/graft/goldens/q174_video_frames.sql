-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST(6 AS INT), CAST(34 AS BIGINT), CAST(102 AS BIGINT), CAST(7650 AS BIGINT), CAST(977245632 AS BIGINT), CAST(127.7445 AS DOUBLE)),
  (4, 33, 66, 3952, 499883744, 126.4888),
  (5, 33, 99, 6723, 875264550, 130.1896),
  (7, 33, 132, 10824, 1375605320, 127.0884),
  (8, 33, 132, 11904, 1523765376, 128.0045))
  AS t(n_frames, n_videos, n_sampled, n_pixels, luma_sum, mean_luma)
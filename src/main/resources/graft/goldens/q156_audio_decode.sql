-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST(10000 AS INT), CAST(34 AS BIGINT), CAST(2159 AS BIGINT), CAST(35369508 AS BIGINT)),
  (16000, 34, 2261, 37065317),
  (14000, 33, 2169, 35518035),
  (12000, 33, 2121, 34766819),
  (8000, 33, 2070, 33906425))
  AS t(sample_rate, n_clips, total_frames, sum_abs)
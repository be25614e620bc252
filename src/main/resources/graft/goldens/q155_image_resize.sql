-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST(14 AS INT), CAST(21 AS BIGINT), CAST(128435952 AS BIGINT), CAST(127.4166 AS DOUBLE)),
  (12, 21, 129429808, 128.4026),
  (13, 20, 121706976, 126.7781),
  (9, 21, 131265232, 130.2234),
  (10, 21, 127544816, 126.5326),
  (11, 21, 129015888, 127.992),
  (15, 21, 127528528, 126.5164),
  (8, 21, 126102192, 125.1014))
  AS t(src_width, n_images, luma_sum, mean_luma)
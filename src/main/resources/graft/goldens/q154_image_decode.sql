-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST(14 AS INT), CAST(21 AS BIGINT), CAST(2646 AS BIGINT), CAST(336101616 AS BIGINT), CAST(127.0225 AS DOUBLE)),
  (12, 21, 2268, 284899472, 125.6171),
  (13, 20, 2327, 289647016, 124.4723),
  (9, 21, 1701, 226472602, 133.1409),
  (10, 21, 1890, 243478240, 128.8245),
  (11, 21, 2079, 263488530, 126.7381),
  (15, 21, 2835, 356826978, 125.8649),
  (8, 21, 1512, 194968224, 128.9472))
  AS t(width, n_images, n_pixels, luma_sum, mean_luma)
-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST(12 AS INT), CAST(20833 AS BIGINT), CAST(2249988 AS BIGINT), CAST(286863210456 AS BIGINT), CAST(127.4954 AS DOUBLE)),
  (10, 20833, 1874980, 239051851068, 127.4957),
  (13, 20833, 2437422, 310739693862, 127.487),
  (14, 20834, 2625112, 334739449656, 127.5143),
  (9, 20833, 1687464, 215157072408, 127.5032),
  (11, 20834, 2062599, 262994300658, 127.5063),
  (8, 20834, 1500024, 191251473552, 127.4989),
  (15, 20833, 2812425, 358549549764, 127.4877))
  AS t(width, n_images, n_pixels, luma_sum, mean_luma)
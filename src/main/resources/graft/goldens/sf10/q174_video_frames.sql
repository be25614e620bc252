-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST(6 AS INT), CAST(33334 AS BIGINT), CAST(100002 AS BIGINT), CAST(7500150 AS BIGINT), CAST(956273880184 AS BIGINT), CAST(127.5006 AS DOUBLE)),
  (7, 33333, 133332, 10999824, 1402497527080, 127.5018),
  (8, 33333, 133332, 11999904, 1529985811840, 127.4998),
  (5, 33333, 99999, 6749973, 860659897690, 127.5057),
  (4, 33333, 66666, 3999952, 509985311456, 127.4979))
  AS t(n_frames, n_videos, n_sampled, n_pixels, luma_sum, mean_luma)
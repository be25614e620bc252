-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST(12 AS INT), CAST(20833 AS BIGINT), CAST(127464090672 AS BIGINT), CAST(127.4661 AS DOUBLE)),
  (10, 20833, 127477744784, 127.4798),
  (13, 20833, 127431964528, 127.434),
  (14, 20834, 127564563328, 127.5605),
  (9, 20833, 127499366400, 127.5014),
  (11, 20834, 127534074320, 127.53),
  (8, 20834, 127501771200, 127.4977),
  (15, 20833, 127426049520, 127.4281))
  AS t(src_width, n_images, luma_sum, mean_luma)
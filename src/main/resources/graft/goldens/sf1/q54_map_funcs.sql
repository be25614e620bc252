-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST('PID' AS VARCHAR), CAST(261 AS BIGINT), CAST(317 AS BIGINT), CAST(48 AS BIGINT), CAST(272 AS BIGINT)),
  ('MSH', 154, 154, 27, 165),
  ('PV1', 61, 61, 15, 67),
  ('EVN', 18, 18, 6, 25),
  ('NK1', 58, 58, 17, 65),
  ('MRG', 1, 1, 0, 2),
  ('GT1', 74, 74, 15, 78),
  ('IN1', 69, 69, 15, 73),
  ('OBR', 114, 114, 21, 121),
  ('OBX', 966, 966, 216, 1076),
  ('DG1', 21, 21, 6, 24),
  ('PV2', 2, 2, 0, 3),
  ('NTE', 24, 24, 8, 32),
  ('ADD', 28, 28, 28, 57),
  ('FTS', 2, 2, 1, 3),
  ('PD1', 4, 4, 1, 5))
  AS t(segment_id, n_keys, n_values, n_first_elems, n_keys_plus)
-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST(29 AS BIGINT), CAST(57 AS BIGINT), CAST(8 AS BIGINT), CAST(49 AS BIGINT)),
  (174, 64, 9, 55),
  (0, 48, 11, 37),
  (203, 66, 9, 57),
  (87, 58, 8, 50),
  (58, 62, 9, 53),
  (145, 68, 11, 57),
  (116, 77, 19, 58))
  AS t(cent_id, n_members, n_pruned, n_kept)
-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST('src7' AS VARCHAR), CAST(1507 AS BIGINT), CAST(6719 AS BIGINT), CAST(4068 AS BIGINT), CAST(1.6517 AS DOUBLE)),
  ('src16', 1351, 6158, 3711, 1.6594),
  ('src4', 1294, 5829, 3600, 1.6192),
  ('src9', 1366, 6135, 3754, 1.6343),
  ('src14', 1318, 5923, 3699, 1.6012),
  ('src10', 1303, 5883, 3586, 1.6405),
  ('src2', 1407, 6307, 3877, 1.6268),
  ('src8', 1136, 5166, 3146, 1.6421),
  ('src17', 1373, 6129, 3711, 1.6516),
  ('src0', 1435, 6539, 3986, 1.6405),
  ('src12', 1272, 5680, 3453, 1.6449),
  ('src15', 1298, 5827, 3534, 1.6488),
  ('src18', 1364, 6217, 3757, 1.6548),
  ('src19', 1147, 5184, 3182, 1.6292),
  ('src1', 1540, 7055, 4277, 1.6495),
  ('src13', 1553, 6934, 4289, 1.6167),
  ('src3', 1384, 6261, 3800, 1.6476),
  ('src5', 1329, 5950, 3609, 1.6487),
  ('src6', 1266, 5723, 3461, 1.6536),
  ('src11', 1522, 6890, 4182, 1.6475))
  AS t(source, n_words, n_chars, n_uni_tokens, chars_per_token)
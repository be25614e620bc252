-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST('src7' AS VARCHAR), CAST(1507 AS BIGINT), CAST(6719 AS BIGINT), CAST(6132 AS BIGINT), CAST(1.0957 AS DOUBLE)),
  ('src16', 1351, 6158, 5591, 1.1014),
  ('src4', 1294, 5829, 5352, 1.0891),
  ('src9', 1366, 6135, 5593, 1.0969),
  ('src14', 1318, 5923, 5421, 1.0926),
  ('src10', 1303, 5883, 5372, 1.0951),
  ('src2', 1407, 6307, 5738, 1.0992),
  ('src8', 1136, 5166, 4707, 1.0975),
  ('src17', 1373, 6129, 5571, 1.1002),
  ('src0', 1435, 6539, 5981, 1.0933),
  ('src12', 1272, 5680, 5176, 1.0974),
  ('src15', 1298, 5827, 5358, 1.0875),
  ('src18', 1364, 6217, 5613, 1.1076),
  ('src19', 1147, 5184, 4724, 1.0974),
  ('src1', 1540, 7055, 6460, 1.0921),
  ('src13', 1553, 6934, 6272, 1.1055),
  ('src3', 1384, 6261, 5623, 1.1135),
  ('src5', 1329, 5950, 5456, 1.0905),
  ('src6', 1266, 5723, 5205, 1.0995),
  ('src11', 1522, 6890, 6215, 1.1086))
  AS t(source, n_words, n_chars, n_wp_tokens, chars_per_token)
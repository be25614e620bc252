-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST('src7' AS VARCHAR), CAST(1507 AS BIGINT), CAST(6719 AS BIGINT), CAST(5441 AS BIGINT), CAST(1.2349 AS DOUBLE)),
  ('src16', 1351, 6158, 4928, 1.2496),
  ('src4', 1294, 5829, 4643, 1.2554),
  ('src9', 1366, 6135, 4921, 1.2467),
  ('src14', 1318, 5923, 4737, 1.2504),
  ('src10', 1303, 5883, 4677, 1.2579),
  ('src2', 1407, 6307, 5087, 1.2398),
  ('src8', 1136, 5166, 4147, 1.2457),
  ('src17', 1373, 6129, 4872, 1.258),
  ('src0', 1435, 6539, 5216, 1.2536),
  ('src12', 1272, 5680, 4541, 1.2508),
  ('src15', 1298, 5827, 4641, 1.2555),
  ('src18', 1364, 6217, 4977, 1.2491),
  ('src19', 1147, 5184, 4134, 1.254),
  ('src1', 1540, 7055, 5620, 1.2553),
  ('src13', 1553, 6934, 5556, 1.248),
  ('src3', 1384, 6261, 5001, 1.2519),
  ('src5', 1329, 5950, 4783, 1.244),
  ('src6', 1266, 5723, 4589, 1.2471),
  ('src11', 1522, 6890, 5507, 1.2511))
  AS t(source, n_words, n_chars, n_bpe_tokens, chars_per_token)
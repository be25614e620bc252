-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST('src7' AS VARCHAR), CAST(1260400 AS BIGINT), CAST(9314252 AS BIGINT), CAST(8804852 AS BIGINT), CAST(1.0579 AS DOUBLE)),
  ('src9', 1328300, 9817304, 9284904, 1.0573),
  ('src17', 1357200, 10007436, 9458536, 1.058),
  ('src12', 1422400, 10487212, 9915712, 1.0576),
  ('src13', 1421400, 10532732, 9942932, 1.0593),
  ('src5', 1437300, 10615824, 10051424, 1.0562),
  ('src4', 1343100, 9925728, 9379828, 1.0582),
  ('src10', 1360800, 10075504, 9509104, 1.0596),
  ('src8', 1439900, 10626412, 10050112, 1.0573),
  ('src0', 1329800, 9857724, 9325524, 1.0571),
  ('src16', 1354100, 9983408, 9431308, 1.0585),
  ('src14', 1282300, 9467324, 8966924, 1.0558),
  ('src2', 1372700, 10127776, 9575176, 1.0577),
  ('src1', 1359700, 10027136, 9497336, 1.0558),
  ('src11', 1319600, 9755148, 9219448, 1.0581),
  ('src6', 1358000, 10007940, 9468240, 1.057),
  ('src18', 1311900, 9698772, 9164772, 1.0583),
  ('src15', 1309700, 9674436, 9159736, 1.0562),
  ('src19', 1345100, 9946488, 9405388, 1.0575),
  ('src3', 1356700, 10001396, 9450396, 1.0583))
  AS t(source, n_words, n_chars, n_wp_tokens, chars_per_token)
-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST('src7' AS VARCHAR), CAST(1260400 AS BIGINT), CAST(9314252 AS BIGINT), CAST(6298301 AS BIGINT), CAST(1.4789 AS DOUBLE)),
  ('src9', 1328300, 9817304, 6642177, 1.478),
  ('src17', 1357200, 10007436, 6748944, 1.4828),
  ('src12', 1422400, 10487212, 7102504, 1.4766),
  ('src13', 1421400, 10532732, 7098734, 1.4837),
  ('src5', 1437300, 10615824, 7161927, 1.4823),
  ('src4', 1343100, 9925728, 6683139, 1.4852),
  ('src10', 1360800, 10075504, 6807029, 1.4802),
  ('src8', 1439900, 10626412, 7173755, 1.4813),
  ('src0', 1329800, 9857724, 6664808, 1.4791),
  ('src16', 1354100, 9983408, 6731851, 1.483),
  ('src14', 1282300, 9467324, 6395678, 1.4803),
  ('src2', 1372700, 10127776, 6843685, 1.4799),
  ('src1', 1359700, 10027136, 6783193, 1.4782),
  ('src11', 1319600, 9755148, 6580994, 1.4823),
  ('src6', 1358000, 10007940, 6774361, 1.4773),
  ('src18', 1311900, 9698772, 6542588, 1.4824),
  ('src15', 1309700, 9674436, 6541815, 1.4789),
  ('src19', 1345100, 9946488, 6713857, 1.4815),
  ('src3', 1356700, 10001396, 6770250, 1.4773))
  AS t(source, n_words, n_chars, n_uni_tokens, chars_per_token)
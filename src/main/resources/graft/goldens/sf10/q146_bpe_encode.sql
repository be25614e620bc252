-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST('src7' AS VARCHAR), CAST(1260400 AS BIGINT), CAST(9314252 AS BIGINT), CAST(7961607 AS BIGINT), CAST(1.1699 AS DOUBLE)),
  ('src9', 1328300, 9817304, 8400151, 1.1687),
  ('src17', 1357200, 10007436, 8559208, 1.1692),
  ('src12', 1422400, 10487212, 8971724, 1.1689),
  ('src13', 1421400, 10532732, 8986683, 1.172),
  ('src5', 1437300, 10615824, 9080631, 1.1691),
  ('src4', 1343100, 9925728, 8508642, 1.1665),
  ('src10', 1360800, 10075504, 8627860, 1.1678),
  ('src8', 1439900, 10626412, 9086471, 1.1695),
  ('src0', 1329800, 9857724, 8438491, 1.1682),
  ('src16', 1354100, 9983408, 8512418, 1.1728),
  ('src14', 1282300, 9467324, 8084600, 1.171),
  ('src2', 1372700, 10127776, 8670528, 1.1681),
  ('src1', 1359700, 10027136, 8564512, 1.1708),
  ('src11', 1319600, 9755148, 8360012, 1.1669),
  ('src6', 1358000, 10007940, 8562215, 1.1688),
  ('src18', 1311900, 9698772, 8289301, 1.17),
  ('src15', 1309700, 9674436, 8263627, 1.1707),
  ('src19', 1345100, 9946488, 8510443, 1.1687),
  ('src3', 1356700, 10001396, 8554972, 1.1691))
  AS t(source, n_words, n_chars, n_bpe_tokens, chars_per_token)
-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST('src7' AS VARCHAR), CAST(126040 AS BIGINT), CAST(795302 AS BIGINT), CAST(664903 AS BIGINT), CAST(1.1961 AS DOUBLE)),
  ('src9', 132830, 838274, 701315, 1.1953),
  ('src17', 135720, 854166, 714608, 1.1953),
  ('src12', 142240, 895102, 749202, 1.1947),
  ('src13', 142140, 899762, 750445, 1.199),
  ('src5', 143730, 906354, 758695, 1.1946),
  ('src4', 134310, 847518, 710840, 1.1923),
  ('src10', 136080, 860584, 720758, 1.194),
  ('src8', 143990, 907132, 758621, 1.1958),
  ('src0', 132980, 842154, 705315, 1.194),
  ('src16', 135410, 852098, 709782, 1.2005),
  ('src14', 128230, 808244, 674758, 1.1978),
  ('src2', 137270, 864526, 723248, 1.1953),
  ('src1', 135970, 855866, 714446, 1.1979),
  ('src6', 135800, 854130, 715205, 1.1942),
  ('src11', 131960, 832998, 697750, 1.1938),
  ('src19', 134510, 849378, 710807, 1.1949),
  ('src15', 130970, 825996, 690141, 1.1969),
  ('src18', 131190, 828192, 692021, 1.1968),
  ('src3', 135670, 853616, 714426, 1.1948))
  AS t(source, n_words, n_chars, n_bpe_tokens, chars_per_token)
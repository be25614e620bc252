-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST('src7' AS VARCHAR), CAST(126040 AS BIGINT), CAST(795302 AS BIGINT), CAST(504966 AS BIGINT), CAST(1.575 AS DOUBLE)),
  ('src9', 132830, 838274, 532627, 1.5738),
  ('src17', 135720, 854166, 540448, 1.5805),
  ('src12', 142240, 895102, 569336, 1.5722),
  ('src13', 142140, 899762, 569056, 1.5811),
  ('src5', 143730, 906354, 573807, 1.5795),
  ('src4', 134310, 847518, 535259, 1.5834),
  ('src10', 136080, 860584, 545892, 1.5765),
  ('src8', 143990, 907132, 574731, 1.5784),
  ('src0', 132980, 842154, 534742, 1.5749),
  ('src16', 135410, 852098, 539039, 1.5808),
  ('src14', 128230, 808244, 512537, 1.5769),
  ('src2', 137270, 864526, 548383, 1.5765),
  ('src1', 135970, 855866, 543613, 1.5744),
  ('src6', 135800, 854130, 542900, 1.5733),
  ('src11', 131960, 832998, 527374, 1.5795),
  ('src19', 134510, 849378, 538129, 1.5784),
  ('src15', 130970, 825996, 524433, 1.575),
  ('src18', 131190, 828192, 524291, 1.5796),
  ('src3', 135670, 853616, 542623, 1.5731))
  AS t(source, n_words, n_chars, n_uni_tokens, chars_per_token)
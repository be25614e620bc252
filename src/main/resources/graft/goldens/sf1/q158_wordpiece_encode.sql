-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST('src7' AS VARCHAR), CAST(126040 AS BIGINT), CAST(795302 AS BIGINT), CAST(744362 AS BIGINT), CAST(1.0684 AS DOUBLE)),
  ('src9', 132830, 838274, 785034, 1.0678),
  ('src17', 135720, 854166, 799276, 1.0687),
  ('src12', 142240, 895102, 837952, 1.0682),
  ('src13', 142140, 899762, 840782, 1.0701),
  ('src5', 143730, 906354, 849914, 1.0664),
  ('src4', 134310, 847518, 792928, 1.0688),
  ('src10', 136080, 860584, 803944, 1.0705),
  ('src8', 143990, 907132, 849502, 1.0678),
  ('src0', 132980, 842154, 788934, 1.0675),
  ('src16', 135410, 852098, 796888, 1.0693),
  ('src14', 128230, 808244, 758204, 1.066),
  ('src2', 137270, 864526, 809266, 1.0683),
  ('src1', 135970, 855866, 802886, 1.066),
  ('src6', 135800, 854130, 800160, 1.0674),
  ('src11', 131960, 832998, 779428, 1.0687),
  ('src19', 134510, 849378, 795268, 1.068),
  ('src15', 130970, 825996, 774526, 1.0665),
  ('src18', 131190, 828192, 774792, 1.0689),
  ('src3', 135670, 853616, 798516, 1.069))
  AS t(source, n_words, n_chars, n_wp_tokens, chars_per_token)
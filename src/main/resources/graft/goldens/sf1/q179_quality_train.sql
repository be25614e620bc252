-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST(1 AS INT), CAST(36120 AS BIGINT), CAST(0.693147 AS DOUBLE), CAST(1.112 AS DOUBLE), CAST(0.258113 AS DOUBLE), CAST(0.538044 AS DOUBLE), CAST(0.0641 AS DOUBLE)),
  (2, 36120, 0.618063, 0.669928, -0.268155, 0.479106, -0.030747),
  (3, 36120, 0.570174, 0.924346, -0.428516, 0.682738, -0.052318),
  (4, 36120, 0.550461, 0.917795, -0.714924, 0.784163, -0.099779),
  (5, 36120, 0.533299, 1.033552, -0.929014, 0.928917, -0.133237),
  (6, 36120, 0.51759, 1.090619, -1.165406, 1.048599, -0.171664),
  (7, 36120, 0.502898, 1.172363, -1.380637, 1.174757, -0.206337),
  (8, 36120, 0.489098, 1.240232, -1.595314, 1.292977, -0.241359),
  (9, 36350, 0.476119, 1.311776, -1.800415, 1.409946, -0.274912),
  (10, 37220, 0.463906, 1.379149, -2.000407, 1.522823, -0.307868))
  AS t(iter, n_correct, loss, w_bias, w_uniq, w_lntok, w_top)
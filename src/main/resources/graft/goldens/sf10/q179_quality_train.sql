-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST(1 AS INT), CAST(385860 AS BIGINT), CAST(0.693147 AS DOUBLE), CAST(1.3586 AS DOUBLE), CAST(0.409044 AS DOUBLE), CAST(0.624489 AS DOUBLE), CAST(0.091706 AS DOUBLE)),
  (2, 385860, 0.575798, 0.918224, -0.091303, 0.558421, -0.000799),
  (3, 385860, 0.522517, 1.038406, -0.298508, 0.704123, -0.034496),
  (4, 385860, 0.507168, 1.096602, -0.530426, 0.823743, -0.073604),
  (5, 385860, 0.492802, 1.172433, -0.745999, 0.947566, -0.109855),
  (6, 385860, 0.479217, 1.24126, -0.958218, 1.06632, -0.145848),
  (7, 385860, 0.46636, 1.310476, -1.163363, 1.18285, -0.180828),
  (8, 385860, 0.454192, 1.377823, -1.362806, 1.296369, -0.215057),
  (9, 385860, 0.442676, 1.443965, -1.556382, 1.407191, -0.248491),
  (10, 385860, 0.431777, 1.5087, -1.744394, 1.515309, -0.281179))
  AS t(iter, n_correct, loss, w_bias, w_uniq, w_lntok, w_top)
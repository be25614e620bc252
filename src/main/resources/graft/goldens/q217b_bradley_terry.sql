-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST('click' AS VARCHAR), CAST(302.5 AS DOUBLE), CAST(600 AS BIGINT), CAST(1.0134 AS DOUBLE), CAST(3 AS BIGINT)),
  ('error', 311.5, 600, 1.0633, 1),
  ('purchase', 289.0, 600, 0.943, 4),
  ('signup', 310.5, 600, 1.0577, 2),
  ('view', 286.5, 600, 0.9305, 5))
  AS t(item, wins, n_comparisons, rating, rank)
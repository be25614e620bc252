-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST('de' AS VARCHAR), CAST(70 AS BIGINT)),
  ('fr', 64),
  ('es', 40),
  ('zh', 75),
  ('en', 125))
  AS t(lang, n_sampled)
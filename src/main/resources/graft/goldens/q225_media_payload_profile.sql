-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST('video' AS VARCHAR), CAST(166 AS BIGINT), CAST(41417 AS BIGINT), CAST(77159 AS BIGINT), CAST(443509 AS BIGINT)),
  ('image', 167, 41583, 17258, 64629),
  ('audio', 167, 41750, 10780, 28908))
  AS t(kind, n_items, sum_id, decl_units, payload_bytes)
-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST(365 AS BIGINT), CAST(0.37 AS DOUBLE), CAST(1 AS INT)),
  (334, 0.3627, 2),
  (387, 0.3311, 3),
  (423, 0.2969, 4),
  (73, 0.2954, 5))
  AS t(neighbor_id, cosine, rank)
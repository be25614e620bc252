-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(1 AS INT), CAST(365 AS BIGINT), CAST(0.37 AS DOUBLE)),
  (0, 2, 334, 0.3627),
  (0, 3, 387, 0.3311),
  (0, 4, 423, 0.2969),
  (0, 5, 73, 0.2954),
  (1, 1, 386, 0.3715),
  (1, 2, 27, 0.3482),
  (1, 3, 407, 0.327),
  (1, 4, 124, 0.3028),
  (1, 5, 402, 0.2923),
  (2, 1, 117, 0.3181),
  (2, 2, 450, 0.2663),
  (2, 3, 145, 0.2635),
  (2, 4, 188, 0.2633),
  (2, 5, 320, 0.255))
  AS t(query_id, rank, neighbor_id, cosine)
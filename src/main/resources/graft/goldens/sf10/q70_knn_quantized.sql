-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST(148000 AS BIGINT), CAST(0.7992 AS DOUBLE), CAST(1 AS INT)),
  (166000, 0.7846, 2),
  (98000, 0.7841, 3),
  (104000, 0.7731, 4),
  (142000, 0.7725, 5))
  AS t(neighbor_id, cosine, rank)
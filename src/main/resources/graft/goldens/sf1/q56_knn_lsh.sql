-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST(6000 AS BIGINT), CAST(0.7531 AS DOUBLE), CAST(1 AS INT)),
  (16000, 0.7424, 2),
  (18000, 0.7163, 3),
  (12000, 0.7072, 4),
  (8000, 0.7045, 5))
  AS t(neighbor_id, cosine, rank)
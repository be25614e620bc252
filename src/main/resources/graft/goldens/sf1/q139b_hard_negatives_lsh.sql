-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(1 AS INT), CAST(5204 AS BIGINT), CAST(0.4646 AS DOUBLE)),
  (0, 2, 18142, 0.4262),
  (0, 3, 14633, 0.4166),
  (0, 4, 12647, 0.413),
  (0, 5, 11270, 0.4125),
  (1, 1, 9175, 0.5145),
  (1, 2, 3175, 0.4901),
  (1, 3, 15225, 0.4369),
  (1, 4, 10529, 0.4084),
  (1, 5, 15189, 0.4073),
  (2, 1, 6315, 0.4479),
  (2, 2, 17944, 0.4248),
  (2, 3, 14505, 0.4095),
  (2, 4, 10639, 0.4087),
  (2, 5, 2205, 0.402))
  AS t(query_id, rank, neighbor_id, cosine)
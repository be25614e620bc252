-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(1 AS INT), CAST(116387 AS BIGINT), CAST(0.4892 AS DOUBLE)),
  (0, 2, 188721, 0.4745),
  (0, 3, 40310, 0.471),
  (0, 4, 93422, 0.4652),
  (0, 5, 5204, 0.4646),
  (1, 1, 9175, 0.5145),
  (1, 2, 150638, 0.5025),
  (1, 3, 112273, 0.4928),
  (1, 4, 3175, 0.4901),
  (1, 5, 117608, 0.4843),
  (2, 1, 79704, 0.4812),
  (2, 2, 162953, 0.4779),
  (2, 3, 86123, 0.4755),
  (2, 4, 87781, 0.4747),
  (2, 5, 74255, 0.4724))
  AS t(query_id, rank, neighbor_id, cosine)
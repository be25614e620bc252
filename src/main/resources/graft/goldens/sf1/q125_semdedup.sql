-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST(145 AS BIGINT), CAST(2607 AS BIGINT), CAST(2419 AS BIGINT), CAST(188 AS BIGINT)),
  (58, 2445, 2241, 204),
  (174, 2611, 2418, 193),
  (116, 2339, 2148, 191),
  (29, 2390, 2185, 205),
  (87, 2514, 2322, 192),
  (203, 2581, 2394, 187),
  (0, 2513, 2330, 183))
  AS t(cent_id, n_members, n_pruned, n_kept)
-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST(145 AS BIGINT), CAST(25243 AS BIGINT), CAST(25063 AS BIGINT), CAST(180 AS BIGINT)),
  (58, 24864, 24649, 215),
  (174, 25833, 25638, 195),
  (116, 24493, 24296, 197),
  (29, 24530, 24313, 217),
  (87, 24772, 24583, 189),
  (203, 25463, 25273, 190),
  (0, 24802, 24618, 184))
  AS t(cent_id, n_members, n_pruned, n_kept)
-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(24802 AS BIGINT), CAST(0.1967 AS DOUBLE), CAST(23836.73 AS DOUBLE)),
  (29, 24530, 0.2019, 23521.57),
  (58, 24864, 0.1943, 23909.62),
  (87, 24772, 0.2003, 23782.14),
  (116, 24493, 0.1908, 23598.9),
  (145, 25243, 0.1965, 24257.23),
  (174, 25833, 0.2034, 24754.33),
  (203, 25463, 0.1975, 24458.12))
  AS t(cent_id, n_members, cnorm, sse)
-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST(12000 AS INT), CAST(3333 AS BIGINT), CAST(214971 AS BIGINT), CAST(3522122687 AS BIGINT)),
  (14000, 3333, 218319, 3576963283),
  (16000, 3334, 221711, 3632460363),
  (10000, 3334, 211709, 3468580656),
  (8000, 3333, 208320, 3413201597))
  AS t(sample_rate, n_clips, total_frames, sum_abs)
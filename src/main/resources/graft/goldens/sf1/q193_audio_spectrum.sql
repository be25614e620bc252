-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST(8000 AS INT), CAST(6 AS INT), CAST(3333 AS BIGINT), CAST(93796401718486 AS BIGINT), CAST(170809290726048 AS BIGINT)),
  (14000, 6, 3333, 93824978693080, 170861493564396),
  (10000, 6, 3334, 93840231811326, 170724136228173),
  (12000, 6, 3333, 93830377885007, 170681507597828),
  (16000, 6, 3334, 93823146733415, 170878201412934))
  AS t(sample_rate, dom_bin, n_clips, sum_peak, sum_power)
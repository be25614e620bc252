-- Pinned sf10 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf10 100 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf10, then tools/pin_goldens.py --scale sf10.
SELECT * FROM (VALUES
  (CAST(12000 AS INT), CAST(33333 AS BIGINT), CAST(2149971 AS BIGINT), CAST(35225109915 AS BIGINT)),
  (14000, 33333, 2183319, 35771517833),
  (16000, 33334, 2216711, 36318586697),
  (10000, 33334, 2116709, 34680167808),
  (8000, 33333, 2083320, 34133136683))
  AS t(sample_rate, n_clips, total_frames, sum_abs)
-- Pinned sf0.01 golden (deterministic; verified bit-stable across 2/4/8-CPU runs).
-- Regenerate: dump via graft.Verify at sf0.01, then tools/pin_goldens.py.
SELECT * FROM (VALUES
  (CAST(8000 AS INT), CAST(6 AS INT), CAST(33 AS BIGINT), CAST(927681270146 AS BIGINT), CAST(1701832714589 AS BIGINT)),
  (10000, 6, 34, 958486096045, 1747795151547),
  (12000, 6, 33, 929676933825, 1689433464154),
  (14000, 6, 33, 931622936606, 1680963545590),
  (16000, 6, 34, 957698581087, 1740790709355))
  AS t(sample_rate, dom_bin, n_clips, sum_peak, sum_power)
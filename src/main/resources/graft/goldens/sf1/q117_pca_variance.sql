-- Pinned sf1 golden (deterministic; verified bit-stable across 8/32-CPU runs).
-- Valid ONLY against the canonical corpus: graft.GenData /root/testdata/sf0.1 testdata/sf1 10 (default dense/disjoint modes).
-- Regenerate: graft.Verify at testdata/sf1, then tools/pin_goldens.py --scale sf1.
SELECT * FROM (VALUES
  (CAST(1 AS INT), CAST(0.01903 AS DOUBLE), CAST(0.019 AS DOUBLE)),
  (2, 0.01885, 0.0379),
  (3, 0.0185, 0.0564),
  (4, 0.01816, 0.0746),
  (5, 0.01812, 0.0927),
  (6, 0.01798, 0.1107),
  (7, 0.01784, 0.1285),
  (8, 0.01774, 0.1463))
  AS t(component, eigenvalue, cum_ratio)
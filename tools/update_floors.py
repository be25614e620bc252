#!/usr/bin/env python3
"""Maintain src/main/resources/graft/bench_floors.txt.

The bench starvation protocol (Bench.scala) reruns a query only when its
wall exceeds 2x its historical floor AND an adjacent parallel-spin probe
shows withheld cycles. Queries with no floor row are never protected, so
every registered query needs one -- PlanQualitySpec asserts that.

Usage:
    python3 tools/update_floors.py BENCH_local.json [more BENCH_*.json ...]

For every query in the given artifacts (sf0.1 runs only -- floors are
sf0.1 measurements), takes min(existing floor, artifact wall) for known
queries and appends new queries at their artifact wall. Rewrites the file
in place, preserving the header comment. Refuses artifacts whose "sf"
field is not an sf0.1 directory, and warns when a run looks starved
(calibration markers > 1.6x the ~250 ms parallel-spin steady state) --
a starved wall is a valid (if loose) INITIAL floor for a new query, but
never lowers an existing one (min() already guarantees that).
"""
import json
import sys

FLOORS = "src/main/resources/graft/bench_floors.txt"


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2

    with open(FLOORS) as f:
        lines = f.read().splitlines()
    header = [l for l in lines if l.startswith("#")]
    floors = {}
    for l in lines:
        if l.startswith("#") or not l.strip():
            continue
        name, val = l.split(" ")
        floors[name] = float(val)

    for path in sys.argv[1:]:
        with open(path) as f:
            art = json.load(f)
        sf = art.get("sf", "")
        if "sf0.1" not in sf:
            print(f"SKIP {path}: sf={sf!r} is not an sf0.1 run (floors are sf0.1-only)")
            continue
        for v in art.get("calib_par_ms", []):  # [before, after] spin markers
            if isinstance(v, (int, float)) and v > 1.6 * 250:
                print(f"WARN {path}: calib_par_ms={art['calib_par_ms']} looks starved; "
                      "walls are upper bounds")
        queries = art.get("queries", {})
        for name, wall in sorted(queries.items()):
            # rerun-protocol artifacts store per-query detail as a list
            # [wall, cpu, ...]; plain artifacts store a bare number
            w = wall[0] if isinstance(wall, list) else wall
            if not isinstance(w, (int, float)):
                continue
            if name in floors:
                if w < floors[name]:
                    print(f"lower {name}: {floors[name]} -> {w}")
                    floors[name] = w
            else:
                print(f"new   {name}: {w}")
                floors[name] = w

    with open(FLOORS, "w") as f:
        f.write("\n".join(header) + "\n")
        for name in sorted(floors):
            f.write(f"{name} {floors[name]}\n")
    print(f"wrote {FLOORS}: {len(floors)} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())

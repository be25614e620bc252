#!/usr/bin/env python3
"""Close-out check: every registered query name must grep in SURVEY.md
(the judged fresh-context contract — VERDICT r09 found q54 registered,
passing, and undocumented).

Usage: run graft.Verify (any scale, any SPARK_GRAFT_ONLY-free run) first,
or point at an existing dump:
    python3 tools/check_survey.py [voutDir]
Defaults to reading names from the freshest CORRECTNESS_r*.json if no
dump is given. Exits nonzero listing any name missing from SURVEY.md.
"""
import glob, json, os, re, sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
survey = open(os.path.join(repo, "SURVEY.md"), encoding="utf-8").read()

if len(sys.argv) > 1:
    names = sorted(json.load(open(os.path.join(sys.argv[1], "oracle_sql.json"))))
else:
    latest = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))[-1]
    names = sorted(json.load(open(latest)))

missing = [n for n in names if n not in survey]
print(f"{len(names) - len(missing)}/{len(names)} registered names grep in SURVEY.md")
if missing:
    print("MISSING:", *missing, sep="\n  ")
    sys.exit(1)

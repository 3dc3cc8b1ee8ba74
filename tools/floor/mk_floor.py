#!/usr/bin/env python3
"""Fold the isolated min-of-6 raw lines into FLOOR.json — the committed
per-query floor table future mover adjudication diffs against
(SCALE.md r16; the r15 verdict's 'make mover adjudication mechanical')."""
import json, re, sys

raw = open('/root/repo/tools/floor/floor_raw_r16.txt').read()
floors = {}
for block in re.findall(r'=== (\S+) ===\n(\{.*)', raw):
    name, line = block
    d = json.loads(line)
    floors[name] = d['slowest'][name]
out = {
    "protocol": "one JVM per query, min-of-6 reps inside that JVM, "
                "32 cpus, sf0.1, fixtures warmed separately "
                "(SCALE.md r12/r15 isolation recipe)",
    "round": 16,
    "floors_sec": dict(sorted(floors.items())),
}
json.dump(out, open('/root/repo/FLOOR.json', 'w'), indent=2)
print(json.dumps(out, indent=2))

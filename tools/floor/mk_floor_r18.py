#!/usr/bin/env python3
"""Merge the r18 floor extension into FLOOR.json and record the r18
adjudication: the m1_auto_order 12-rep A/B (the one r17 over-band
reading, on code untouched since r13) plus min-of-6 floor rows for the
two owed diagnostics (bitext_auto_sampled, bitext_banded_recall), the
three ops whose implementation changed this round (hashed gram keys /
single-pass Gopher derivation), and the three new r18 queries."""
import json, re

old = json.load(open('/root/repo/FLOOR.json'))
floors = dict(old['floors_sec'])


def parse(path):
    raw = open(path).read()
    out = {}
    for name, line in re.findall(r'=== (\S+) ===\n(\{.*)', raw):
        out[name] = json.loads(line)['slowest'][name]
    return out


r18 = parse('/root/repo/tools/floor/floor_raw_r18.txt')
ab = parse('/root/repo/tools/floor/floor_ab_r18.txt')
floors.update(r18)
# supersedes raw_r18's quality_gopher_repetition 15.09: that reading
# measured the dynamic-n single-pass derivation, which the r18
# decomposition probe showed 3x slower than literal-n passes (SCALE.md
# r18) — the committed operator reverted to per-n passes (hashed keys,
# arithmetic glen) and re-floored below the r17 floor
floors.update(parse('/root/repo/tools/floor/floor_raw_r18b.txt'))
# the late-round pick-roundtrip query (lands in the slowest map: the
# persist leg runs the full diagnostic once per bench run)
floors.update(parse('/root/repo/tools/floor/floor_raw_r18c.txt'))

sent = (" r18 floors (and the r18 A/B) were measured on a quiet box"
        " between build phases; min-of-6/12 absorbs transient"
        " contention — upper bounds like the rest.")
out = {
    "protocol": old["protocol"],
    "round": 18,
    "floors_sec": dict(sorted((k, round(v, 3)) for k, v in floors.items())),
    # append-once: rerunning the merge must not grow the committed note
    "note": old["note"] + ("" if "r18 floors" in old["note"] else sent),
    "mover_adjudication_r16": old.get("mover_adjudication_r16", {}),
    "mover_adjudication_r17": old.get("mover_adjudication_r17", {}),
    "mover_adjudication_r18": {
        "over_band_readings_12rep": {
            "m1_auto_order": {
                "r17_driver": 19.768, "r17_floor": 12.557,
                "isolated_min12_head": ab["m1_auto_order"],
                "verdict": "environmental: 12-rep HEAD %.2fx the floor,"
                           " inside the 1.5x band, on code untouched"
                           " since r13 — the driver reading was box"
                           " contention" % (ab["m1_auto_order"] / 12.557),
            }
        },
        "refloored_after_implementation_change_r18": [
            "dedup_exact_substring", "quality_gopher_repetition",
            "dedup_exact_substring_incr"
        ],
    },
}
json.dump(out, open('/root/repo/FLOOR.json', 'w'), indent=1)
print(json.dumps({k: v for k, v in out["floors_sec"].items()
                  if k in r18 or k == "m1_auto_order"}, indent=1))

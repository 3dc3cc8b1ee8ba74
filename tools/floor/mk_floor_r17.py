#!/usr/bin/env python3
"""Merge the r16 floor table with the r17 extension (every query that has
ever appeared in a driver `slowest` map) and record the r17 mover
adjudications. Floors are min-of-6 in one fresh JVM; queries re-measured
in r17 (ann_serve_mode grew two compressed-mode legs) take the r17 row."""
import json, re

old = json.load(open('/root/repo/FLOOR.json'))
floors = dict(old['floors_sec'])

def parse(path):
    raw = open(path).read()
    out = {}
    for name, line in re.findall(r'=== (\S+) ===\n(\{.*)', raw):
        out[name] = json.loads(line)['slowest'][name]
    return out

r17 = parse('/root/repo/tools/floor/floor_raw_r17.txt')
ab = parse('/root/repo/tools/floor/floor_ab_r17.txt')
floors.update(r17)
# late-round remeasures: the new refresh_compact_graph query,
# bitext_auto after the mined-frame reuse (14.57 -> 12.76), and
# ann_serve_mode at its final 7-mode shape
floors.update(parse('/root/repo/tools/floor/floor_raw_r17b.txt'))
floors.update(parse('/root/repo/tools/floor/floor_raw_r17c.txt'))
floors.update(parse('/root/repo/tools/floor/floor_raw_r17d.txt'))
floors.update(parse('/root/repo/tools/floor/floor_raw_r17e.txt'))

out = {
    "protocol": old["protocol"],
    "round": 17,
    "floors_sec": dict(sorted((k, round(v, 3)) for k, v in floors.items())),
    # append-once: rerunning the merge must not grow the committed note
    "note": old["note"] + ("" if "r17 floors were measured" in old["note"]
            else " r17 floors were measured while the build's "
            "test suite shared the box (min-of-6/12 absorbs transient "
            "contention; treat them as upper bounds like the rest)."),
    "mover_adjudication_r16": old.get("mover_adjudication_r16", {}),
    "mover_adjudication_r17": {
        "wild_movers_no_floor_row": {
            q: {"r16_driver": d, "isolated_min6_head": r17[q],
                "verdict": "environmental (driver reading %.0fx the isolated"
                           " floor on untouched code; builder close-out was"
                           " normal)" % (d / r17[q])}
            for q, d in [("vocab_growth_curve", 13.74), ("o5_first_valid", 9.78),
                          ("m5_recovery_candidates", 11.15),
                          ("split_leakproof", 5.16), ("lsh_planner", 4.22)]
        },
        "over_band_readings_12rep": {
            q: {"r16_driver": d, "r16_floor": f,
                "isolated_min12_head": ab[q],
                "verdict": v}
            for q, d, f, v in [
                ("bpe_vocab_drift", 27.96, 10.567,
                 "no regression: 12-rep HEAD below the r16 min-of-6 floor"),
                ("bpe_learn_by_lang", 11.34, 6.783,
                 "no regression: 12-rep HEAD below the r16 min-of-6 floor"),
                ("text_dialogue_chains", 9.99, 5.988,
                 "no regression: 12-rep HEAD 1.2x floor, inside the 1.5x band")]
        },
    },
}
json.dump(out, open('/root/repo/FLOOR.json', 'w'), indent=2)
print(json.dumps({k: out[k] for k in ("round", "floors_sec")}, indent=2))

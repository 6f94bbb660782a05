#!/usr/bin/env python3
"""Fold a sweep's per-gate medians into the committed floor table.

Usage:
  tools/fold_floors.py <record.json> <sf>            # min-fold every gate
  tools/fold_floors.py <record.json> <sf> --replace g1,g2
      # additionally REPLACE the named gates' floors with the record's
      # value even when it is HIGHER — the re-baselining path for floors
      # the provenance sidecar flags as never-reproduced lucky minima
      # (a floor no sweep ever lands near only burns escalation budget)

<record.json> is a Bench emit (bench_full.json or a BENCH_*.json with a
"queries" map); <sf> picks the floor table (sf0.1 / sf1). The floor
table stays a per-gate MINIMUM otherwise: measurement contamination only
ever inflates, so min across clean records is the best attested cost.
Always regenerates the provenance sidecars afterwards so the committed
"where did this floor come from" record can't drift (the r15 lesson,
enforced at commit time by tools/presnapshot.sh).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    record_path, sf = sys.argv[1], sys.argv[2]
    replace = set()
    extra = sys.argv[3:]
    if extra:
        # strict: a mistyped/incomplete --replace silently min-folding
        # would leave the operator believing a re-baseline happened
        if len(extra) != 2 or extra[0] != "--replace" or not extra[1]:
            print(f"unrecognized arguments: {' '.join(extra)}\n")
            print(__doc__)
            return 2
        replace = set(extra[1].split(","))

    rec = json.load(open(record_path))
    queries = rec["queries"] if "queries" in rec else rec
    floor_path = os.path.join(
        REPO, f"src/main/resources/bench_expected_{sf}.json")
    floors = json.load(open(floor_path))

    folded, replaced = [], []
    for g, v in queries.items():
        v = float(v)
        if v <= 0:
            continue  # crashed child sentinel
        if g in replace:
            if abs(floors.get(g, -1) - v) > 1e-9:
                replaced.append((g, floors.get(g), v))
                floors[g] = v
        elif g not in floors or v < floors[g] - 1e-9:
            folded.append((g, floors.get(g), v))
            floors[g] = v

    with open(floor_path, "w") as fh:
        fh.write("{\n")
        fh.write(",\n".join(
            f' "{g}": {floors[g]}' for g in sorted(floors)))
        fh.write("\n}\n")

    for g, old, new in folded:
        print(f"fold {g}: {old} -> {new}")
    for g, old, new in replaced:
        print(f"REPLACE {g}: {old} -> {new}")
    if not folded and not replaced:
        print("no floors changed")
    subprocess.run([sys.executable,
                    os.path.join(REPO, "tools/floor_provenance.py")],
                   check=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Regenerate the floor-provenance sidecars
src/main/resources/bench_floor_provenance_{sf0.1,sf1}.json.

A committed floor (bench_expected_<sf>.json) is the per-gate MINIMUM
folded across every recorded sweep, so one lucky sample becomes a bar
every later sweep reads >2x of -- and each such gate burns a child JVM
(or several) of the bench's escalation budget chasing noise. The sidecar
gives each floor provenance and a reproduction verdict:

  gate -> {
    "src":   short hash + date of the commit that introduced the CURRENT
             floor value into the floor file,
    "repro": did any OTHER recorded observation of the gate land within
             1.5x of the floor -- where observations are (a) every
             historical value of the gate in the floor file itself (each
             committed floor value was attested by some sweep before it
             was folded), (b) every git version of the curated
             sweep-of-record BENCH_<sf>.json (+ the working-tree copy and
             bench_full.json for sf0.1), and (c) for sf0.1 the driver
             round records BENCH_r*.json (headline maps -- partial but
             real driver-host medians).
  }

Bench.scala loads the sidecar and lists repro=false floors on stderr so
a reader of the bench log can discount their "violations". Run this
after folding new minima into the floor files.
"""
import json
import re
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def git(*args):
    return subprocess.run(["git", "-C", REPO] + list(args),
                          capture_output=True, text=True).stdout


def versions(path):
    """All git versions of path, newest first: [(short_hash, date, text)]."""
    out = []
    log = git("log", "--format=%h %ad", "--date=short", "--", path)
    for line in log.splitlines():
        h, d = line.split(" ", 1)
        txt = git("show", f"{h}:{path}")
        if txt:
            out.append((h, d, txt))
    return out


def parse_queries(txt):
    """Per-gate values from a floor table or a bench record line."""
    try:
        j = json.loads(txt)
    except json.JSONDecodeError:
        return {}
    if "queries" in j and isinstance(j["queries"], dict):
        return {k: float(v) for k, v in j["queries"].items()}
    return {k: float(v) for k, v in j.items() if isinstance(v, (int, float))}


def main():
    for sf in ["sf0.1", "sf1"]:
        floor_path = f"src/main/resources/bench_expected_{sf}.json"
        floors_now = parse_queries(open(os.path.join(REPO, floor_path)).read())
        hist = versions(floor_path)

        # provenance: oldest commit of the contiguous HEAD-equal run
        src = {}
        for gate, v in floors_now.items():
            intro = None
            for h, d, txt in hist:  # newest -> oldest
                vals = parse_queries(txt)
                if gate in vals and abs(vals[gate] - v) < 1e-9:
                    intro = (h, d)
                elif gate in vals:
                    break  # value differed before this point
            src[gate] = intro or ("worktree", "uncommitted")

        # observations: historical floor values (minus one instance of the
        # introducing value -- the min itself), sweep-of-record versions,
        # and driver round records for the driver's scale
        obs = {g: [] for g in floors_now}
        for _, _, txt in hist:
            for g, v in parse_queries(txt).items():
                if g in obs:
                    obs[g].append(v)
        record_files = [f"BENCH_{sf}.json"]
        extra_texts = []
        if sf == "sf0.1":
            extra_texts.append(open(os.path.join(REPO, "bench_full.json")).read()
                               if os.path.exists(os.path.join(REPO, "bench_full.json")) else "")
            for f in sorted(os.listdir(REPO)):
                if re.fullmatch(r"BENCH_r\d+\.json", f):
                    record_files.append(f)
        for rf in record_files:
            for _, _, txt in versions(rf):
                for g, v in parse_queries(txt).items():
                    if g in obs:
                        obs[g].append(v)
            p = os.path.join(REPO, rf)
            if os.path.exists(p):
                extra_texts.append(open(p).read())
        for txt in extra_texts:
            for g, v in parse_queries(txt).items():
                if g in obs:
                    obs[g].append(v)
        # committed attestation log (tools/attest.py): targeted
        # ground-truth reruns are the best measurements we take, but
        # before r16 they lived only in session logs -- a floor could be
        # re-attested three times in a day and still read "never
        # reproduced". Format: {gate: [seconds, ...]}, append-only.
        att_path = os.path.join(REPO, f"tools/bench_attestations_{sf}.json")
        if os.path.exists(att_path):
            for g, vs in json.load(open(att_path)).items():
                if g in obs:
                    obs[g].extend(float(v) for v in vs)

        prov = {}
        for gate in sorted(floors_now):
            f = floors_now[gate]
            vals = sorted(obs[gate])
            # reproduction = an observation STRICTLY above the floor but
            # within 1.5x of it. Exact floor matches don't count: floors
            # are folded from these very records (and carried forward
            # commit-to-commit), so an exact match is almost always the
            # floor's own source, not an independent measurement --
            # conservative in the right direction (flags possibly-stale
            # floors rather than masking them).
            independent = sum(
                1 for v in vals if f + 1e-9 < v <= 1.5 * f + 1e-9)
            h, d = src[gate]
            prov[gate] = {"src": f"{h} {d}", "repro": independent > 0}

        out_path = os.path.join(
            REPO, f"src/main/resources/bench_floor_provenance_{sf}.json")
        with open(out_path, "w") as fh:
            fh.write("{\n")
            fh.write(",\n".join(
                f'  "{g}": {{"src": "{p["src"]}", '
                f'"repro": {str(p["repro"]).lower()}}}'
                for g, p in prov.items()))
            fh.write("\n}\n")
        stale = [g for g, p in prov.items() if not p["repro"]]
        print(f"{sf}: {len(prov)} floors, {len(stale)} never reproduced "
              f"within 1.5x: {','.join(stale) if stale else '-'}")


if __name__ == "__main__":
    sys.exit(main())

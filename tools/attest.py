#!/usr/bin/env python3
"""Record a targeted Bench run in the committed attestation log.

Usage:
  tools/attest.py <bench_full.json> <sf>

Appends every per-gate value from a TARGETED Bench record (a run whose
gates you measured deliberately, e.g. `runMain graft.Bench =gate`) to
`tools/bench_attestations_<sf>.json` — an append-only {gate: [seconds]}
log that tools/floor_provenance.py counts as reproduction observations.
Targeted fresh-JVM reruns are the ground-truth measurements this repo
trusts most (SCALING.md "Sweep-measurement honesty"), but until r16
they lived only in session logs, so a floor could be re-attested
repeatedly and still be flagged "never reproduced" by the sidecar.

Only feed this deliberate measurements: the log is evidence, and a
contaminated mid-sweep median recorded here would launder noise into
floor provenance. Regenerates the provenance sidecars afterwards.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    record_path, sf = sys.argv[1], sys.argv[2]
    rec = json.load(open(record_path))
    queries = rec["queries"] if "queries" in rec else rec
    log_path = os.path.join(REPO, f"tools/bench_attestations_{sf}.json")
    log = json.load(open(log_path)) if os.path.exists(log_path) else {}
    for g, v in queries.items():
        v = float(v)
        if v <= 0:
            continue
        log.setdefault(g, []).append(round(v, 3))
        print(f"attest {g}: {v} (now {len(log[g])} attestations)")
    with open(log_path, "w") as fh:
        fh.write("{\n")
        fh.write(",\n".join(
            f' "{g}": {json.dumps(log[g])}' for g in sorted(log)))
        fh.write("\n}\n")
    subprocess.run([sys.executable,
                    os.path.join(REPO, "tools/floor_provenance.py")],
                   check=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

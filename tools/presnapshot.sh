#!/usr/bin/env bash
# Pre-snapshot guard: never let an unbuilt or unverified edit reach the
# end-of-round commit. Rounds 9 and 10 were both lost to a final edit
# that had never been compiled; this script makes that impossible.
#
# Usage:
#   tools/presnapshot.sh                 # compile only (fast gate)
#   tools/presnapshot.sh q_gini pl_mm    # compile + targeted verify of
#                                        #   the named gate substrings
#   tools/presnapshot.sh --full          # compile + full 227-gate verify
#
# Exit 0 = safe to snapshot. Any non-zero = DO NOT COMMIT.
set -euo pipefail
cd "$(dirname "$0")/.."

# Floor-provenance freshness: the sidecars must always be regenerated
# from the current tree + history — r15 folded new minima without a
# matching provenance run, and r16 committed an sf1 sidecar generated
# BEFORE its floor fold was committed (src read "worktree uncommitted"
# forever after). Cheap (~2 s), so run unconditionally; when a floor
# fold is being committed right now, the src field can only name the
# commit after it exists — re-run this script once post-commit to
# finalize those entries (it will flag them below until you do).
echo "== presnapshot: regenerating floor-provenance sidecars =="
python3 tools/floor_provenance.py
if grep -q "worktree uncommitted" \
    src/main/resources/bench_floor_provenance_sf*.json; then
  echo "== presnapshot: NOTE — some floors are uncommitted; re-run this"
  echo "   script after committing them so provenance records the commit =="
fi

echo "== presnapshot: sbt compile =="
sbt -batch compile

if [ "$#" -eq 0 ]; then
  echo "== presnapshot: compile green, no gates requested — OK =="
  exit 0
fi

OUT=/tmp/presnapshot_verify
rm -rf "$OUT"
if [ "${1:-}" = "--full" ]; then
  echo "== presnapshot: full verify at sf0.01 =="
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT"
else
  echo "== presnapshot: targeted verify of: $* =="
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT $*"
fi

echo "== presnapshot: oracle check =="
python3 tools/check.py /root/testdata/sf0.01 "$OUT"
echo "== presnapshot: OK =="

#!/bin/bash
# r16 measurement campaign (run serially, idle machine). Everything
# below was executed on 2026-08-16 on a ~1.3x-slow host (cal 0.323 vs
# the 0.249 quiet-host reference); numbers in SCALING.md "r16".
set -x
cd /root/repo
run() { # run <sfdir> [gates...]
  local sf="$1"; shift
  SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench $*" 2>/dev/null | grep '"metric"'
}

# 1. Re-attest the two sf0.1 floors the provenance sidecar flagged
#    (3 targeted fresh-JVM runs each; the full sweep below reproduced
#    both floors in-sweep, so they were re-attested, not replaced)
for i in 1 2 3; do run /root/testdata/sf0.1 =pl_e2e_curation; done
for i in 1 2 3; do run /root/testdata/sf0.1 =pl_neardup_edit; done

# 2. Full official-profile sweep at r16 HEAD -> BENCH_sf0.1.json
#    (validates the host-normalized escalation: 11 queued vs r15's 44,
#    all ground-truthed, rc=0)
run /root/testdata/sf0.1

# 3. Ground-truth the one contended-children row the sweep produced
for i in 1 2 3; do run /root/testdata/sf0.1 =pl_soft_dedup; done

# 4. Re-attest the four sf1 floors the sidecar flagged (attested via
#    tools/attest.py; minima folded via tools/fold_floors.py)
for i in 1 2 3; do
  run /dev/shm/sf1 =pl_dedup_incr_fixed =pl_dedup_simhash_auto \
    =pl_neardup_edit =pl_unigram_train
done

# 5. Simhash multi-index A/B (pigeonhole 4x15 vs combinatorial
#    C(6,3)x10): candidate mass + staged wall-clock at sf1/sf10 via a
#    throwaway ProbeSim main (numbers + verdict in SCALING.md; the
#    combo scheme ships as the opt-in `blocks` lever, default off)
run /root/testdata/sf0.1 =pl_dedup_simhash
run /dev/shm/sf1 =pl_dedup_simhash
run /dev/shm/sf10 =pl_dedup_simhash

git checkout bench_full.json

#!/bin/bash
# Evidence part 2 (resumes after the goldens + Pallas probe of
# tpu_evidence.sh): device kernel rates and the flagship ctr k=21 run
# on the chip. KMERTOOLS_CTR_TARGET=262144 keeps the accumulator's
# merge sort at ~4.2M elements — the 16.7M sort of the default 1<<20
# target took >50 min of remote compile and is not worth the wait for
# evidence runs (runtime is HBM-bound either way; the smaller batches
# only add dispatch overhead).
set -uo pipefail
export PYTHONPATH=/root/repo:/root/.axon_site
export KMERTOOLS_QUIET=1
export KMERTOOLS_CTR_TARGET=262144
LOG=${1:-/root/repo/evidence/TPU_r03.log}
WORK=$(mktemp -d /dev/shm/ktev.XXXXXX)
cd "$WORK"

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
run() { log "RUN: $*"; "$@" >>"$LOG" 2>&1; local rc=$?; log "rc=$rc"; return $rc; }
PASS=0; FAIL=0
check() { local name=$1; shift
  if run "$@"; then log "PASS $name"; PASS=$((PASS+1));
  else log "FAIL $name"; FAIL=$((FAIL+1)); fi; }

log "=== TPU evidence part 2: $(date -u) ==="
check kernel_rates timeout 3000 python /root/repo/scripts/kernel_rates.py

log "generating 15 Mbase corpus"
run python /root/repo/scripts/make_corpus.py corpus.fa 3000 5000
mkdir -p ctr_tpu ctr_host
log "ctr k=21 on accelerator (KMERTOOLS_NO_HETERO=1 pins the device engine)"
check ctr_tpu bash -c "KMERTOOLS_NO_HETERO=1 timeout 3000 python -c '
import time
t0=time.time()
from kmertools_tpu.workloads.counter import CountComputer
import jax
print(\"backend:\", jax.devices()[0].platform)
c = CountComputer(\"corpus.fa\", \"ctr_tpu\", 21)
c.count_and_merge(True)
print(\"ctr-tpu wall %.2fs used_mesh=%s\" % (time.time()-t0, c.used_mesh))
'"
log "ctr k=21 host reference run (cpu backend, native engine)"
check ctr_host bash -c "KMERTOOLS_PLATFORM=cpu timeout 1200 python -c '
import time
t0=time.time()
from kmertools_tpu.workloads.counter import CountComputer
c = CountComputer(\"corpus.fa\", \"ctr_host\", 21)
c.count_and_merge(True)
print(\"ctr-host wall %.2fs\" % (time.time()-t0,))
'"
check ctr_cmp cmp ctr_tpu/kmers.counts ctr_host/kmers.counts
run bash -c "wc -l ctr_tpu/kmers.counts; du -h ctr_tpu/kmers.counts"

log "=== PART2 DONE: $PASS passed, $FAIL failed ==="
rm -rf "$WORK"

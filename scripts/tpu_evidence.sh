#!/bin/bash
# Real-TPU evidence run (rounds 3+): golden byte-compares, Pallas Mosaic
# lowering, device kernel rates, and the flagship ctr k=21 device-engine
# run — all on the live accelerator backend (axon). Logs everything.
# Run TPU jobs ONE AT A TIME (the remote compile service serialises).
set -uo pipefail
export PYTHONPATH=/root/repo:/root/.axon_site
export KMERTOOLS_QUIET=1
TD=/root/reference/test_data
LOG=${1:-/root/repo/evidence/TPU_r03.log}
mkdir -p "$(dirname "$LOG")"
WORK=$(mktemp -d /dev/shm/ktev.XXXXXX)
cd "$WORK"

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
run() { log "RUN: $*"; "$@" >>"$LOG" 2>&1; local rc=$?; log "rc=$rc"; return $rc; }

PASS=0; FAIL=0
check() { # check NAME cmd...
  local name=$1; shift
  if run "$@"; then log "PASS $name"; PASS=$((PASS+1));
  else log "FAIL $name"; FAIL=$((FAIL+1)); fi
}

log "=== TPU evidence round 3: $(date -u) ==="
run python -c "import jax; d=jax.devices(); print([str(x) for x in d], d[0].platform, d[0].device_kind)"

# --- 1. golden byte-compares on the live backend ---------------------
check oligo_fa timeout 1500 python -m kmertools_tpu comp oligo -i $TD/reads.fa -o fa.kmers -k 4
check oligo_fa_cmp cmp fa.kmers $TD/expected_fa.kmers
check oligo_gz timeout 900 python -m kmertools_tpu comp oligo -i $TD/reads.fq.gz -o gz.kmers -k 4
check oligo_gz_cmp cmp gz.kmers $TD/expected_fa.kmers
check oligo_stdin timeout 900 bash -c "cat $TD/reads.fq | python -m kmertools_tpu comp oligo -i - -o sin.kmers -k 4"
check min_s2m timeout 1500 python -m kmertools_tpu min -i $TD/reads.fq -o seq_min -m 7 -w 31 -p s2m
check min_s2m_cmp bash -c "diff <(sed 's/[[:space:]]*\$//' seq_min | sort) <(sed 's/[[:space:]]*\$//' $TD/expected_seq_minimisers | sort)"
check min_m2s timeout 900 python -m kmertools_tpu min -i $TD/reads.fq -o mins -m 10 -w 0 -p m2s
check min_m2s_cmp bash -c "diff <(sort mins) <(sort $TD/expected_minimisers)"
check ctr_goldens timeout 1500 python /root/repo/scripts/ev_ctr_goldens.py
check cov_golden timeout 1500 python /root/repo/scripts/ev_cov_golden.py
check cgr timeout 1500 python -m kmertools_tpu comp cgr -i $TD/reads.fq -o reads.cgr
check cgr_cmp cmp reads.cgr $TD/expected_reads.cgr

# --- 2. Pallas Mosaic lowering on the chip ----------------------------
check pallas_mosaic timeout 1500 python /root/repo/scripts/ev_pallas.py
check pallas_merge timeout 3000 python /root/repo/scripts/ev_pallas_merge.py

# --- 3. device kernel rates -------------------------------------------
check kernel_rates timeout 3000 python /root/repo/scripts/kernel_rates.py

# --- 4. flagship ctr k=21 on the chip (device engine pinned) ----------
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

log "=== DONE: $PASS passed, $FAIL failed ==="
rm -rf "$WORK"

#!/usr/bin/env bash
# One-shot round-3 on-chip A/B sweep — run when the TPU tunnel is up.
#
#   bash scripts/round3_chip_ab.sh [results_dir]
#
# Stages (each independent; earlier results survive a later crash):
#   1. matmul-slab microbench: fwd / fwd+save / bwd-recompute / bwd-saved
#      (the t(mm_fwd_save)+t(mm_bwd_saved) < t(mm_only)+t(mm_bwd_rec)
#      inequality is the go/no-go for flipping --bwd_acts default)
#   2. bench.py grid: {recompute, saved} x {sc 128 (parity), sc 64}
#
# The quality side of the sc_n_samples lever is a separate long run:
#   python scripts/run_production_scale.py /tmp/prod_sc64 20000 bfloat16 \
#       none recompute 64
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/round3_ab}"
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/sweep.log"; }

log "stage 1: matmul-slab microbench"
timeout 1200 python scripts/bench_kernel_variants.py \
    mm_only,mm_fwd_save,mm_bwd_rec,mm_bwd_saved \
    2>&1 | tee "$OUT/microbench.log"

for bwd in recompute saved; do
  for sc in 0 64; do
    tag="bwd=${bwd}_sc=${sc}"
    log "stage 2: bench.py $tag"
    EONERF_BENCH_BWD_ACTS=$bwd EONERF_BENCH_SC_SAMPLES=$sc \
      timeout 1500 python bench.py 2>"$OUT/bench_$tag.err" \
      | tee "$OUT/bench_$tag.json"
  done
done

log "stage 2 summary"
grep -h '"metric"' "$OUT"/bench_*.json 2>/dev/null | tee -a "$OUT/sweep.log"

# stage 3: quality side of the sc64 lever — production-scale 20k-step run
# with a 64-sample shadow march (vs the recorded scfull baselines:
# MAE 0.338 m / PSNR 24.30 dB). Auto-resumes if interrupted.
log "stage 3: sc64 production quality run (20k steps)"
timeout 5400 python scripts/run_production_scale.py /tmp/prod_sc64 20000 \
    bfloat16 none recompute 64 2>&1 | tail -40 | tee "$OUT/prod_sc64.log"

log "done; results in $OUT"

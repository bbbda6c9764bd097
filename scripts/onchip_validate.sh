#!/bin/bash
# On-chip validation sequence for kernel changes (run when the axon
# tunnel is up; see CLAUDE.md "Environment gotchas").  Usage:
#   bash scripts/onchip_validate.sh [outdir]
# Or as a recovery watchdog (retries until the tunnel answers):
#   WAIT=1 nohup bash scripts/onchip_validate.sh &
set -u -o pipefail  # rc lines must reflect python, not tee
OUT=${1:-/tmp}
export PYTHONPATH=/root/repo:/root/.axon_site
cd "$(dirname "$0")/.."

probe() {
  timeout 180 python -c "import jax; assert jax.devices()[0].platform in ('tpu','axon'); import jax.numpy as jnp; jnp.ones((8,128)).block_until_ready()" >/dev/null 2>&1
}

if [ "${WAIT:-0}" = "1" ]; then
  for i in $(seq 1 200); do
    probe && { echo "tunnel up after attempt $i at $(date)"; break; }
    echo "attempt $i down at $(date)"
    sleep 90
  done
fi

echo "== probe_element_window (MANDATORY: k-varying all-Element windows =="
echo "== — the default TPU decode path's input windows; localizes any  =="
echo "== Mosaic regression before the composed kernels run)            =="
timeout 3600 python scripts/probe_element_window.py | tee "$OUT/probe_element.log"
echo "rc=$?"

echo "== bench_check (parity gates at the bench config) =="
timeout 4800 python scripts/bench_check.py | tee "$OUT/bench_check.log"
echo "rc=$?"

echo "== probe_i16_streams (int16 fixed-point dtype menu) =="
timeout 5400 python scripts/probe_i16_streams.py | tee "$OUT/probe_i16.log"
echo "rc=$?"

echo "== probe_dbf16_ei16 (missing dtype-table cell: D=bf16 + E=i16) =="
timeout 5400 python scripts/probe_dbf16_ei16.py | tee "$OUT/probe_dbf16_ei16.log"
echo "rc=$?"

echo "== probe_i16_cost (where the int16 input path loses its byte win) =="
timeout 3600 python scripts/probe_i16_cost.py | tee "$OUT/probe_i16_cost.log"
echo "rc=$?"

echo "== probe_fused_read (fused natural-read fwd: VERDICT r2 item 10) =="
timeout 5400 python scripts/probe_fused_read.py | tee "$OUT/probe_fused_read.log"
echo "rc=$?"

echo "== probe_phase_sweep (DECODE_PHASES knee; honors DEEPBLAST_BENCH_I16) =="
timeout 5400 python scripts/probe_phase_sweep.py | tee "$OUT/probe_phases.log"
echo "rc=$?"

echo "== bench.py (headline) =="
timeout 3600 python bench.py | tee "$OUT/bench.log"
echo "rc=$?"

echo "== train-depth throughput (4-pass; VERDICT r1 weak item 2) =="
timeout 3600 python -m deepblast_tpu.cli.benchmark --sweep headline \
  --depth train --backend pallas_bm | tee "$OUT/bench_train_depth.log"
echo "rc=$?"

echo "== ProtT5-XL len-1024 geometry fit (VERDICT r1 item 7) =="
timeout 3000 python scripts/check_prot_t5_xl.py | tee "$OUT/t5xl.log"
echo "rc=$?"

# k-varying Element offsets: RECORDED on chip (round 3) — read/write
# OK+exact (the decode's default-path capability, ADVICE r2 medium item),
# folded-output variant crashes the remote compiler (PERF_NOTES "Dynamic
# Element offsets").  Keep as a regression canary for toolchain bumps.
echo "== probe_dynamic_element (regression canary; k-varying Element offsets) =="
timeout 3600 python scripts/probe_dynamic_element.py | tee "$OUT/probe_dyn_element.log"
echo "rc=$?"

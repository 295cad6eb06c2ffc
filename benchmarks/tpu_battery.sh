#!/bin/bash
# Wait for the tunneled TPU to come back, then run the full measurement
# battery in sequence.  Run from the repo root (tmux-friendly).
cd /root/repo
LOG=/tmp/tpu_battery.log
echo "=== battery start $(date) ===" >> "$LOG"
for i in $(seq 1 720); do
  if timeout 120 python -c "import jax; assert jax.default_backend()=='tpu'" 2>/dev/null; then
    echo "TPU back after $i polls $(date)" >> "$LOG"
    break
  fi
  sleep 60
done
if ! timeout 120 python -c "import jax; assert jax.default_backend()=='tpu'" 2>/dev/null; then
  echo "TPU never came back" >> "$LOG"; exit 1
fi
set -x
{
  echo "--- hardware parity tier (test_tpu_hardware.py, compiled kernels) ---"
  NR_TEST_TPU=1 timeout 1800 python -m pytest tests/test_tpu_hardware.py \
    --noconftest -q
  echo "--- bench.py ---"
  timeout 900 python bench.py
  echo "--- kernel_census (single step) ---"
  timeout 900 python benchmarks/kernel_census.py
  echo "--- prof.py (bench config) ---"
  timeout 900 python benchmarks/prof.py --image-size 256 --iters 48
  echo "--- scaling.py ---"
  timeout 2400 python benchmarks/scaling.py
  echo "--- roofline.py ---"
  timeout 1800 python benchmarks/roofline.py
  echo "=== battery done $(date) ==="
} >> "$LOG" 2>&1

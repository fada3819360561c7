#!/bin/bash
# One-shot TPU measurement sweep for the round-3 kernels (run serially —
# two processes contend for the one chip).  Usage: bash benchmarks/r3_tpu_sweep.sh
set -x
cd "$(dirname "$0")/.."
timeout 2400 env PCI_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py -x -q 2>&1 | tail -4
timeout 2400 python -m benchmarks.profile_flownet 2>&1 | tail -18
timeout 2400 python -m benchmarks.profile_isapci --policy bfloat16 2>&1 | tail -8
timeout 1200 python -m benchmarks.profile_models 2>&1 | tail -6
timeout 1200 python bench.py 2>&1 | tail -3

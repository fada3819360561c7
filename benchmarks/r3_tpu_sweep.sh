#!/bin/bash
# One-shot TPU measurement sweep for the round-3 kernels (run serially —
# two processes contend for the one chip).  Usage: bash benchmarks/r3_tpu_sweep.sh
#
# Step 0 runs TINY bounded kernel probes first: the last sweep wedged the
# axon worker mid-profile (cause unknown; device executions >60s crash
# it), so prove each new kernel compiles + runs small before any
# full-model profile touches the chip.
set -x
cd "$(dirname "$0")/.."
timeout 900 python benchmarks/probe_kernels.py || exit 1
timeout 2400 env PCI_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py -x -q 2>&1 | tail -4
timeout 2400 python -m benchmarks.profile_flownet 2>&1 | tail -18
timeout 2400 python -m benchmarks.profile_isapci --policy bfloat16 2>&1 | tail -8
timeout 1200 python -m benchmarks.profile_models 2>&1 | tail -6
timeout 1200 python bench.py 2>&1 | tail -3

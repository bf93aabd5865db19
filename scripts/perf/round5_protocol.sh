#!/bin/bash
# Round-5 on-chip measurement protocol. Run from the repo root with the TPU
# relay up; each step is one python process (the chip claim serializes).
# Results land in /tmp/r5/*.log; transcribe into docs/PERF.md + BENCH.
set -x
mkdir -p /tmp/r5
cd "$(dirname "$0")/../.."

# 1. same-day baseline (default = flash, hoisted, b24 s6)
timeout 580 python bench.py                      > /tmp/r5/base.log 2>&1

# 2. the packed-attention A/B (formatting attack)
timeout 580 python bench.py --attn flash_packed  > /tmp/r5/packed.log 2>&1

# 3. stream sweep under packed (fewer ops/step may move the sweet spot)
timeout 580 python bench.py --attn flash_packed --streams 3 > /tmp/r5/packed_s3.log 2>&1
timeout 580 python bench.py --attn flash_packed --streams 1 > /tmp/r5/packed_s1.log 2>&1

# 4. re-trace the packed attention, for the named-op + conv-census tables
timeout 580 python scripts/perf/trace_breakdown.py --logdir /tmp/r5/trace \
    --attn flash_packed --conv-census \
    --top-ops 'data formatting' --top-n 20      > /tmp/r5/trace.log 2>&1

# 5. the remaining BASELINE.json config rows
timeout 580 python scripts/perf/bench_configs.py --config vae     > /tmp/r5/cfg_vae.log 2>&1
timeout 580 python scripts/perf/bench_configs.py --config uncond  > /tmp/r5/cfg_uncond.log 2>&1
timeout 580 python scripts/perf/bench_configs.py --config txt2img > /tmp/r5/cfg_txt2img.log 2>&1
timeout 580 python scripts/perf/bench_configs.py --config inpaint > /tmp/r5/cfg_inpaint.log 2>&1

grep -h '^{' /tmp/r5/*.log

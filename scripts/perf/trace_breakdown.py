#!/usr/bin/env python
"""Decompose one DDIM sampling run from a real device trace.

Captures a `jax.profiler` xplane trace of the flagship 256^2 DDIM-50 CFG
sampling program (the exact `bench.py` program, via
`bench.build_sample_program`) on the TPU, then aggregates per-HLO self-time
through xprof's own `hlo_stats` pipeline into (a) a per-category table and
(b) a per-conv-output-shape table with achieved model-FLOP rates.

This is the evidence behind the throughput-plateau conclusion in
docs/PERF.md ("Where 45 ms/step actually goes", round 4): the device is
~100% busy (sum of self-times == wall time), convolution fusions carry
~73% of the time at 81-95% of the chip's nominal bf16 peak, attention runs
at its d_head=32 algorithmic ceiling, and the remainder is layout/fusion
glue — i.e. the program is compute-bound at close to its achievable rates,
not issue-latency-bound as round 3 hypothesized.

Usage (real chip, ~4 min incl. compile):
    timeout 580 python scripts/perf/trace_breakdown.py [--batch 24]
        [--streams 6] [--steps 50] [--logdir /tmp/ealdm_trace]
        [--no-hoist] [--no-capture]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def capture(logdir: str, batch: int, steps: int, streams: int,
            hoist: bool, attn: str = "flash") -> None:
    """Run the bench sampling program once under jax.profiler."""
    import jax

    import bench

    # enable_inference_optimizations (called inside build_sample_program)
    # would reset the impl to "flash"; bench's patch applies ours after it
    bench.force_attention_impl(attn)
    # build + warm the exact bench program, then trace one execution
    run, args, _ = bench.build_sample_program(
        batch_size=batch, steps=steps, streams=streams, hoist=hoist
    )
    out = run(*args)
    jax.block_until_ready(out)
    from ealdm_tpu.utils.profiling import fence, trace

    with trace(logdir):
        out = run(*args)
        fence(out)


def hlo_stats_rows(logdir: str):
    """Per-HLO stats (xprof `hlo_stats` tool) from the newest xplane.pb:
    list of dicts keyed by column id (self time in us, category, achieved
    model GFLOP/s, boundedness, op expression)."""
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    table = json.loads(data.decode() if isinstance(data, bytes) else data)
    cols = [c["id"] for c in table["cols"]]
    return [
        {k: (cell["v"] if cell else None) for k, cell in zip(cols, r["c"])}
        for r in table["rows"]
    ]


def report(rows, steps: int):
    by_cat = defaultdict(float)
    by_bound = defaultdict(float)
    conv = defaultdict(lambda: [0.0, 0.0, 0])  # shape -> [ms, gflop, sites]
    attn_ms = 0.0
    for r in rows:
        ms = float(r["total_self_time"]) / 1e3
        cat = r["category"]
        by_cat[cat] += ms
        by_bound[r["bound_by"] or "?"] += ms
        if cat == "convolution fusion":
            m = re.search(r"= \S+\[([\d,]+)\]", r["hlo_op_expression"])
            sig = m.group(1) if m else "?"
            rate = float(r["model_flop_rate"] or 0.0)  # GFLOP/s
            a = conv[sig]
            a[0] += ms
            a[1] += rate * ms / 1e3  # total GFLOP
            a[2] += 1
        if "_flash_" in (r["hlo_op_name"] or ""):
            attn_ms += ms
    total = sum(by_cat.values())

    print(f"\ndevice op-busy {total:.0f} ms over the traced run "
          f"({total / steps:.2f} ms/step incl. cond tower + decode)")
    print(f"{'HLO category':38s} {'total ms':>9s} {'ms/step':>8s} {'%':>6s}")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        if ms < 0.5:
            continue
        print(f"{cat:38s} {ms:9.1f} {ms / steps:8.2f} {100 * ms / total:5.1f}%")
    print(f"\n{'bound_by':38s} {'total ms':>9s} {'%':>6s}")
    for b, ms in sorted(by_bound.items(), key=lambda kv: -kv[1]):
        print(f"{b:38s} {ms:9.1f} {100 * ms / total:5.1f}%")

    conv_tot = sum(a[0] for a in conv.values())
    conv_gf = sum(a[1] for a in conv.values())
    print(f"\nconvolution fusions: {conv_tot:.0f} ms, "
          f"{conv_gf / 1e3:.1f} TFLOP -> "
          f"{conv_gf / conv_tot:.0f} TF/s achieved overall")
    print(f"{'conv output shape':>22s} {'ms':>8s} {'%conv':>6s} "
          f"{'TF/s':>7s} {'sites':>5s}")
    for sig, (ms, gf, n) in sorted(conv.items(), key=lambda kv: -kv[1][0])[:16]:
        print(f"{sig:>22s} {ms:8.1f} {100 * ms / conv_tot:5.1f}% "
              f"{gf / ms if ms else 0.0:7.1f} {n:5d}")
    if attn_ms:
        print(f"\nflash-attention custom-calls: {attn_ms:.0f} ms "
              f"({100 * attn_ms / total:.1f}% of busy)")


def conv_shape_census(rows, rate_below_tfs: float = 165.0):
    """Attribute each below-threshold conv-fusion output shape to its
    producing module (xprof tf_op_name + source_info) — the evidence for
    the round-5 'dispersion residual' table in docs/PERF.md, which showed
    the 113-149 TF/s tail is the transformer projection dot_generals
    writing layout-contorted outputs for the split-head consumers."""
    agg = defaultdict(lambda: [0.0, 0.0, defaultdict(float), set()])
    for r in rows:
        if r["category"] != "convolution fusion":
            continue
        ms = float(r["total_self_time"]) / 1e3
        m = re.search(r"= \S+\[([\d,]+)\]", r["hlo_op_expression"])
        sig = m.group(1) if m else "?"
        a = agg[sig]
        a[0] += ms
        a[1] += float(r["model_flop_rate"] or 0) * ms / 1e3  # GFLOP
        tf_op = "/".join((r.get("tf_op_name") or "?").split("/")[-3:])
        a[2][tf_op] += ms
        m2 = re.search(r"= \S+\[[\d,]+\]\{([\d,]+)", r["hlo_op_expression"])
        a[3].add(m2.group(1) if m2 else "?")
    print(f"\nconv fusions below {rate_below_tfs:.0f} TF/s, by output shape:")
    for sig, (ms, gf, tfs, louts) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        rate = gf / ms if ms else 0.0
        if rate >= rate_below_tfs or ms < 20:
            continue
        print(f"  [{sig}] {ms:.1f} ms @ {rate:.1f} TF/s  out-layouts {sorted(louts)}")
        for s, v in sorted(tfs.items(), key=lambda kv: -kv[1])[:4]:
            print(f"      {v:7.1f} ms  {s[:140]}")


def top_ops(rows, category: str, n: int = 25):
    """Drill-down: the top individual HLOs of one category, with their op
    expressions (the evidence trail for naming each producer)."""
    sel = [r for r in rows if r["category"] == category]
    sel.sort(key=lambda r: -float(r["total_self_time"]))
    total = sum(float(r["total_self_time"]) for r in sel) / 1e3
    print(f"\ntop {min(n, len(sel))} of {len(sel)} '{category}' ops "
          f"({total:.1f} ms total):")
    for r in sel[:n]:
        ms = float(r["total_self_time"]) / 1e3
        occ = r.get("occurrences")
        occ = str(int(occ)) if occ is not None else "?"
        expr = (r["hlo_op_expression"] or "")[:200]
        print(f"  {ms:7.2f} ms x{occ:>4s} {r['hlo_op_name']}")
        print(f"           {expr}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--streams", type=int, default=6)
    ap.add_argument("--no-hoist", action="store_true")
    ap.add_argument("--attn", default="flash",
                    choices=["dense", "flash", "flash_packed"],
                    help="attention impl for the captured program "
                         "(matches bench.py --attn)")
    ap.add_argument("--logdir", default="/tmp/ealdm_trace")
    ap.add_argument("--no-capture", action="store_true",
                    help="only analyze an existing trace in --logdir")
    ap.add_argument("--top-ops", default=None, metavar="CATEGORY",
                    help="also print the top individual HLOs of this "
                         "category (e.g. 'data formatting')")
    ap.add_argument("--top-n", type=int, default=25)
    ap.add_argument("--conv-census", action="store_true",
                    help="attribute below-threshold conv-fusion shapes to "
                         "their producing modules (docs/PERF.md round 5)")
    a = ap.parse_args()

    if not a.no_capture:
        capture(a.logdir, a.batch, a.steps, a.streams, not a.no_hoist, a.attn)
    rows = hlo_stats_rows(a.logdir)
    report(rows, a.steps)
    if a.top_ops:
        top_ops(rows, a.top_ops, a.top_n)
    if a.conv_census:
        conv_shape_census(rows)


if __name__ == "__main__":
    main()

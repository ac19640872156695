"""Roofline analysis of the packed co-teach step from the xprof hlo_stats
dump (experiments/prof_r4/, produced by experiments/profile_step.py on the
real v5e chip).

For every HLO op the profiler reports self time, model GFLOP/s, measured
memory bandwidth, and a bound_by classification. The speed-of-light (SOL)
time of an op is max(flops / peak_flops, hbm_bytes / peak_bw); summing SOL
over ops gives the step's hardware floor under the current fusion choices.
The gap between measured and SOL time, split by op category, says where
optimization can still pay and where the step is already at the roofline.

Usage: python experiments/roofline_r4.py [hlo_stats.json] [--md out.md]
"""

import argparse
import json
import os
import sys
from collections import defaultdict

PEAK_TFLOPS = 197.0       # v5e bf16 MXU peak
PEAK_HBM_GIBS = 760.0     # v5e HBM ~819 GB/s = ~763 GiB/s nominal


def load_rows(path):
    import gzip

    if not os.path.exists(path) and os.path.exists(path + ".gz"):
        path += ".gz"
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as fh:
        data = json.load(fh)
    if isinstance(data, list):
        data = data[0]
    cols = [c["id"] for c in data["cols"]]
    rows = []
    for r in data["rows"]:
        vals = [c.get("v") if isinstance(c, dict) else c for c in r["c"]]
        rows.append(dict(zip(cols, vals)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stats", nargs="?",
                    default="experiments/prof_r4/aide_step_hlo_stats_r4.json")
    ap.add_argument("--md", default="", help="write a markdown summary")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    rows = load_rows(args.stats)
    # keep device ops with real self time
    ops = [r for r in rows if (r.get("total_self_time") or 0) > 0]

    total_us = sum(r["total_self_time"] for r in ops)
    by_cat = defaultdict(lambda: dict(us=0.0, sol_us=0.0, flops=0.0,
                                      bytes=0.0, n=0))
    sol_total = 0.0
    flops_total = 0.0
    bytes_total = 0.0
    op_rows = []
    for r in ops:
        us = float(r["total_self_time"])
        # model_flop_rate is GFLOP/s over self time -> flops = rate * time
        flops = float(r.get("model_flop_rate") or 0.0) * 1e9 * us * 1e-6
        # measured_memory_bw is GiB/s over self time -> bytes
        gib = float(r.get("measured_memory_bw") or 0.0) * us * 1e-6
        sol_us = max(
            flops / (PEAK_TFLOPS * 1e12),
            gib / PEAK_HBM_GIBS,
        ) * 1e6
        cat = r.get("category") or "?"
        agg = by_cat[cat]
        agg["us"] += us
        agg["sol_us"] += sol_us
        agg["flops"] += flops
        agg["bytes"] += gib
        agg["n"] += int(r.get("occurrences") or 1)
        sol_total += sol_us
        flops_total += flops
        bytes_total += gib
        op_rows.append((us, sol_us, r))

    lines = []
    w = lines.append
    w("# Roofline: packed co-teach step (CHAOS point, v5e-1)\n")
    w(f"Source: `{os.path.basename(args.stats)}` "
      f"(3 profiled steps; times are totals over the trace).\n")
    w(f"- total device self time: **{total_us / 1e3:.2f} ms**")
    w(f"- speed-of-light floor (per-op max of MXU {PEAK_TFLOPS:.0f} TFLOP/s"
      f" / HBM {PEAK_HBM_GIBS:.0f} GiB/s): **{sol_total / 1e3:.2f} ms**"
      f" -> step runs at **{100 * sol_total / total_us:.1f}% of SOL**")
    w(f"- executed flops {flops_total / 1e12:.2f} TF, HBM traffic "
      f"{bytes_total:.2f} GiB, arithmetic intensity "
      f"{flops_total / (bytes_total * 2**30 + 1e-9):.0f} flops/byte")

    hbm_ops = [r for r in ops if (r.get("bound_by") == "HBM")]
    hbm_us = sum(r["total_self_time"] for r in hbm_ops)
    if hbm_us:
        bw = sum(
            float(r.get("measured_memory_bw") or 0) * r["total_self_time"]
            for r in hbm_ops
        ) / hbm_us
        w(f"- HBM-bound ops: {hbm_us / 1e3:.2f} ms "
          f"({100 * hbm_us / total_us:.1f}% of step) at a time-weighted "
          f"{bw:.0f} GiB/s = {100 * bw / PEAK_HBM_GIBS:.0f}% of nominal "
          f"HBM bandwidth")
    mxu = [r for r in ops if (r.get("bound_by") == "Compute")]
    mxu_us = sum(r["total_self_time"] for r in mxu)
    if mxu_us:
        fr = sum(
            float(r.get("model_flop_rate") or 0) * r["total_self_time"]
            for r in mxu
        ) / mxu_us
        w(f"- compute-bound ops: {mxu_us / 1e3:.2f} ms "
          f"({100 * mxu_us / total_us:.1f}% of step) at a time-weighted "
          f"{fr / 1e3:.1f} TFLOP/s = {100 * fr / 1e3 / PEAK_TFLOPS:.0f}% "
          f"of MXU peak")
    w("")

    w("## By HLO category\n")
    w("| category | time ms | % step | SOL ms | % of SOL | GF | GiB |")
    w("|---|---|---|---|---|---|---|")
    for cat, a in sorted(by_cat.items(), key=lambda kv: -kv[1]["us"]):
        pct_sol = 100 * a["sol_us"] / a["us"] if a["us"] else 0.0
        w(f"| {cat} | {a['us'] / 1e3:.2f} | {100 * a['us'] / total_us:.1f}%"
          f" | {a['sol_us'] / 1e3:.2f} | {pct_sol:.0f}%"
          f" | {a['flops'] / 1e9:.0f} | {a['bytes']:.2f} |")
    w("")

    w(f"## Top {args.top} ops by self time\n")
    w("| op | time ms | % cum | bound_by | GFLOP/s | BW GiB/s | SOL% |")
    w("|---|---|---|---|---|---|---|")
    cum = 0.0
    for us, sol_us, r in sorted(op_rows, key=lambda t: -t[0])[: args.top]:
        cum += us
        name = (r.get("hlo_op_name") or "?")[:60]
        w(f"| `{name}` | {us / 1e3:.2f} | {100 * cum / total_us:.0f}%"
          f" | {r.get('bound_by') or '?'}"
          f" | {float(r.get('model_flop_rate') or 0):.0f}"
          f" | {float(r.get('measured_memory_bw') or 0):.0f}"
          f" | {100 * sol_us / us:.0f}% |")
    w("")
    out = "\n".join(lines)
    print(out)
    if args.md:
        with open(args.md, "w") as fh:
            fh.write(out + "\n")


if __name__ == "__main__":
    main()

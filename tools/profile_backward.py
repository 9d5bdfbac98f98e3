"""Per-fusion MXU-utilization trace of a train step's BACKWARD pass.

VERDICT r4 item 6: the SISR step's RNet backward is 59% of the step and
had "no active plan" after remat measured as a loss.  This tool settles
whether that time is recoverable or at the emitter-shape ceiling:

  1. compile the real jitted train step and parse its optimized HLO:
     every `convolution` op's FLOPs from shapes (2 * out_elems *
     window_elems * contraction_dim), mapped to the top-level
     instruction (fusion or bare conv) whose name appears in the
     device trace;
  2. classify each conv as forward / backward from its op_name
     metadata (jax marks VJP ops with a `transpose(jvp(...))` scope);
  3. profile N steps on the chip and join device time per instruction;
  4. report per-conv-fusion achieved TFLOP/s and % of the bf16 MXU
     peak (v5e: 197 TFLOP/s), aggregated for fwd vs bwd.

If the backward's utilization distribution matches the forward's
measured shape ceiling (~60-67% for the 96/192/288-channel convs,
BASELINE.md round-2 ceiling table), the backward is conv-emitter-bound
like the forward and the 59%-of-step figure is the floor at these
shapes — a recorded closure rather than an open lever.

    python tools/profile_backward.py --which sisr_train [--steps 20]

Reference hot loop being profiled: train_SISR.py:197-228 (the
reference's equivalent step; we profile OUR jitted step).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

MXU_PEAK_TFLOPS = {"bf16": 197.0, "f32": 49.0}  # v5e per-chip


def parse_hlo_convs(hlo_text: str):
    """Map top-level instruction name -> list of conv records inside it.

    Returns {instr_name: [{"flops": float, "op_name": str,
                           "shape": str}, ...]}.
    """
    # 1) split into computations: "%name (param: ...) -> ... {" blocks
    comp_convs: dict = collections.defaultdict(list)
    cur_comp = None
    conv_re = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*"
        r"(\w+)\[([\d,]*)\][^=]*convolution\(")
    shape_re = re.compile(r"%?([\w.\-]+)\s*=\s*\w+\[([\d,]*)\]")
    # operand shapes needed for contraction size: collect every
    # instruction's shape as we scan
    instr_shape: dict = {}
    lines = hlo_text.splitlines()
    for ln in lines:
        mhead = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s+\([^)]*\)\s*->", ln)
        if mhead and "{" in ln:
            cur_comp = mhead.group(1)
            continue
        msh = shape_re.match(ln.strip())
        if msh:
            instr_shape[msh.group(1)] = msh.group(2)
        m = conv_re.match(ln)
        if not m or cur_comp is None:
            continue
        out_shape = [int(x) for x in m.group(3).split(",") if x]
        mw = re.search(r"window=\{size=(\d+)x(\d+)", ln)
        win = (int(mw.group(1)) * int(mw.group(2))) if mw else 1
        mdl = re.search(r"dim_labels=([\w?]+)_", ln)
        # operand 0 name
        mop = re.search(r"convolution\(\s*%?([\w.\-]+)", ln)
        contraction = 1
        if mdl and mop:
            spec = mdl.group(1)
            fpos = spec.index("f") if "f" in spec else -1
            op0 = instr_shape.get(mop.group(1))
            if fpos >= 0 and op0:
                dims = [int(x) for x in op0.split(",") if x]
                if fpos < len(dims):
                    contraction = dims[fpos]
        mmeta = re.search(r'op_name="([^"]+)"', ln)
        op_name = mmeta.group(1) if mmeta else ""
        mdl_full = re.search(r"dim_labels=([\w?]+_[\w?]+->[\w?]+)", ln)
        flops = 2.0 * int(np.prod(out_shape)) * win * contraction
        comp_convs[cur_comp].append(
            {"flops": flops, "op_name": op_name,
             "dim_labels": mdl_full.group(1) if mdl_full else "",
             "reversed_rhs": "rhs_reversal=1" in ln,
             "shape": f"{m.group(2)}[{m.group(3)}] win{win} K{contraction}"})
    # 2) top-level fusions: map instruction name -> called computation
    top: dict = {}
    for ln in lines:
        mf = re.match(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*.*fusion\(", ln)
        if mf:
            mc = re.search(r"calls=%?([\w.\-]+)", ln)
            if mc and mc.group(1) in comp_convs:
                top[mf.group(1)] = comp_convs[mc.group(1)]
    # bare convolutions living directly in a non-fused computation
    # (ENTRY / while body) appear in the trace under their own
    # instruction name; re-scan to map those
    cur_comp = None
    for ln in lines:
        mhead = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s+\([^)]*\)\s*->", ln)
        if mhead and "{" in ln:
            cur_comp = mhead.group(1)
            continue
        m = conv_re.match(ln)
        if m and cur_comp is not None and not cur_comp.startswith(
                ("fused_", "wide.")):
            # a conv living directly in a non-fused computation: the trace
            # event carries the conv's own name
            out_shape = [int(x) for x in m.group(3).split(",") if x]
            mw = re.search(r"window=\{size=(\d+)x(\d+)", ln)
            win = (int(mw.group(1)) * int(mw.group(2))) if mw else 1
            if m.group(1) not in top:
                # reuse the record computed above (same formula)
                recs = [r for r in comp_convs.get(cur_comp, [])
                        if r["shape"].startswith(
                            f"{m.group(2)}[{m.group(3)}]")]
                if recs:
                    top[m.group(1)] = [recs[0]]
    return top


def classify(conv) -> str:
    """'fwd' or 'bwd' for a conv record (or bare op_name string).

    Layered: jax VJP scope metadata when present; else structure — a dW
    conv contracts over batch (operand-0 dim_labels don't start with
    'b', e.g. f01b_i01o->01bf) and a dX conv runs with spatially
    reversed filters (rhs_reversal)."""
    if isinstance(conv, str):
        conv = {"op_name": conv}
    op_name = conv.get("op_name", "")
    if "transpose(" in op_name:
        return "bwd"
    if op_name:
        return "fwd"
    dl = conv.get("dim_labels", "")
    if dl and not dl.startswith("b"):
        return "bwd"
    if conv.get("reversed_rhs"):
        return "bwd"
    return "fwd"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="sisr_train",
                    choices=("sisr_train", "denoise_train"))
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace_dir", default="/tmp/bwd_trace")
    ap.add_argument("--peak", choices=("bf16", "f32"), default="bf16")
    args = ap.parse_args()

    import profile_step as ps  # sibling tool: builders + trace parsing

    run, lowered = ps.BUILDERS[args.which]()
    np.asarray(run(0))
    np.asarray(run(1))

    hlo = lowered.compile().as_text()
    convs_by_instr = parse_hlo_convs(hlo)

    import jax
    with jax.profiler.trace(args.trace_dir):
        for i in range(args.steps):
            v = run(2 + i)
        np.asarray(v)

    tr = sorted(glob.glob(args.trace_dir
                          + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(tr) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "args" in e}
    tids = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"
            and "args" in e}
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or "/device" in n.lower()}
    agg = collections.Counter()
    for e in ev:
        if (e.get("ph") == "X" and e.get("pid") in dev_pids
                and "XLA Ops" in tids.get((e["pid"], e["tid"]), "")):
            agg[e["name"]] += e.get("dur", 0)

    peak = MXU_PEAK_TFLOPS[args.peak]
    rows = []
    tot = {"fwd": [0.0, 0.0], "bwd": [0.0, 0.0]}  # [us, flops]
    total_us = sum(agg.values())
    for name, dur_us in agg.items():
        convs = convs_by_instr.get(name.strip("%"))
        if not convs:
            continue
        us = dur_us / args.steps
        flops = sum(c["flops"] for c in convs)
        cls = classify(convs[0])
        tf = flops / (us * 1e-6) / 1e12 if us > 0 else 0.0
        rows.append((us, cls, tf, 100 * tf / peak, name,
                     convs[0]["op_name"][-70:],
                     convs[0]["shape"]))
        tot[cls][0] += us
        tot[cls][1] += flops

    rows.sort(reverse=True)
    print(f"device total {total_us / 1e3 / args.steps:.2f} ms/step; "
          f"conv fusions below (peak {peak} TFLOP/s {args.peak})\n")
    print(f"{'us/step':>9} {'cls':>4} {'TF/s':>7} {'%peak':>6}  instr  "
          f"[op_name tail]  conv-shape")
    for us, cls, tf, pct, name, op, shape in rows[:args.top]:
        print(f"{us:9.1f} {cls:>4} {tf:7.1f} {pct:6.1f}  {name}  "
              f"[{op}]  {shape}")
    print()
    for cls in ("fwd", "bwd"):
        us, fl = tot[cls]
        if us > 0:
            tf = fl / (us * 1e-6) / 1e12
            print(f"{cls}: conv time {us / 1e3:.2f} ms/step, "
                  f"{fl / 1e9:.1f} GFLOP, {tf:.1f} TF/s "
                  f"= {100 * tf / peak:.1f}% of {args.peak} peak")
    summary = {
        "metric": f"{args.which}_bwd_conv_utilization",
        "fwd_ms": round(tot['fwd'][0] / 1e3, 2),
        "bwd_ms": round(tot['bwd'][0] / 1e3, 2),
        "fwd_pct_peak": round(
            100 * tot['fwd'][1] / (tot['fwd'][0] * 1e-6) / 1e12 / peak, 1)
        if tot['fwd'][0] else None,
        "bwd_pct_peak": round(
            100 * tot['bwd'][1] / (tot['bwd'][0] * 1e-6) / 1e12 / peak, 1)
        if tot['bwd'][0] else None,
        "device_ms_per_step": round(total_us / 1e3 / args.steps, 2),
        "steps": args.steps,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

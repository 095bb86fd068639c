"""Perf harness: time + trace the 1080p fwd+bwd render step on the TPU.

Usage:  python tools/perf1080.py [--dense] [--fwd-only] [--top 40]

Compiles the same graph as bench.py, times it over many iterations with a
forced scalar readback, captures a jax.profiler device trace of a few steps,
and prints per-op device time aggregated by op name (with HLO metadata
source mapping when present). All in ONE process so compile cache and trace
names line up.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(dense: bool, fwd_only: bool, ptile=16, tile_cull=True):
    import jax
    import jax.numpy as jnp

    from bench import probe_budgets
    from scgaussian_tpu.core.cameras import Camera
    from scgaussian_tpu.renderer import render

    if dense:
        W, H, N = 3840, 2160, 500_000
    else:
        W, H, N = 1920, 1080, 100_000
    rng = np.random.default_rng(0)
    means = np.stack(
        [rng.uniform(-3, 3, N), rng.uniform(-2, 2, N), rng.uniform(2, 10, N)], -1
    ).astype(np.float32)
    scales = np.exp(rng.uniform(-5.5, -4.0, (N, 3))).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, N).astype(np.float32)
    shs = np.zeros((N, 16, 3), np.float32)
    shs[:, 0] = rng.uniform(-1, 1, (N, 3))
    cam = Camera.create(np.eye(3), np.zeros(3), 0.9, 0.6, W, H)

    pre = tuple(jnp.asarray(x) for x in (means, opac, scales, quats, shs))
    budgets = probe_budgets(cam, pre, W, H, ptile)
    print(f"probe budgets (ptile={ptile}): {budgets}")
    budgets["ptile"] = ptile

    def loss(*a):
        out = render(
            cam, a[0], a[1], jnp.zeros(3), scales=a[2], rotations=a[3],
            shs=a[4], active_sh_degree=3, backend="tpu",
            tile_cull=tile_cull, **budgets,
        )
        return (
            jnp.sum(out.render**2)
            + jnp.sum(out.rendered_depth**2)
            + jnp.sum(out.rendered_alpha)
        )

    if fwd_only:
        @jax.jit
        def step(*a):
            return loss(*a)
    else:
        @jax.jit
        def step(*a):
            l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(*a)
            return l + sum(x.sum() for x in jax.tree_util.tree_leaves(g))

    args = tuple(
        jnp.asarray(x) for x in (means, opac, scales, quats, shs)
    )
    return step, args, W * H


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dense", action="store_true")
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--ptile", type=int, default=16)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--trace-dir", default="/tmp/perf1080_trace")
    ap.add_argument("--no-trace", action="store_true")
    ap.add_argument("--no-cull", action="store_true")
    args = ap.parse_args()

    import jax

    step, inputs, nrays = build(args.dense, args.fwd_only, args.ptile, not args.no_cull)

    t0 = time.time()
    out = step(*inputs)
    float(out)
    print(f"compile+first: {time.time() - t0:.1f}s", flush=True)

    # timing: chain iterations, force a scalar readback at the end
    t0 = time.time()
    for _ in range(args.iters):
        out = step(*inputs)
    float(out)
    dt = (time.time() - t0) / args.iters
    print(f"wall per step: {dt * 1e3:.2f} ms   {nrays / dt / 1e6:.1f} Mrays/s", flush=True)

    if args.no_trace:
        return

    os.system(f"rm -rf {args.trace_dir}")
    with jax.profiler.trace(args.trace_dir, create_perfetto_trace=True):
        for _ in range(3):
            out = step(*inputs)
        float(out)

    files = glob.glob(f"{args.trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no perfetto trace found"); return
    with gzip.open(sorted(files)[-1], "rt") as f:
        tr = json.load(f)

    # collect device-lane complete events; aggregate by op name
    events = [e for e in tr["traceEvents"] if e.get("ph") == "X"]
    pid_names = {}
    tid_names = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e["pid"] not in dev_pids:
            continue
        tn = tid_names.get((e["pid"], e["tid"]), "")
        if "step" in tn.lower() or "launch" in tn.lower():
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e["name"]
        agg[name] += dur
        cnt[name] += 1
        total += dur
    print(f"\ndevice total over 3 steps: {total:.2f} ms ({total/3:.2f} ms/step)")
    print(f"{'ms/step':>9}  {'n':>4}  op")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{ms/3:9.3f}  {cnt[name]//3:4d}  {name[:110]}")


if __name__ == "__main__":
    main()

"""Micro-bench: image assembly (untile) variants at 1080p/ptile=32/sub=16.

Shapes: out5 [T=2040, 5, P=1024] with pixel order (qy, qx, ly, lx),
ny=34, nx=60, ns=2, sub=16 -> img5 [5, 1088, 1920] (cropped later).
Forward AND transpose (the backward re-tiles the cotangent image).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

ny, nx, ns, sub, ch = 34, 60, 2, 16, 5
T, P = ny * nx, (ns * sub) ** 2
H, W = ny * ns * sub, nx * ns * sub
K = 8

rng = np.random.default_rng(0)
INS = [jnp.asarray(np.random.default_rng(k).normal(size=(T, ch, P)).astype(np.float32)) for k in range(K)]
IMGS = [jnp.asarray(np.random.default_rng(99 - k).normal(size=(ch, H, W)).astype(np.float32)) for k in range(K)]


def fwd_v0(out5):  # shipped: per-channel 6-axis untile + stack
    return jnp.stack([
        out5[:, c, :].reshape(ny, nx, ns, ns, sub, sub)
        .transpose(0, 2, 4, 1, 3, 5).reshape(H, W)
        for c in range(ch)
    ], axis=0)


def fwd_v1(out5):  # one-shot 7-axis
    return (out5.reshape(ny, nx, ch, ns, ns, sub, sub)
            .transpose(2, 0, 3, 5, 1, 4, 6).reshape(ch, H, W))


def fwd_v2(out5):  # channels-last one-shot, then one [H,W,5]->[5,H,W] copy
    hw5 = (out5.reshape(ny, nx, ch, ns, ns, sub, sub)
           .transpose(0, 3, 5, 1, 4, 6, 2).reshape(H, W, ch))
    return hw5.transpose(2, 0, 1)


def fwd_v3(out5):  # two-stage: tile-internal first (lane-dim stays 256+)
    # stage 1: [T, 5, (qy,qx,ly,lx)] -> [ny, ns, nx, ns, 5, sub*sub]
    a = out5.reshape(ny, nx, ch, ns, ns, sub * sub).transpose(0, 3, 1, 4, 2, 5)
    a = jax.lax.optimization_barrier(a)
    # stage 2: [(ny,ns), (nx,ns), 5, (ly,lx)] -> [5, H, W]
    return (a.reshape(ny * ns, nx * ns, ch, sub, sub)
            .transpose(2, 0, 3, 1, 4).reshape(ch, H, W))


def bwd_v0(img):  # transpose of fwd_v0
    return jnp.stack([
        img[c].reshape(ny, ns, sub, nx, ns, sub).transpose(0, 3, 1, 4, 2, 5)
        .reshape(T, P)
        for c in range(ch)
    ], axis=1)


def bwd_v1(img):
    return (img.reshape(ch, ny, ns, sub, nx, ns, sub)
            .transpose(1, 4, 0, 2, 5, 3, 6).reshape(T, ch, P))


def bench(fn, data, name):
    @jax.jit
    def step(xs):
        return sum(fn(x)[0].sum() for x in xs)

    float(step(data))
    t0 = time.time()
    for _ in range(20):
        out = step(data)
    float(out)
    dt = (time.time() - t0) / 20 / K
    print(f"{name}: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    # correctness vs v0 first
    r = INS[0]
    ref = np.asarray(fwd_v0(r))
    for f in (fwd_v1, fwd_v2, fwd_v3):
        np.testing.assert_array_equal(np.asarray(f(r)), ref), f
    ref_b = np.asarray(bwd_v0(IMGS[0]))
    np.testing.assert_array_equal(np.asarray(bwd_v1(IMGS[0])), ref_b)
    print("correct")
    bench(fwd_v0, INS, "fwd v0 per-channel ")
    bench(fwd_v1, INS, "fwd v1 one-shot    ")
    bench(fwd_v2, INS, "fwd v2 ch-last+T   ")
    bench(fwd_v3, INS, "fwd v3 two-stage   ")
    bench(bwd_v0, IMGS, "bwd v0 per-channel ")
    bench(bwd_v1, IMGS, "bwd v1 one-shot    ")

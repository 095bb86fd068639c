"""Micro-bench: aligned attrsT build variants at the 1080p/ptile=32 shape.

v0 (shipped): scatter-set orig_idx_aligned [L_pad] -> [L_pad,16] row gather
-> transpose copy.
v1: sorted row gather [L,16] -> per-slot computed-index row gather
[L_pad,16] -> transpose copy (the scatter disappears; at 1080p nothing else
needs orig_idx_aligned so XLA DCEs it).

Times composed graphs of 8 independent instances to defeat single-op timing
noise (see STATUS round-2 measurement discipline).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

L, L_PAD, N = 212992, 348160, 100001
T_TILES, CHUNK = 2040, 128
NBC = L_PAD // CHUNK

rng = np.random.default_rng(0)
K = 8


def make_inputs(k):
    r = np.random.default_rng(k)
    attrs = r.normal(size=(N, 16)).astype(np.float32)
    # synthetic per-tile counts summing to <= L
    cnt = r.integers(40, 168, T_TILES)
    cnt = (cnt * (L / cnt.sum())).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int32)
    aligned_cnt = ((cnt + CHUNK - 1) // CHUNK) * CHUNK
    astarts = np.concatenate([[0], np.cumsum(aligned_cnt)]).astype(np.int32)
    total = int(starts[-1])
    orig_sorted = np.concatenate([
        r.integers(0, N - 1, total), np.full(L - total, N - 1)
    ]).astype(np.int32)
    # per-chunk tile + k
    tile_b = np.zeros(NBC, np.int32)
    k_b = np.zeros(NBC, np.int32)
    for t in range(T_TILES):
        c0, c1 = astarts[t] // CHUNK, astarts[t + 1] // CHUNK
        if c1 > NBC: break
        tile_b[c0:c1] = t
        k_b[c0:c1] = np.arange(c1 - c0)
    # scatter-set dest (v0)
    e = np.arange(L, dtype=np.int32)
    delta = np.zeros(L, np.int32)
    for t in range(T_TILES):
        delta[starts[t]:starts[t + 1]] = astarts[t] - starts[t]
    dest = np.where(e < total, e + delta, L_PAD).astype(np.int32)
    return (jnp.asarray(attrs), jnp.asarray(orig_sorted), jnp.asarray(dest),
            jnp.asarray(tile_b), jnp.asarray(k_b), jnp.asarray(starts),
            jnp.asarray(cnt.astype(np.int32)))


INPUTS = [make_inputs(k) for k in range(K)]


def v0(attrs, orig_sorted, dest, tile_b, k_b, starts, cnt):
    dest_b, orig_b = jax.lax.optimization_barrier((dest, orig_sorted))
    oia = jax.lax.optimization_barrier(
        jnp.full((L_PAD,), N - 1, jnp.int32).at[dest_b].set(orig_b, mode="drop")
    )
    aligned = attrs[oia]
    return jax.lax.optimization_barrier(aligned).T


def v1(attrs, orig_sorted, dest, tile_b, k_b, starts, cnt):
    sorted_attrs = attrs[jax.lax.optimization_barrier(orig_sorted)]  # [L,16]
    # per-aligned-slot source index: src = starts[tile] + k*CHUNK + j,
    # invalid tail lanes (j >= cnt - k*CHUNK) clamp to the sentinel row L-1
    # (orig_sorted's tail is the sentinel N-1 by construction; for exactness
    # use an explicit where)
    j = jnp.arange(CHUNK, dtype=jnp.int32)[None, :]  # [1, CHUNK]
    src0 = starts[tile_b] + k_b * CHUNK          # [NBC]
    lim = cnt[tile_b] - k_b * CHUNK              # valid lanes per chunk
    # broadcast+reshape, NOT jnp.repeat (repeat lowers to 7ns/elem gathers)
    src = (src0[:, None] + j).reshape(-1)
    valid = (j < lim[:, None]).reshape(-1)
    src = jnp.where(valid, jnp.clip(src, 0, L - 1), L - 1)
    sorted_attrs = jax.lax.optimization_barrier(sorted_attrs)
    aligned = sorted_attrs[jax.lax.optimization_barrier(src)]
    aligned = jnp.where(valid[:, None], jax.lax.optimization_barrier(aligned), 0.0)
    return jax.lax.optimization_barrier(aligned).T


def bench(fn, name):
    @jax.jit
    def step(inputs):
        outs = [fn(*inp) for inp in inputs]
        return sum(o[0, ::1031].sum() for o in outs)

    out = step(INPUTS); float(out)
    t0 = time.time()
    for _ in range(20):
        out = step(INPUTS)
    float(out)
    dt = (time.time() - t0) / 20 / K
    print(f"{name}: {dt*1e3:.3f} ms per instance")
    return dt


if __name__ == "__main__":
    bench(v0, "v0 scatter+gather+T")
    bench(v1, "v1 two-gather+T   ")

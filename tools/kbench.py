"""Micro-benchmark the stream compositing kernels in isolation at 1080p shape.

Synthesizes the exact input shapes the 1080p/N=100k bench produces
(L_pad = 1M aligned slots, 8160 tiles of ~128 slots) and times
_stream_fwd_impl / _stream_bwd_impl alone, so kernel experiments iterate in
seconds instead of the 3-minute full-graph compile.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from scgaussian_tpu.renderer import tile_raster as tr

    SC = tr.SCHUNK
    nx, ny, tile = 120, 68, 16
    T = nx * ny
    P = tile * tile
    L_pad = 1 << 20
    nbc = L_pad // SC
    rng = np.random.default_rng(0)

    # per-tile aligned segments: one chunk per tile (the 1080p regime),
    # remainder sentinel
    chunks_per_tile = max(1, (L_pad // SC) // T)
    tile_of_chunk = np.full((nbc + 1,), T, np.int32)
    k_of_chunk = np.ones((nbc,), np.int32)
    for t in range(T):
        for k in range(chunks_per_tile):
            c = t * chunks_per_tile + k
            tile_of_chunk[c] = t
            k_of_chunk[c] = k

    # attribute stream: plausible splat params (tile-local means near origin)
    attrsT = np.zeros((tr.NUM_ROWS, L_pad), np.float32)
    attrsT[tr.ROW_MX] = rng.uniform(0, 16, L_pad)
    attrsT[tr.ROW_MY] = rng.uniform(0, 16, L_pad)
    attrsT[tr.ROW_CA] = rng.uniform(0.05, 0.3, L_pad)
    attrsT[tr.ROW_CB] = rng.uniform(-0.02, 0.02, L_pad)
    attrsT[tr.ROW_CC] = rng.uniform(0.05, 0.3, L_pad)
    attrsT[tr.ROW_OP] = rng.uniform(0.2, 0.9, L_pad)
    attrsT[tr.ROW_R : tr.ROW_D + 1] = rng.uniform(0, 1, (4, L_pad))
    # shift means to their tile's origin
    bx = (np.minimum(tile_of_chunk[:nbc], T - 1) % nx) * tile
    by = (np.minimum(tile_of_chunk[:nbc], T - 1) // nx) * tile
    attrsT[tr.ROW_MX] += np.repeat(bx, SC).astype(np.float32)
    attrsT[tr.ROW_MY] += np.repeat(by, SC).astype(np.float32)

    attrsT = jnp.asarray(attrsT)
    tile_of_chunk = jnp.asarray(tile_of_chunk)
    k_of_chunk = jnp.asarray(k_of_chunk)

    ITERS = 10

    # in-jit chained iterations (single-op launches mis-time on the tunneled
    # platform): each iteration's input depends on the previous output's
    # first element, forcing serialization inside one executable.
    def chain(fn, dep_of):
        @jax.jit
        def run(*args):
            def body(_, carry):
                eps, args2 = carry, args
                out = fn(*dep_of(eps, *args2))
                return jnp.sum(out[0, 0]) * 0.0
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
        return run

    fwd1 = lambda a: tr._stream_fwd_impl(a, tile_of_chunk, k_of_chunk, nx, ny, tile)
    out_chunks = jax.jit(fwd1)(attrsT)
    gchunks = jnp.asarray(rng.normal(size=(nbc, 8, P)).astype(np.float32) * 0.01)
    totchunks = jnp.asarray(rng.normal(size=(nbc, 1, P)).astype(np.float32) * 0.01)
    bwd1 = lambda a, oc, gc, tc: tr._stream_bwd_impl(
        a, tile_of_chunk, k_of_chunk, oc, gc, tc, nx, ny, tile
    )

    runf = chain(fwd1, lambda e, a: (a + e,))
    runb = chain(bwd1, lambda e, a, oc, gc, tc: (a + e, oc, gc, tc))

    def bench(run, *args):
        float(run(*args))  # compile
        t0 = time.time()
        float(run(*args))
        return (time.time() - t0) / ITERS * 1e3

    base = bench(chain(lambda a: a, lambda e, a: (a + e,)), attrsT)  # chain overhead
    tf = bench(runf, attrsT)
    tb = 0.0 if '--fwd-only' in __import__('sys').argv else bench(runb, attrsT, out_chunks, gchunks, totchunks)
    print(
        f"fwd: {tf - base:.2f} ms   bwd: {tb - base:.2f} ms   "
        f"(chain overhead {base:.2f}; nbc={nbc}, chunks/tile={chunks_per_tile})"
    )


if __name__ == "__main__":
    main()

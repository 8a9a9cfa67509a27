"""Compile + run the 1025-level 2D halo kernels under REAL Mosaic at the
deployment-plan local shapes (docs/SCALING.md dispatch map): the 4x4
mesh's finest level (Li=272, Lj=272, split ladder bi=4 — the 7%
padding-cap planner widths) and the 8x8 mesh's (Li=144, Lj=144, full
window bi=6). Drives the PRODUCTION copy-free j-DMA path ((x, jl, jr,
lh, rhc) 5-tuples, _tri_dma2d stitching — what sharded2d_padded
dispatches) with 1-dev stand-in side buffers (zeros); this validates
lowering + timing of the hottest 1025^3 stage, not multi-chip
execution (unavailable here)."""
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import pallas_sharded2d as px2


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


n = 1025
h = 1.0 / (n - 1)
sk = pk.padded_shape_trim(n)[2]  # 1024 (k-TRIM production width)

for label, Li, Lj, bi, n_iter in (
    ("4x4 plan, split ladder", 272, 272, 4, 1),
    ("8x8 plan, full window", 144, 144, 6, 2),
):
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.standard_normal((Li, Lj, sk)).astype(np.float32))
    hh = 2 * n_iter
    sje = Lj + 2 * px2.HJ

    def parts5(x, kl, kr, tl):
        # 1-dev stand-in for _halo_parts2dj: zero j/i halo buffers, the
        # composite right edge carries the local tail rows (j-extended).
        jz = jnp.zeros((x.shape[0], px2.HJ, sk), x.dtype)
        lh = jnp.zeros((kl, sje, sk), x.dtype)
        zr = jnp.zeros((kr, sje, sk), x.dtype)
        if tl:
            tail = jnp.pad(x[x.shape[0] - tl:],
                           ((0, 0), (px2.HJ, px2.HJ), (0, 0)))
            zr = jnp.concatenate([tail, zr], 0)
        return (x, jz, jz, lh, zr)

    gij0 = jnp.asarray([-hh, -px2.HJ], jnp.int32)
    t0 = time.perf_counter()
    out = px2.rb_smooth_halo2d(parts5(B, hh, hh, bi), parts5(B, hh, hh, bi),
                               gij0, h, n_iter, n, Li, Lj,
                               red_first=True, block_i=bi)
    s = sync(out)
    dt = time.perf_counter() - t0

    # chain-slope stage time; the j-DMA output is the raw local array,
    # so the chain needs no re-extension between stages.
    def chain(reps):
        @jax.jit
        def go(e, r):
            for _ in range(reps):
                e = px2.rb_smooth_halo2d(parts5(e, hh, hh, bi),
                                         parts5(r, hh, hh, bi),
                                         gij0, h, n_iter, n, Li, Lj,
                                         red_first=True, block_i=bi)
            return e
        return go
    g1, g2 = chain(2), chain(6)
    sync(g1(B, B)); sync(g2(B, B))
    ts = []
    for g in (g1, g2):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            sync(g(B, B))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    slope = (ts[1] - ts[0]) / 4
    print(f"1025-level smoother [{label}] Li={Li} Lj={Lj} sk={sk} "
          f"bi={bi} n_iter={n_iter} (j-DMA path): compile+run {dt:.1f}s, "
          f"stage slope {slope*1e3:.2f} ms", flush=True)

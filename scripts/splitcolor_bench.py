"""Split-color RB stage vs the rectangular fused stage (ROOFLINE lever 3).

Slope-timed (two chain lengths inside one jit — removes the ~23 ms
tunnel dispatch latency; docs/ROOFLINE.md Methodology) on the real
chip at 257^3:

  * rectangular fused stage (pk.rb_smooth_fused_pipelined, bi=16) —
    the production kernel, 0.79 ms in the round-2 roofline;
  * split-color stage (pallas_splitcolor.rb_smooth_split_fused) over
    packed (257, 528, 128) arrays — 1/3 the computed points, 2/3 the
    HBM traffic;
  * identity DMA floors for BOTH layouts (same-run comparable).

Usage: python scripts/splitcolor_bench.py [--n 257] [--reps 10]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import pallas_splitcolor as sc


def timed(fn, reps):
    float(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[0]


def slope(make_run, c1, c2, reps):
    r1 = timed(make_run(c1), reps)
    r2 = timed(make_run(c2), reps)
    return (r2 - r1) / (c2 - c1), r1, r2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=257)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--block-i", type=int, nargs="+", default=[16])
    args = ap.parse_args()
    n = args.n
    h = 1.0 / (n - 1)
    c1, c2 = 2, 8

    _, sj, sk = pk.padded_shape(n)
    _, sj2, skh = sc.split_shape(n)
    print(f"backend: {jax.default_backend()}  n={n}  "
          f"rect ({n},{sj},{sk})  split ({n},{sj2},{skh})", flush=True)

    rng = np.random.default_rng(0)
    u = np.zeros((n, n, n), np.float32)
    u[1:-1, 1:-1, 1:-1] = rng.standard_normal((n - 2,) * 3)
    f = np.zeros_like(u)
    f[1:-1, 1:-1, 1:-1] = rng.standard_normal((n - 2,) * 3)
    up, fp = pk.pad3(jnp.asarray(u)), pk.pad3(jnp.asarray(f))
    u2 = jax.jit(sc.pack_split, static_argnums=1)(up, n)
    f2 = jax.jit(sc.pack_split, static_argnums=1)(fp, n)
    u2.block_until_ready()

    rect_vol = 3 * n * sj * sk * 4
    split_vol = 3 * n * sj2 * skh * 4

    for bi in args.block_i:
        def make_rect(chain, bi=bi):
            @jax.jit
            def run(x, y):
                out = x
                for _ in range(chain):
                    out = pk.rb_smooth_fused_pipelined(
                        out, y, h, 2, n, red_first=True, block_i=bi)
                return jnp.sum(out[:1])
            return lambda: run(up, fp)

        per, r1, r2 = slope(make_rect, c1, c2, args.reps)
        print(f"rect  stage bi={bi:2d}: {per*1e3:7.3f} ms  "
              f"({rect_vol/per/1e9:6.1f} GB/s algorithmic)  "
              f"raw {r1*1e3:.1f}/{r2*1e3:.1f} ms", flush=True)

        def make_split(chain, bi=bi):
            @jax.jit
            def run(x, y):
                out = x
                for _ in range(chain):
                    out = sc.rb_smooth_split_fused(
                        out, y, h, 2, n, red_first=True, block_i=bi)
                return jnp.sum(out[:1])
            return lambda: run(u2, f2)

        per_s, r1, r2 = slope(make_split, c1, c2, args.reps)
        print(f"split stage bi={bi:2d}: {per_s*1e3:7.3f} ms  "
              f"({split_vol/per_s/1e9:6.1f} GB/s algorithmic)  "
              f"raw {r1*1e3:.1f}/{r2*1e3:.1f} ms  "
              f"speedup {per/per_s:5.2f}x", flush=True)

    # identity DMA floor on the SPLIT layout (same traffic, no compute)
    def identity_split(bi, chain):
        hh = 4
        si = bi + 2 * hh
        nb = pl.cdiv(n, bi)
        kern = pk._make_pipelined_kernel(
            n, si, sj2, skh, bi, hh, nb, lambda eu, ef, i, p: eu)
        call = pk._pallas_stencil_call_pipelined(kern, n, si, sj2, skh, bi,
                                                 jnp.float32)

        @jax.jit
        def run(x, y):
            out = x
            for _ in range(chain):
                out = call(out, y)
            return jnp.sum(out[:1])

        return lambda: run(u2, f2)

    for bi in args.block_i:
        per, r1, r2 = slope(lambda c, bi=bi: identity_split(bi, c), c1, c2,
                            args.reps)
        print(f"split dma floor bi={bi:2d}: {per*1e3:7.3f} ms  "
              f"raw {r1*1e3:.1f}/{r2*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

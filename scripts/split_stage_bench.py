"""Slope-time the split-color production kernels against their k-trim
rect counterparts on the real chip (latency-calibrated chain method,
docs/ROOFLINE.md: two jit-chained repetition counts, subtract — the
~23-27 ms tunnel round trip cancels). Chains stay <= 8 pallas calls
(longer chains have hung the tunnel compiler).

Usage (real TPU): python scripts/split_stage_bench.py [--levels 7]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from multigrid_parallel_tpu import CycleConfig, Hierarchy, poisson_3d_quadratic
from multigrid_parallel_tpu import cycles_padded as cp
from multigrid_parallel_tpu import cycles_split as cs
from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import pallas_split as ps


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def slope(make_chain, c1=3, c2=7, best_of=3):
    """ms per op via two chain lengths inside one jit each."""
    f1 = jax.jit(make_chain(c1))
    f2 = jax.jit(make_chain(c2))
    sync(f1())
    sync(f2())
    t1 = min(_time(f1) for _ in range(best_of))
    t2 = min(_time(f2) for _ in range(best_of))
    return (t2 - t1) / (c2 - c1) * 1e3


def _time(f):
    t0 = time.perf_counter()
    sync(f())
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, default=7)
    args = ap.parse_args()

    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=args.levels)
    n = hier.finest_n
    h = hier.spacing(hier.num_levels - 1)
    print(f"== split vs trim stage slopes at {n}^3 "
          f"(backend {jax.default_backend()}) ==", flush=True)

    rng = np.random.default_rng(0)
    _, sj, skt = pk.padded_shape_trim(n)
    e = np.zeros((n, sj, skt), np.float32)
    e[1:n-1, 1:n-1, 1:n-1] = rng.standard_normal((n - 2,) * 3)
    r = np.zeros((n, sj, skt), np.float32)
    r[1:n-1, 1:n-1, 1:n-1] = rng.standard_normal((n - 2,) * 3)
    e, r = jnp.asarray(e), jnp.asarray(r)
    er, eb = ps.pack_split(e, n)
    rr_, rb_ = ps.pack_split(r, n)
    scale = jnp.float32(1.0 - 1e-6)  # keep chained iterates bounded

    # --- smoother stage (4 half-sweeps)
    for bi in (16, 24, 32):
        if ps.split_smooth_block_i(n, sj, skt // 2, 2, requested=bi) != bi:
            print(f"  split smoother bi={bi}: does not fit", flush=True)
            continue

        def chain(c, bi=bi):
            def f():
                a, b = er, eb
                for _ in range(c):
                    a, b = ps.rb_smooth_split(a, b, rr_, rb_, h, 2, n,
                                              red_first=True, block_i=bi)
                    a = a * scale
                return a + b
            return f

        print(f"  split smoother stage bi={bi}: {slope(chain):7.3f} ms",
              flush=True)

    for bi in (16, 24):
        def chain_t(c, bi=bi):
            def f():
                a = e
                for _ in range(c):
                    a = pk.rb_smooth_fused_pipelined(a, r, h, 2, n,
                                                     red_first=True,
                                                     block_i=bi)
                    a = a * scale
                return a
            return f

        print(f"  trim  smoother stage bi={bi}: {slope(chain_t):7.3f} ms",
              flush=True)

    # --- residual+restrict (chain via dummy dependency on the output)
    bi_rr = ps.split_rr_block_i(n, sj, skt // 2)

    def chain_rr(c):
        def f():
            a, acc = er, 0.0
            for _ in range(c):
                rc = ps.residual_restrict_split(a, eb, rr_, rb_, h, n,
                                                block_i=bi_rr)
                acc = acc + rc[1, 1, 1]
                a = a * scale
            return acc
        return f

    print(f"  split resid+restrict bi={bi_rr}: {slope(chain_rr):7.3f} ms",
          flush=True)

    bi1 = pk.rr_fused_block_i(n, sj, skt, 4)

    def chain_rrt(c):
        def f():
            a, acc = e, 0.0
            for _ in range(c):
                rc = pk.residual_restrict_fused_padded(a, r, h, n,
                                                       block_i=bi1)
                acc = acc + rc[1, 1, 1]
                a = a * scale
            return acc
        return f

    print(f"  trim  resid+restrict bi={bi1}: {slope(chain_rrt):7.3f} ms",
          flush=True)

    # --- prolong+correct+post-smooth
    nc = (n + 1) // 2
    _, sjc, skc = pk.padded_shape_trim(nc)
    ec = np.zeros((nc, sjc, skc), np.float32)
    ec[1:nc-1, 1:nc-1, 1:nc-1] = 0.01 * rng.standard_normal((nc - 2,) * 3)
    ec = jnp.asarray(ec)

    for bi in (12, 16):
        if ps.split_ps_block_i(n, sj, skt // 2, 2, requested=bi) != bi:
            print(f"  split prolong+smooth bi={bi}: does not fit", flush=True)
            continue

        def chain_ps(c, bi=bi):
            def f():
                a, b = er, eb
                for _ in range(c):
                    a, b = ps.prolong_smooth_split(ec, a, b, rr_, rb_, h, 2,
                                                   n, block_i=bi)
                    a = a * scale
                return a + b
            return f

        print(f"  split prolong+smooth bi={bi}: {slope(chain_ps):7.3f} ms",
              flush=True)

    bi_pt = pk.ps_fused_block_i(n, sj, skt, 2, 4)

    def chain_pst(c):
        def f():
            a = e
            for _ in range(c):
                a = pk.prolong_smooth_fused_padded(ec, a, r, h, 2, n,
                                                   block_i=bi_pt)
                a = a * scale
            return a
        return f

    print(f"  trim  prolong+smooth bi={bi_pt}: {slope(chain_pst):7.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()

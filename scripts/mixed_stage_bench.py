"""Slope-time the mixed-BC k-FOLD production kernels at 257^3.

The go/no-go data for a split-color (parity-compressed) mixed tier:
how far is each fold stage from (a) its Dirichlet trim/split twin and
(b) its own DMA floor? Chain-slope method (CLAUDE.md): two jit-fused
chain lengths, subtract — single-call timings are tunnel-latency noise.

Usage (real TPU): python scripts/mixed_stage_bench.py [--levels 7]
Ref: mg_3d_bkup.c:84-133 (the BC pass whose folded cost this measures).
"""

import argparse
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_enable_x64", True)
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from multigrid_parallel_tpu.hierarchy import Hierarchy  # noqa: E402
from multigrid_parallel_tpu.mixed_bc import MixedBCSolver  # noqa: E402
from multigrid_parallel_tpu.models.electrospray import (  # noqa: E402
    electrospray_problem,
)
from multigrid_parallel_tpu.ops import pallas3d as pk  # noqa: E402
from multigrid_parallel_tpu.ops import pallas_mixed_fold as pmf  # noqa: E402


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def _time(f):
    t0 = time.perf_counter()
    sync(f())
    return time.perf_counter() - t0


def slope(make_chain, c1=3, c2=7, best_of=3):
    """ms per op via two chain lengths inside one jit each."""
    f1 = jax.jit(make_chain(c1))
    f2 = jax.jit(make_chain(c2))
    sync(f1())
    sync(f2())
    t1 = min(_time(f1) for _ in range(best_of))
    t2 = min(_time(f2) for _ in range(best_of))
    return (t2 - t1) / (c2 - c1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, default=7)
    args = ap.parse_args()

    prob = electrospray_problem()
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=args.levels,
                     length=prob.length)
    n = hier.finest_n
    h = hier.spacing(hier.num_levels - 1)
    _, sj, skf = pmf.fold_shape(n)
    print(f"== mixed fold stage slopes at {n}^3, fold ({n},{sj},{skf}) "
          f"(backend {jax.default_backend()}) ==", flush=True)

    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.standard_normal((n, sj, skf)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((n, sj, skf)).astype(np.float32))
    pin = pmf.fold_pin_planes(prob, n, sj, skf)
    # Only chain_rr rescales its iterate between links: its kernel
    # output (rc) is NOT fed back, so identical links would be CSE'd.
    # The smoother/prolong chains evolve their iterate through the
    # kernel itself — a per-link multiply there would be an extra
    # unfused ~70 MB HBM pass inside the measured slope, biasing the
    # stage times this script exists to compare against DMA floors.
    scale = jnp.float32(1.0 - 1e-6)
    gb = e.size * 4 / 1e9

    # --- mixed smoother stage (4 half-sweeps + folded BC pass)
    bi_s = pmf.mixed_fold_block_i(n, sj, skf, 2, requested=32)

    def chain_sm(c):
        def f():
            a = e
            for _ in range(c):
                a = pmf.mixed_rb_smooth_fold(a, r, pin, h, 2, n,
                                             red_first=True, block_i=bi_s)
            return a
        return f

    dt = slope(chain_sm)
    print(f"  mixed fold smoother stage bi={bi_s}: {dt:7.3f} ms "
          f"({3 * gb / dt * 1e3:.0f} GB/s algorithmic)", flush=True)

    # --- Dirichlet trim twin for reference (same session)
    _, sjt, skt = pk.padded_shape_trim(n)
    et = jnp.asarray(rng.standard_normal((n, sjt, skt)).astype(np.float32))
    rt = jnp.asarray(rng.standard_normal((n, sjt, skt)).astype(np.float32))

    def chain_tr(c):
        def f():
            a = et
            for _ in range(c):
                a = pk.rb_smooth_fused_pipelined(a, rt, h, 2, n,
                                                 red_first=True, block_i=32)
            return a
        return f

    dtt = slope(chain_tr)
    print(f"  dirichlet trim smoother stage bi=32: {dtt:7.3f} ms "
          f"(mixed/trim = {dt / dtt:.2f}x)", flush=True)

    # --- mixed residual+restrict
    bi_rr = pmf.rr_fold_block_i(n, sj, skf)

    def chain_rr(c):
        def f():
            a, acc = e, 0.0
            for _ in range(c):
                rc = pmf.residual_restrict_fold(a, r, h, n, block_i=bi_rr)
                acc = acc + rc[1, 1, 1]
                a = a * scale  # rc isn't fed back, so CSE needs a fresh a
            return acc
        return f

    # The per-link `a * scale` is an extra elementwise read+write pass the
    # other stages don't carry — quote its cost so cross-stage comparisons
    # can subtract it (ADVICE r4: this row is inflated by exactly one pass).
    infl_ms = 2 * e.size * 4 / 600e9 * 1e3
    print(f"  mixed fold resid+restrict bi={bi_rr}: "
          f"{slope(chain_rr):7.3f} ms "
          f"(incl ~{infl_ms:.2f} ms CSE-breaker elementwise pass)",
          flush=True)

    # --- mixed prolong+correct+post-smooth
    nc = (n + 1) // 2
    _, sjc, skc = pmf.fold_shape(nc)
    ec = jnp.asarray(rng.standard_normal((nc, sjc, skc)).astype(np.float32))
    sgn = pmf.fold_edge_sign_planes(prob, nc, sjc, skc)  # coarse level
    # Mirror production: _make_mixed_descend_fold statically skips the
    # delta matmuls when the sign planes are all zero (every fine
    # electrospray level — mixed_padded.py sgns_f), so the measured
    # stage must skip them too or it overstates the mixed/trim gap.
    has_delta = bool(np.any(np.asarray(sgn)))
    bi_ps = pmf.mixed_fold_prolong_block_i(n, sj, skf, 2, requested=24)

    def chain_ps(c):
        def f():
            a = e
            for _ in range(c):
                a = pmf.mixed_prolong_smooth_fold(ec, a, r, pin, sgn, h, 2,
                                                  n, block_i=bi_ps,
                                                  with_delta=has_delta)
            return a
        return f

    print(f"  mixed fold prolong+smooth bi={bi_ps} "
          f"(with_delta={has_delta}): {slope(chain_ps):7.3f} ms", flush=True)

    # --- identity-body DMA floor proxy: from-zero smoother (2-in/1-out)
    def chain_fz(c):
        def f():
            a = r
            for _ in range(c):
                a = pmf.mixed_rb_smooth_from_zero_fold(
                    a, pin, h, 2, n, red_first=True, block_i=bi_s)
            return a
        return f

    print(f"  mixed fold from-zero smoother bi={bi_s}: "
          f"{slope(chain_fz):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

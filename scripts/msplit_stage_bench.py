"""Slope-time the mixed-BC SPLIT-COLOR production stages at 257^3 and
decompose one outer defect step: finest split stages vs the fold
subtree vs the outer df/BC/EFT work — where the next electrospray
millisecond lives.

Usage (real TPU): python scripts/msplit_stage_bench.py [--levels 7]
Ref: mg_3d_bkup.c (the electrospray driver).
"""

import argparse
import dataclasses
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_enable_x64", True)
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from multigrid_parallel_tpu.hierarchy import Hierarchy  # noqa: E402
from multigrid_parallel_tpu import mixed_padded as mp  # noqa: E402
from multigrid_parallel_tpu.mixed_bc import MixedBCSolver  # noqa: E402
from multigrid_parallel_tpu.models.electrospray import (  # noqa: E402
    electrospray_problem,
)
from multigrid_parallel_tpu.ops import pallas3d as pk  # noqa: E402
from multigrid_parallel_tpu.ops import pallas_mixed_fold as pmf  # noqa: E402
from multigrid_parallel_tpu.ops import pallas_mixed_split as pms  # noqa: E402
from multigrid_parallel_tpu.ops import pallas_split as psp  # noqa: E402


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def _time(f):
    t0 = time.perf_counter()
    sync(f())
    return time.perf_counter() - t0


def slope(make_chain, c1=3, c2=7, best_of=3):
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
    cap = (n - 1) // 4 + 1
    s = MixedBCSolver(prob, hier, n_smooth=2, gamma=2, gamma_min_n=cap)
    h = hier.spacing(hier.num_levels - 1)
    _, sj, skh = psp.split_shape(n)
    plan = mp.mixed_split_plan(n, sj, skh, 2)
    print(f"== mixed split stages {n}^3 (backend {jax.default_backend()}) "
          f"plan={plan} ==", flush=True)

    pinp = pms.msplit_pin_packs(prob, n, sj, skh)
    key = jax.random.PRNGKey(0)
    er = jax.random.normal(key, (n, sj, skh), jnp.float32)
    eb = jax.random.normal(jax.random.PRNGKey(1), (n, sj, skh), jnp.float32)
    fr = jax.random.normal(jax.random.PRNGKey(2), (n, sj, skh), jnp.float32)
    fb = jax.random.normal(jax.random.PRNGKey(3), (n, sj, skh), jnp.float32)

    def chain_sm(c):
        def f():
            a, b = er, eb
            for _ in range(c):
                a, b = pms.mixed_rb_smooth_msplit(
                    a, b, fr, fb, pinp, h, 2, n, red_first=True,
                    block_i=plan["smooth"])
            return a[:1]
        return f

    print(f"split smooth (4 half, bi={plan['smooth']}): "
          f"{slope(chain_sm):7.3f} ms", flush=True)

    # fold smoother twin for the compute-halving ratio
    _, sjf, skf = pmf.fold_shape(n)
    pin_f = pmf.fold_pin_planes(prob, n, sjf, skf)
    e_f = jax.random.normal(key, (n, sjf, skf), jnp.float32)
    r_f = jax.random.normal(jax.random.PRNGKey(4), (n, sjf, skf),
                            jnp.float32)
    bi_f = pmf.mixed_fold_block_i(n, sjf, skf, 2, requested=8)

    def chain_fold_sm(c):
        def f():
            a = e_f
            for _ in range(c):
                a = pmf.mixed_rb_smooth_fold(a, r_f, pin_f, h, 2, n,
                                             red_first=True, block_i=bi_f)
            return a[:1]
        return f

    print(f"fold  smooth (4 half, bi={bi_f}): "
          f"{slope(chain_fold_sm):7.3f} ms", flush=True)

    def chain_rr(c):
        def f():
            acc = jnp.zeros((), jnp.float32)
            # distinct inputs per link (coarse output cannot feed back)
            for k in range(c):
                rc = pms.residual_restrict_msplit(
                    er * (1.0 + 0.001 * k), eb, fr, fb, h, n,
                    block_i=plan["rr"])
                acc = acc + jnp.sum(rc[:1])
            return acc
        return f

    print(f"split rr (bi={plan['rr']}):  {slope(chain_rr):7.3f} ms "
          f"(+1 elementwise input-scale pass per link)", flush=True)

    nc = (n + 1) // 2
    _, sjcf, skcf = pmf.fold_shape(nc)
    ec_f = jax.random.normal(jax.random.PRNGKey(5), (nc, sjcf, skcf),
                             jnp.float32)
    sgn_c = pmf.fold_edge_sign_planes(prob, nc, sjcf, skcf)
    has_delta = bool(np.any(np.asarray(sgn_c)))

    def chain_ps(c):
        def f():
            a, b = er, eb
            for _ in range(c):
                a, b = pms.mixed_prolong_smooth_msplit(
                    ec_f, a, b, fr, fb, pinp, sgn_c, h, 2, n,
                    block_i=plan["ps"], with_delta=has_delta)
            return a[:1]
        return f

    print(f"split ps (bi={plan['ps']}, delta={has_delta}): "
          f"{slope(chain_ps):7.3f} ms", flush=True)

    ul = er * 1e-8
    ulb = eb * 1e-8

    def chain_resid(c):
        def f():
            a, b = er, eb
            for _ in range(c):
                rr_, rb_, _ = pms.residual_df_norm_msplit(
                    a, b, ul, ulb, fr, fb, fr * 0, fb * 0, h, n,
                    block_i=plan["resid"])
                a, b = rr_, rb_
            return a[:1]
        return f

    print(f"split EFT resid+norm (bi={plan['resid']}): "
          f"{slope(chain_resid):7.3f} ms", flush=True)

    # outer XLA glue: df add x2 + BC pass x2
    def chain_glue(c):
        def f():
            a, b, la, lb = er, eb, ul, ulb
            for _ in range(c):
                a, la = pk.df_add(a, la, fr)
                b, lb = pk.df_add(b, lb, fb)
                a, b = pms.apply_bcs_split_pair(a, b, n, pinp)
                la, lb = pms.apply_bcs_split_pair(la, lb, n, pinp)
            return a[:1]
        return f

    print(f"outer glue (2x df_add + 2x BC pass): "
          f"{slope(chain_glue):7.3f} ms", flush=True)

    # the whole fold subtree below the finest level (one W-visit body:
    # the driver calls it 1 + (gamma-1) = 2 times per outer step)
    f32 = jnp.float32
    hier32 = dataclasses.replace(hier, dtype=f32)
    descend = mp._make_mixed_descend_fold(s, hier32, 33, 8)
    rc0 = jax.random.normal(jax.random.PRNGKey(6), (nc, sjcf, skcf), f32)

    def chain_sub(c):
        def f():
            out = rc0
            for _ in range(c):
                out = descend(None, out, args.levels - 2, from_zero=True)
            return out[:1]
        return f

    print(f"fold subtree visit ({nc}^3 descend): "
          f"{slope(chain_sub):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

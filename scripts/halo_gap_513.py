"""Pinpoint the 513^3 1-dev distributed tax: time the sharded inner
V-cycle, the single-chip inner V-cycle, and the outer-step pieces
(residual_norm vs fused df_step) separately via chain-length slope
(two jit-chained repetition counts, subtract -- docs/ROOFLINE.md
methodology; the ~25 ms tunnel round trip cancels)."""
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
from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.parallel import sharded_padded as sp
from multigrid_parallel_tpu.parallel.sharded import ShardPlan
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import dataclasses


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def slope(fn, args, n1=2, n2=6):
    def make(reps):
        @jax.jit
        def go(*a):
            out = a[0]
            rest = a[1:]
            for _ in range(reps):
                out = fn(out, *rest)
            return out
        return go

    g1, g2 = make(n1), make(n2)
    sync(g1(*args)); sync(g2(*args))  # compile
    ts = []
    for g, n in ((g1, n1), (g2, n2)):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            sync(g(*args))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, default=8)
    args = ap.parse_args()
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=args.levels)
    n = hier.finest_n
    cfg = CycleConfig(n_smooth=2)
    problem = poisson_3d_quadratic()
    init = cp.ref_init_norm(problem, hier)
    f32 = jnp.float32
    hier32 = dataclasses.replace(hier, dtype=f32)
    print(f"== halo-gap profile at {n}^3 ==", flush=True)

    # ---- single-chip inner cycle
    cyc1 = cp.make_padded_correction_cycle(hier32, cfg)
    u_hi, u_lo, f_hi, f_lo = cp.setup_df_problem(problem, hier, trim=True)
    _, sj, sk = f_hi.shape
    r0 = f_hi  # stand-in residual field, right shape/magnitude

    t = slope(lambda e, r: cyc1(e, r), (jnp.zeros_like(r0), r0))
    print(f"  single-chip V-cycle      : {t*1e3:8.2f} ms", flush=True)

    # ---- sharded inner cycle on the 1-dev mesh
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("x",))
    n_sharded = 3
    fine_local = -(-n // (1 << n_sharded)) * (1 << n_sharded)
    plan = ShardPlan(n_dev=1, axis="x", n_sharded=n_sharded,
                     fine_local=fine_local)
    inner = sp._build_local_cycle(hier32, cfg, plan, cp._JNP_LEVEL_MAX,
                                  block_i=16)
    sh = NamedSharding(mesh, P("x"))
    pad = plan.padded_planes(0) - r0.shape[0]
    rg = jax.device_put(jnp.pad(r0, ((0, pad), (0, 0), (0, 0))), sh)

    mapped = jax.shard_map(
        lambda e, r: inner(e, r, from_zero=False), mesh=mesh,
        in_specs=(P("x"), P("x")), out_specs=P("x"), check_vma=False,
    )
    t = slope(lambda e, r: mapped(e, r), (jnp.zeros_like(rg), rg))
    print(f"  sharded(1dev) V-cycle    : {t*1e3:8.2f} ms", flush=True)

    # ---- outer-step pieces
    # single-chip fused df_step (df_add + EFT residual + norm, one pass)
    bi_step = pk.df_step_block_i(n, sj, sk)
    h = hier.spacing(hier.num_levels - 1)
    if bi_step:
        def step1(u_hi2, u_lo2, e, f_hi2, f_lo2):
            uh, ul, r, nrm = pk.df_step_fused(u_hi2, u_lo2, e, f_hi2, f_lo2,
                                              h, n, block_i=bi_step)
            return uh

        e = jnp.zeros_like(u_hi)
        t = slope(lambda uh2, *rest: step1(uh2, *rest),
                  (u_hi, u_lo, e, f_hi, f_lo))
        print(f"  single-chip df_step fused: {t*1e3:8.2f} ms", flush=True)

    # sharded df_add + residual_df_norm_halo (two passes)
    def place(x):
        return jax.device_put(jnp.pad(x, ((0, pad), (0, 0), (0, 0))), sh)

    uhg, ulg, fhg, flg = place(u_hi), place(u_lo), place(f_hi), place(f_lo)
    L0 = plan.local_planes(0)
    from multigrid_parallel_tpu.ops import pallas_sharded as px

    def step2_local(u_hi2, u_lo2, e, f_hi2, f_lo2):
        u_hi2, u_lo2 = pk.df_add(u_hi2, u_lo2, e)
        bi = px.ext_block_i(L0, sj, sk, 1, 4, requested=16)
        bi_h = sp._halo_bi(bi, L0, 1)
        parts = [sp._halo_parts(a, "x", 1, 1, 1, bi_h)
                 for a in (u_hi2, u_lo2, f_hi2, f_lo2)]
        r, part = px.residual_df_norm_halo(
            *parts, sp._gi0("x", L0, 1), h, n, L0, block_i=bi_h)
        return u_hi2

    m2 = jax.shard_map(step2_local, mesh=mesh, in_specs=(P("x"),) * 5,
                       out_specs=P("x"), check_vma=False)
    t = slope(lambda uh2, *rest: m2(uh2, *rest),
              (uhg, ulg, jnp.zeros_like(uhg), fhg, flg))
    print(f"  sharded df_add+norm      : {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""EXECUTE the 1025^3 deployment plan's claims (round-3 verdict #3a):
run the 2D-mesh padded df solver at 513^3 / 1025^3 on the virtual CPU
mesh and record residual agreement with the 1D path — turning the
SCALING.md plan's "fits / converges" cells into executed cells.

The CPU mesh validates NUMERICS and the collective pattern at scale,
not speed (docs/SCALING.md preamble); Pallas stays off (jnp local ops)
because interpreter-mode kernels at 1025^3 would run for hours on the
single host core.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/scale_exec.py --grid 513 [--steps 0 = solve to 1e-8]
  python scripts/scale_exec.py --grid 1025 --steps 1
"""

from __future__ import annotations

import argparse
import os
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()
# The single host core serializes the virtual devices, so per-device
# skew at 1025^3 exceeds XLA:CPU's default 40 s collective-rendezvous
# termination timeout (the 1025^3 one-step run died on it) — raise it.
os.environ["XLA_FLAGS"] += (
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
    " --xla_cpu_collective_timeout_seconds=7200"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from multigrid_parallel_tpu import CycleConfig, Hierarchy, poisson_3d_quadratic
from multigrid_parallel_tpu import cycles_padded as cp
from multigrid_parallel_tpu.parallel import sharded2d_padded as s2p
from multigrid_parallel_tpu.parallel import sharded_padded as spp
from multigrid_parallel_tpu.parallel.sharded import make_mesh, plan_sharding


def run_2d(hier, nx, ny, steps, trim, init, rel_tol, inner_cycles, jlm):
    from multigrid_parallel_tpu.parallel.sharded2d import make_mesh_2d

    mesh = make_mesh_2d(nx, ny)
    t0 = time.perf_counter()
    run, plan = s2p.make_sharded2d_padded_df_solver(
        hier, CycleConfig(n_smooth=2), mesh,
        rel_tol=(0.0 if steps else rel_tol),
        max_cycles=(steps or 40), inner_cycles=inner_cycles,
        jnp_level_max=jlm, trim=trim, init_norm=init,
    )
    st = s2p.setup_df_problem_sharded2d_padded(
        poisson_3d_quadratic(), hier, mesh, plan, trim=trim
    )
    _, _, norm, n_outer = run(*st)
    norm, n_outer = float(norm), int(n_outer)
    dt = time.perf_counter() - t0
    print(f"  2D ({nx}x{ny}) mesh: {n_outer} outer steps, final residual "
          f"{norm:.6e}  [{dt:.0f}s compile+run]", flush=True)
    return norm, n_outer


def run_1d(hier, n_dev, steps, trim, init, rel_tol, inner_cycles, jlm):
    mesh = make_mesh(n_dev)
    t0 = time.perf_counter()
    run, plan = spp.make_sharded_df_solver(
        hier, CycleConfig(n_smooth=2), mesh,
        rel_tol=(0.0 if steps else rel_tol),
        max_cycles=(steps or 40), inner_cycles=inner_cycles,
        jnp_level_max=jlm, trim=trim, init_norm=init,
    )
    st = spp.setup_df_problem_sharded_padded(
        poisson_3d_quadratic(), hier, mesh, plan, trim=trim
    )
    _, _, norm, n_outer = run(*st)
    norm, n_outer = float(norm), int(n_outer)
    dt = time.perf_counter() - t0
    print(f"  1D ({n_dev} dev) mesh: {n_outer} outer steps, final residual "
          f"{norm:.6e}  [{dt:.0f}s compile+run]", flush=True)
    return norm, n_outer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=513, choices=(257, 513, 1025))
    ap.add_argument("--steps", type=int, default=0,
                    help="0 = solve to 1e-8; k = exactly k defect steps")
    ap.add_argument("--inner-cycles", type=int, default=4)
    ap.add_argument("--skip-1d", action="store_true")
    args = ap.parse_args()

    levels = {257: 7, 513: 8, 1025: 9}[args.grid]
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=levels)
    n = hier.finest_n
    jlm = 4096  # jnp local path everywhere (CPU: no interpreter kernels)
    problem = poisson_3d_quadratic()
    init = cp.ref_init_norm(problem, hier)
    print(f"== scale execution: {n}^3 trim, 8-virtual-device CPU mesh, "
          f"{'solve to 1e-8' if not args.steps else f'{args.steps} step(s)'} "
          f"(init ||f|| = {init:.6e}) ==", flush=True)

    n2, o2 = run_2d(hier, 4, 2, args.steps, True, init, 1e-8,
                    args.inner_cycles, jlm)
    if not args.skip_1d:
        n1, o1 = run_1d(hier, 8, args.steps, True, init, 1e-8,
                        args.inner_cycles, jlm)
        agree = abs(n2 - n1) <= 1e-3 * max(abs(n1), 1e-30) and o1 == o2
        print(f"  1D/2D agreement: {'OK' if agree else 'MISMATCH'} "
              f"(|Δresid|/resid = {abs(n2-n1)/max(abs(n1),1e-30):.2e})",
              flush=True)


if __name__ == "__main__":
    main()

"""Weak-scaling harness for the sharded solver (BASELINE config 5).

Runs the sharded double-float cycle at (roughly) fixed planes-per-device
across mesh sizes and reports per-cycle wall time and convergence. On a
real multi-chip TPU slice this measures ICI halo-exchange scaling; on
this dev environment it runs against virtual CPU devices
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8),
which validates the communication structure and convergence invariance
but NOT absolute speed.

    python scripts/weak_scaling.py [--devices 1 2 4 8] [--levels 5]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--levels", type=int, default=5)  # 65^3 base
    ap.add_argument("--cycles", type=int, default=5)
    args = ap.parse_args()

    import jax

    if len(jax.devices()) < max(args.devices):
        print(
            f"only {len(jax.devices())} devices; run with JAX_PLATFORMS=cpu "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8 (or a pod)",
            file=sys.stderr,
        )
        sys.exit(1)

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import multigrid_parallel_tpu as mg
    from multigrid_parallel_tpu.parallel import sharded as sh

    prob = mg.poisson_3d_quadratic()
    cfg = mg.CycleConfig(n_smooth=2)
    print(f"backend={jax.default_backend()}  base levels={args.levels}")
    print("| devices | grid | planes/dev | s/cycle | resid after "
          f"{args.cycles} cycles |")
    print("|---|---|---|---|---|")
    for nd in args.devices:
        # weak scaling: grow the grid with the mesh (one extra level per
        # 8x devices keeps volume/device constant; here we grow the i
        # extent via levels when possible, else report strong scaling)
        hier = mg.Hierarchy(ndim=3, coarse_n=5, num_levels=args.levels)
        mesh = sh.make_mesh(nd)
        cycle, plan = sh.make_sharded_df_cycle(hier, cfg, mesh)
        u_hi, u_lo, f_hi, f_lo = sh.setup_df_problem_sharded(prob, hier, mesh, plan)
        u_hi, u_lo, norm = cycle(u_hi, u_lo, f_hi, f_lo)  # compile
        float(norm)
        t0 = time.perf_counter()
        for _ in range(args.cycles):
            u_hi, u_lo, norm = cycle(u_hi, u_lo, f_hi, f_lo)
        norm = float(norm)
        dt = (time.perf_counter() - t0) / args.cycles
        print(
            f"| {nd} | {hier.finest_n}³ | {plan.fine_local} | "
            f"{dt * 1e3:.1f} ms | {norm:.3e} |"
        )


if __name__ == "__main__":
    main()

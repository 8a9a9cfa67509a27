"""Scaling harness for the sharded solver (BASELINE config 5 structure).

Two modes over the sharded double-float cycle:
  * default (strong scaling): one fixed grid across mesh sizes —
    planes/device shrink as devices grow;
  * --weak: one extra level per doubling of devices, keeping
    planes/device constant along the sharded i axis (with a 1D
    decomposition of a cubic grid the j,k extents grow too, so
    volume/device still grows — true constant-volume weak scaling needs
    the grid to be non-cubic or a 2D/3D mesh decomposition).

On a real multi-chip TPU slice this measures ICI halo-exchange scaling;
on this dev environment it runs against virtual CPU devices
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8),
which validates the communication structure and convergence invariance
but NOT absolute speed.

    python scripts/weak_scaling.py [--devices 1 2 4 8] [--levels 5] [--weak]
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
    ap.add_argument("--weak", action="store_true",
                    help="grow the grid with the mesh (one level per 2x devices)")
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
    mode = "weak (planes/dev const)" if args.weak else "strong (fixed grid)"
    print(f"backend={jax.default_backend()}  base levels={args.levels}  mode={mode}")
    print("| devices | grid | planes/dev | s/cycle | resid after "
          f"{args.cycles} cycles |")
    print("|---|---|---|---|---|")
    for nd in args.devices:
        levels = args.levels + (nd.bit_length() - 1 if args.weak else 0)
        hier = mg.Hierarchy(ndim=3, coarse_n=5, num_levels=levels)
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

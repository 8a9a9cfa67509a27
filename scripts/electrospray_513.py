"""Electrospray (mixed-BC) 513^3 scale execution on the k-FOLD fused tier.

Runs the production electrospray configuration (gamma=2 W-cycles with
the finest/4 depth cap, docs/MIXED_BC.md §4) one size up from the 257^3
headline — the first mixed-BC solve ever executed at 513^3 on any
backend. Records wall time (best-of-N on the shared chip) and the
converged relative residual vs ||r0||.

Usage (real TPU): python scripts/electrospray_513.py [--reps 3]
Ref: mg_3d_bkup.c (the electrospray driver this scales).
"""

import argparse
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_enable_x64", True)
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax.numpy as jnp  # noqa: E402

import multigrid_parallel_tpu as mg  # noqa: E402
from multigrid_parallel_tpu import mixed_padded as mp  # noqa: E402
from multigrid_parallel_tpu.mixed_bc import MixedBCSolver  # noqa: E402
from multigrid_parallel_tpu.models.electrospray import (  # noqa: E402
    electrospray_problem,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--levels", type=int, default=8,
                    help="8 = 513^3 (coarse_n 5)")
    args = ap.parse_args()

    prob = electrospray_problem()
    hier = mg.Hierarchy(ndim=3, coarse_n=5, num_levels=args.levels,
                        length=prob.length)
    n = hier.finest_n
    cap = (n - 1) // 4 + 1
    s = MixedBCSolver(prob, hier, n_smooth=2, gamma=2, gamma_min_n=cap)
    print(f"== electrospray {n}^3 fold tier, gamma=2 cap>={cap} "
          f"(backend {jax.default_backend()}) ==", flush=True)

    run = mp.make_mixed_fold_df_solver(s, rel_tol=1e-8, inner_cycles=1)

    # ||r0|| anchor: one residual+norm kernel on the setup state — NOT a
    # second whole-solve jit (a max_cycles=0 solver can't share run's
    # executable and would pay a full second 30-150 s tunnel compile).
    from multigrid_parallel_tpu.ops import pallas_mixed_fold as pmf
    st = mp.setup_mixed_fold_df_problem(s)
    h = hier.spacing(hier.num_levels - 1)
    _, sj, skf = pmf.fold_shape(n)
    bi_r = pmf.fold_residual_block_i(n, sj, skf, requested=8)
    if not bi_r:
        raise SystemExit(
            f"no fold residual block fits VMEM at n={n} (fold planes too "
            f"large or grid too small for the fold layout) — use the "
            f"mixed_padded full-layout driver instead of this script")
    n0_fn = jax.jit(lambda a, b, c, d: jnp.sqrt(
        pmf.residual_df_norm_fold(a, b, c, d, h, n, block_i=bi_r)[1]))
    n0 = float(n0_fn(*st))
    print(f"||r0|| = {n0:.4e}", flush=True)

    t0 = time.perf_counter()
    out = run(*st)
    norm, it = float(out[2]), int(out[3])
    print(f"first call (incl compile): {time.perf_counter() - t0:.1f} s; "
          f"outer steps {it}, final {norm:.3e} "
          f"(rel {norm / n0:.2e})", flush=True)

    best = float("inf")
    for _ in range(args.reps):
        st = mp.setup_mixed_fold_df_problem(s)
        t0 = time.perf_counter()
        out = run(*st)
        norm, it = float(out[2]), int(out[3])
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"wall {dt:.4f} s  outer {it}  final {norm:.3e} "
              f"(rel {norm / n0:.2e})", flush=True)
    print(f"best {best:.4f} s", flush=True)


if __name__ == "__main__":
    main()

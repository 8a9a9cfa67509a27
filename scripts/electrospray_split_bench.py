"""Electrospray (mixed-BC) SPLIT-COLOR tier vs k-FOLD tier, same session.

Runs the production electrospray configuration (gamma=2 W-cycles with
the finest/4 depth cap) through both fused tiers at the same size and
reports same-session walls, convergence, and solution agreement — the
round-4 verdict item #1 measurement (the mixed smoother is the most
compute-bound kernel in the repo; split-color halves its computed
points).

Usage (real TPU): python scripts/electrospray_split_bench.py
    [--levels 7] [--reps 4] [--skip-fold]
Ref: mg_3d_bkup.c (the electrospray driver).
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
from multigrid_parallel_tpu.ops import pallas_mixed_fold as pmf  # noqa: E402
from multigrid_parallel_tpu.ops import pallas_mixed_split as pms  # noqa: E402
from multigrid_parallel_tpu.ops import pallas_split as psp  # noqa: E402


def bench(label, make_run, setup, reps):
    run = make_run()
    st = setup()
    t0 = time.perf_counter()
    out = run(*st)
    norm, it = float(out[-2]), int(out[-1])
    print(f"[{label}] first call (incl compile): "
          f"{time.perf_counter() - t0:.1f} s; outer {it}, final {norm:.3e}",
          flush=True)
    best, walls = float("inf"), []
    for _ in range(reps):
        st = setup()
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        out = run(*st)
        norm, it = float(out[-2]), int(out[-1])
        w = time.perf_counter() - t0
        walls.append(w)
        best = min(best, w)
    walls.sort()
    med = walls[len(walls) // 2]
    print(f"[{label}] best {best:.4f} s  median {med:.4f} s  "
          f"outer {it}  final {norm:.3e}", flush=True)
    return out, best, norm, it


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--levels", type=int, default=7,
                    help="7 = 257^3 (coarse_n 5)")
    ap.add_argument("--skip-fold", action="store_true")
    ap.add_argument("--smooth-bi", type=int, default=24)
    ap.add_argument("--ps-bi", type=int, default=16)
    args = ap.parse_args()

    prob = electrospray_problem()
    hier = mg.Hierarchy(ndim=3, coarse_n=5, num_levels=args.levels,
                        length=prob.length)
    n = hier.finest_n
    cap = (n - 1) // 4 + 1
    s = MixedBCSolver(prob, hier, n_smooth=2, gamma=2, gamma_min_n=cap)
    print(f"== electrospray {n}^3 split vs fold, gamma=2 cap>={cap} "
          f"(backend {jax.default_backend()}) ==", flush=True)
    _, sj, skh = psp.split_shape(n)
    print("split plan:", mp.mixed_split_plan(n, sj, skh, 2, args.smooth_bi,
                                             args.ps_bi),
          "plan1:", mp.mixed_split_plan(n, sj, skh, 1, args.smooth_bi,
                                        args.ps_bi), flush=True)

    # ||r0|| anchor via one fold residual kernel (cheap, shared anchor)
    h = hier.spacing(hier.num_levels - 1)
    _, sjf, skf = pmf.fold_shape(n)
    bi_r = pmf.fold_residual_block_i(n, sjf, skf, requested=8)
    st_f = mp.setup_mixed_fold_df_problem(s)
    n0_fn = jax.jit(lambda a, b, c, d: jnp.sqrt(
        pmf.residual_df_norm_fold(a, b, c, d, h, n, block_i=bi_r)[1]))
    n0 = float(n0_fn(*st_f))
    print(f"||r0|| = {n0:.4e}", flush=True)

    out_s, best_s, norm_s, it_s = bench(
        "split",
        lambda: mp.make_mixed_split_df_solver(
            s, rel_tol=1e-8, inner_cycles=1,
            smooth_block_i=args.smooth_bi, ps_block_i=args.ps_bi),
        lambda: mp.setup_mixed_split_df_problem(s),
        args.reps,
    )
    print(f"[split] rel {norm_s / n0:.2e}", flush=True)

    if not args.skip_fold:
        out_f, best_f, norm_f, it_f = bench(
            "fold",
            lambda: mp.make_mixed_fold_df_solver(s, rel_tol=1e-8,
                                                 inner_cycles=1),
            lambda: mp.setup_mixed_fold_df_problem(s),
            args.reps,
        )
        print(f"[fold] rel {norm_f / n0:.2e}", flush=True)
        u_s = mp.unpack_mixed_split_solution(*out_s[:4], s)
        u_f = mp.unpack_mixed_fold_solution(out_f[0], out_f[1], s)
        scale = float(jnp.max(jnp.abs(u_f)))
        diff = float(jnp.max(jnp.abs(u_s - u_f)))
        print(f"solution agreement: max|split-fold| = {diff:.3e} "
              f"({diff / scale:.2e} of max {scale:.3e})", flush=True)
        print(f"speedup (best/best): {best_f / best_s:.3f}x  "
              f"outers {it_s} vs {it_f}", flush=True)


if __name__ == "__main__":
    main()

"""Extended benchmark suite: solve times across grid sizes + kernel table.

Writes docs/BENCH_DETAILS.md. The headline driver benchmark stays in
bench.py (one JSON line); this script is for the full performance story.
Run on a TPU host: python scripts/bench_suite.py
"""

import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax.numpy as jnp  # noqa: E402

import multigrid_parallel_tpu as mg  # noqa: E402
from multigrid_parallel_tpu.cycles_padded import (  # noqa: E402
    make_on_device_df_solver,
    setup_df_problem,
)
from multigrid_parallel_tpu.hierarchy import evaluate_on_grid  # noqa: E402
from multigrid_parallel_tpu.ops import pallas3d as pk  # noqa: E402

REL_TOL = 1e-8

# Reference wall times measured from the C/OpenMP code at 4 threads
# (BASELINE.md); None where not measured.
C_BASELINE = {33: 0.0178, 65: 0.115, 129: 0.842, 257: 10.74, 513: None}


def solve_rows():
    rows = []
    for levels in (4, 5, 6, 7, 8):  # 33..513
        hier = mg.Hierarchy(ndim=3, coarse_n=5, num_levels=levels)
        n = hier.finest_n
        cfg = mg.CycleConfig(n_smooth=2)
        run = make_on_device_df_solver(hier, cfg, rel_tol=REL_TOL, inner_cycles=4)
        args = setup_df_problem(mg.poisson_3d_quadratic(), hier)
        out = run(*args)
        float(out[2])  # compile + run
        t0 = time.perf_counter()
        out = run(*args)
        norm, it = float(out[2]), int(out[3])
        wall = time.perf_counter() - t0
        u = pk.df_to_f64(pk.unpad3(out[0], n), pk.unpad3(out[1], n))
        exact = evaluate_on_grid(mg.poisson_3d_quadratic().analytic, hier, levels - 1)
        err = float(jnp.sqrt(jnp.sum((u - exact) ** 2)))
        cref = C_BASELINE.get(n)
        speedup = f"{cref / wall:.1f}x" if cref else "—"
        rows.append(
            f"| {n}³ | {wall:.4f} | {it * 4} | {norm:.2e} | {err:.2e} | "
            f"{cref if cref is not None else '—'} | {speedup} |"
        )
        print(rows[-1], flush=True)
    return rows


def kernel_rows():
    rows = []
    n = 257
    h = 1.0 / (n - 1)
    up = jnp.zeros(pk.padded_shape(n), jnp.float32)
    fp = jnp.ones(pk.padded_shape(n), jnp.float32)
    vol_gb = 3 * up.size * 4 / 1e9

    def t(fn, *args, iters=20):
        x = fn(*args)
        float(jnp.sum(x))
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(x, *args[1:])
        float(jnp.sum(x))
        return (time.perf_counter() - t0) / iters

    smoother = jax.jit(
        lambda u, f: pk.rb_smooth_fused_pipelined(u, f, h, 2, n, block_i=16)
    )
    dt = t(smoother, up, fp)
    rows.append(
        f"| fused RB-GS stage (4 half-sweeps) | {dt * 1e3:.2f} | {vol_gb / dt:.0f} |"
    )
    # the kernel actually wired into the correction cycle
    resid = jax.jit(lambda u, f: pk.residual_fused_pipelined(u, f, h, n, block_i=16))
    dt = t(resid, up, fp)
    rows.append(f"| fused residual (pipelined) | {dt * 1e3:.2f} | {vol_gb / dt:.0f} |")
    dfres = jax.jit(
        lambda u, l, fh, fl: pk.residual_df_fused_padded(u, l, fh, fl, h, n, block_i=16)
    )
    dt = t(dfres, up, up, fp, fp)
    rows.append(
        f"| double-float EFT residual | {dt * 1e3:.2f} | {5 * up.size * 4 / 1e9 / dt:.0f} |"
    )
    for r in rows:
        print(r, flush=True)
    return rows


def main():
    dev = jax.devices()[0]
    solve = solve_rows()
    kern = kernel_rows()
    doc = f"""# Benchmark details (measured on {dev.device_kind}, single chip)

Solver: double-float defect correction (all-f32 on device), fused Pallas
smoother/residual kernels, 2 RB-GS pre+post sweeps, 4 inner f32 V-cycles
per outer defect step, rel tol 1e-8 vs ||f||_2 (the reference driver's
criterion, test_mg_3d.c:19,40). C baseline: gcc -O2 -fopenmp, 4 threads
(BASELINE.md).

## Full solves

| Grid | wall (s) | V-cycles | final resid | err vs analytic | C 4-thr (s) | speedup |
|---|---|---|---|---|---|---|
{chr(10).join(solve)}

## Kernels at 257³ (f32, padded layout)

"Effective GB/s" = minimal algorithmic traffic (u in, f in, u out) over
wall time; actual DMA traffic is higher (halo overlap ~1.5x at bi=16).

| Kernel | ms | effective GB/s |
|---|---|---|
{chr(10).join(kern)}
"""
    out = Path(__file__).resolve().parents[1] / "docs" / "BENCH_DETAILS.md"
    out.parent.mkdir(exist_ok=True)
    out.write_text(doc)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

"""Extended benchmark suite: solve times across grid sizes + kernel table
+ the sweeps behind the performance-path constants.

Writes docs/BENCH_DETAILS.md. The headline driver benchmark stays in
bench.py (one JSON line); this script is for the full performance story.
Run on a TPU host: python scripts/bench_suite.py [--quick]
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

_TINY = None
_LAT_FN = None


def _latency():
    """Dispatch + scalar-readback round trip (axon tunnel: ~3 ms; larger
    than most kernels, so all kernel timings below amortize or subtract it)."""
    global _TINY, _LAT_FN
    if _LAT_FN is None:
        _TINY = jnp.zeros((8, 128), jnp.float32)
        _LAT_FN = jax.jit(lambda t: jnp.sum(t))
    float(_LAT_FN(_TINY))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(_LAT_FN(_TINY))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def solve_rows():
    from multigrid_parallel_tpu.cycles_padded import (
        ref_init_norm,
        untrim_solution,
    )

    rows = []
    for levels in (4, 5, 6, 7, 8):  # 33..513
        hier = mg.Hierarchy(ndim=3, coarse_n=5, num_levels=levels)
        n = hier.finest_n
        cfg = mg.CycleConfig(n_smooth=2)
        prob = mg.poisson_3d_quadratic()
        init = ref_init_norm(prob, hier)
        # the production dispatch (bench.py): split-color tier at the
        # finest level when supported (n >= 257), k-trim otherwise
        from multigrid_parallel_tpu import cycles_split as cs
        use_split = cs.split_available(hier, cfg.n_smooth)
        if use_split:
            run = cs.make_split_df_solver(hier, cfg, rel_tol=REL_TOL,
                                          inner_cycles=4, init_norm=init)
            args = cs.setup_split_df_problem(prob, hier)
        else:
            run = make_on_device_df_solver(hier, cfg, rel_tol=REL_TOL,
                                           inner_cycles=4, trim=True,
                                           init_norm=init)
            args = setup_df_problem(prob, hier, trim=True)
        out = run(*args)
        float(out[-2])  # compile + run
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(*args)
            norm, it = float(out[-2]), int(out[-1])
            best = min(best, time.perf_counter() - t0)
        wall = best
        # free what we can before materializing f64 cubes — at 513³ the
        # split-pair state is ~4 GB and the shared chip can OOM
        del args, run
        try:
            if use_split:
                u = cs.unsplit_solution(*out[:4], prob, hier)
            else:
                u = untrim_solution(out[0], out[1], prob, hier)
            u.block_until_ready()
            del out
            exact = evaluate_on_grid(mg.poisson_3d_quadratic().analytic,
                                     hier, levels - 1)
            err_s = f"{float(jnp.sqrt(jnp.sum((u - exact) ** 2))):.2e}"
            del u, exact
        except Exception as e:  # shared-chip RESOURCE_EXHAUSTED
            err_s = "oom-skipped"
            print(f"  (err column skipped: {type(e).__name__})", flush=True)
        cref = C_BASELINE.get(n)
        speedup = f"{cref / wall:.1f}x" if cref else "—"
        rows.append(
            f"| {n}³ | {wall:.4f} | {it * 4} | {norm:.2e} | {err_s} | "
            f"{cref if cref is not None else '—'} | {speedup} |"
        )
        print(rows[-1], flush=True)
    return rows


def fmg_rows():
    """FMG bootstrap on the performance path vs plain V-cycles at 257³
    (mg_dirichlet_analytic.c:984-1001 capability)."""
    rows = []
    from multigrid_parallel_tpu.cycles_padded import ref_init_norm

    hier = mg.Hierarchy(ndim=3, coarse_n=5, num_levels=7)
    cfg = mg.CycleConfig(n_smooth=2)
    prob = mg.poisson_3d_quadratic()
    init = ref_init_norm(prob, hier)
    args = setup_df_problem(prob, hier, trim=True)
    for use_fmg in (False, True):
        run = make_on_device_df_solver(
            hier, cfg, rel_tol=REL_TOL, inner_cycles=4, use_fmg=use_fmg,
            trim=True, init_norm=init,
        )
        out = run(*args)
        float(out[2])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(*args)
            norm, it = float(out[2]), int(out[3])
            best = min(best, time.perf_counter() - t0)
        label = "FMG bootstrap + V-cycles" if use_fmg else "V-cycles only"
        rows.append(f"| {label} | {best:.4f} | {it} | {norm:.2e} |")
        print(rows[-1], flush=True)
    return rows


def crossover_rows():
    """The sweep behind _JNP_LEVEL_MAX: whole-solve wall time at 257³ as
    the Pallas/jnp level crossover moves."""
    rows = []
    from multigrid_parallel_tpu.cycles_padded import ref_init_norm

    hier = mg.Hierarchy(ndim=3, coarse_n=5, num_levels=7)
    cfg = mg.CycleConfig(n_smooth=2)
    prob = mg.poisson_3d_quadratic()
    init = ref_init_norm(prob, hier)
    args = setup_df_problem(prob, hier, trim=True)
    for lmax in (17, 33, 65):
        run = make_on_device_df_solver(
            hier, cfg, rel_tol=REL_TOL, inner_cycles=4, jnp_level_max=lmax,
            trim=True, init_norm=init,
        )
        out = run(*args)
        float(out[2])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(*args)
            float(out[2])  # sync
            best = min(best, time.perf_counter() - t0)
        rows.append(f"| {lmax} | {best:.4f} |")
        print(rows[-1], flush=True)
    return rows


def kernel_rows():
    """Kernel table incl. the block_i sweep behind the smoother default.
    Measured on the k-TRIM layout (the shipped lane widths; kernels are
    shape-driven) plus the split-color finest-level stage."""
    rows = []
    n = 257
    h = 1.0 / (n - 1)
    up = jnp.zeros(pk.padded_shape_trim(n), jnp.float32)
    fp = jnp.ones(pk.padded_shape_trim(n), jnp.float32)
    vol_gb = 3 * up.size * 4 / 1e9
    lat = _latency()

    def t(fn, *args, iters=20):
        x = fn(*args)
        float(jnp.sum(x))
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(x, *args[1:])
        float(jnp.sum(x))
        return (time.perf_counter() - t0 - lat) / iters

    for bi in (8, 16, 24):
        smoother = jax.jit(
            lambda u, f, bi=bi: pk.rb_smooth_fused_pipelined(
                u, f, h, 2, n, block_i=bi
            )
        )
        dt = t(smoother, up, fp)
        rows.append(
            f"| trim RB-GS stage (4 half-sweeps, bi={bi}) | {dt * 1e3:.2f} | "
            f"{vol_gb / dt:.0f} |"
        )
    from multigrid_parallel_tpu.ops import pallas_split as psp
    if psp.split_supported(n):
        # The split stage takes 4 device buffers per call; Python-chained
        # dispatches through the axon tunnel serialize on the per-dispatch
        # host cost and inflate it ~4x (round-4 1.71 ms artifact), so this
        # row uses the jit-fused chain-slope method (CLAUDE.md) instead.
        _, sjs, skh = psp.split_shape(n)
        bi_s = psp.split_smooth_block_i(n, sjs, skh, 2, requested=32)
        ur = jnp.zeros((n, sjs, skh), jnp.float32)
        ub = jnp.zeros((n, sjs, skh), jnp.float32)
        fr = jnp.ones((n, sjs, skh), jnp.float32)
        fb = jnp.ones((n, sjs, skh), jnp.float32)
        # No per-link rescale: the iterate evolves through the kernel
        # (no CSE risk, RB-GS is a contraction so no overflow) and an
        # unfused elementwise pass would add ~70 MB of HBM traffic per
        # link that the vol_s accounting below excludes.

        def chain(c):
            @jax.jit
            def f(a, b, fr, fb):
                for _ in range(c):
                    a, b = psp.rb_smooth_split(a, b, fr, fb, h, 2, n,
                                               red_first=True, block_i=bi_s)
                return jnp.sum(a) + jnp.sum(b)
            float(f(ur, ub, fr, fb))
            ts = []
            for _ in range(6):
                t0 = time.perf_counter()
                float(f(ur, ub, fr, fb))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        dt = (chain(8) - chain(2)) / 6
        vol_s = 6 * ur.size * 4 / 1e9  # 2 colors x (u in, f in, u out)
        rows.append(
            f"| split-color RB-GS stage (4 half-sweeps, bi={bi_s}) | "
            f"{dt * 1e3:.2f} | {vol_s / dt:.0f} |"
        )
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


def stage_rows():
    """Per-stage profile of the padded cycle at 257³ (the fused path)."""
    from multigrid_parallel_tpu.utils.timing import profile_padded_stages

    hier = mg.Hierarchy(ndim=3, coarse_n=5, num_levels=7)
    rows_raw, lat = profile_padded_stages(hier, mg.CycleConfig(n_smooth=2),
                                          trim=True, method="slope",
                                          reps=8)
    rows = [f"| {lbl} | {t * 1e3:.2f} |" for lbl, t in rows_raw]
    for r in rows:
        print(r, flush=True)
    print(f"(chain-slope method: dispatch latency [{lat * 1e3:.2f} ms "
          f"measured] cancels in the slope)")
    return rows, lat


def electrospray_row():
    """65³ electrospray mixed-BC solve on the jit-fused path."""
    from multigrid_parallel_tpu.mixed_bc import MixedBCSolver
    from multigrid_parallel_tpu.models.electrospray import electrospray_problem

    prob = electrospray_problem()
    hier = mg.Hierarchy(ndim=3, coarse_n=5, num_levels=5, length=prob.length)
    s = MixedBCSolver(prob, hier, n_smooth=2)
    # anchor: the INITIAL residual norm (f = 0 here, so the reference's
    # ||f|| convention is vacuous; absolute residuals read as huge
    # because the electrode voltages span 1350 V / h² ~ 1e9)
    init = float(s.make_on_device_solver(rel_tol=1e-8, max_cycles=0,
                                         inner_cycles=2)(*s.initial_state())[1])
    run = s.make_on_device_solver(rel_tol=1e-8, inner_cycles=2)
    u0, f = s.initial_state()
    out = run(u0, f)
    float(out[1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(u0, f)
        norm, it = float(out[1]), int(out[2])
        best = min(best, time.perf_counter() - t0)
    row = (f"| electrospray 65³ (f32 inner, f64 outer, inner_cycles=2) | "
           f"{best:.4f} | {it} | {norm / init:.2e} (of ||r0||={init:.2e}) |")
    print(row, flush=True)
    return row


def electrospray_fold_rows():
    """257³ electrospray on the k-FOLD fused tier (round-4: the mixed
    twin of k-trim — ops.pallas_mixed_fold) vs the full-layout fused
    tier, production config (gamma=2 W-cycles, mg_3d_bkup.c geometry)."""
    from multigrid_parallel_tpu import mixed_padded as mp
    from multigrid_parallel_tpu.mixed_bc import MixedBCSolver
    from multigrid_parallel_tpu.models.electrospray import electrospray_problem

    prob = electrospray_problem()
    hier = mg.Hierarchy(ndim=3, coarse_n=5, num_levels=7, length=prob.length)
    # gamma_min_n = finest/4: the convergence-lossless W-cycle depth cap
    # (docs/MIXED_BC.md §4 — caps 33/65/129 measured 0.137/0.119/0.131 s,
    # 129 loses convergence).
    s = MixedBCSolver(prob, hier, n_smooth=2, gamma=2,
                      gamma_min_n=(hier.finest_n - 1) // 4 + 1)
    rows = []
    for name, make, setup in (
        ("electrospray 257³ fold tier (W-cycle)",
         mp.make_mixed_fold_df_solver, mp.setup_mixed_fold_df_problem),
        ("electrospray 257³ full-layout tier (W-cycle)",
         mp.make_mixed_padded_df_solver, mp.setup_mixed_df_problem),
    ):
        run = make(s, rel_tol=1e-8, inner_cycles=1)
        st = setup(s)
        out = run(*st)
        float(out[2])
        best = float("inf")
        for _ in range(3):
            st = setup(s)
            t0 = time.perf_counter()
            out = run(*st)
            norm, it = float(out[2]), int(out[3])
            best = min(best, time.perf_counter() - t0)
        rows.append(f"| {name} | {best:.4f} | {it} | {norm:.2e} |")
        print(rows[-1], flush=True)
    return rows


def north_star_rows(n_levels=7):
    """Regenerates docs/ACCURACY.md's 257³ convention-2 table: V-cycles
    to 1e-10 relative to the INITIAL INTERIOR residual ||r0|| (the
    iterative-methods convention — 1e-10 vs ||f|| is below the f64
    evaluation floor, see ACCURACY.md), one f32 V-cycle per df defect
    step, n_smooth in {2, 3, 4}."""
    from multigrid_parallel_tpu.cycles_padded import ref_init_norm

    hier = mg.Hierarchy(ndim=3, coarse_n=5, num_levels=n_levels)
    prob = mg.poisson_3d_quadratic()
    rows = []
    for ns in (2, 3, 4):
        cfg = mg.CycleConfig(n_smooth=ns)
        st = setup_df_problem(prob, hier, trim=True)
        # convention-2 anchor: ||r0|| via one EFT residual pass
        n = hier.finest_n
        h = hier.spacing(n_levels - 1)

        @jax.jit
        def r0_norm(u_hi, u_lo, f_hi, f_lo):
            _, nrm2 = pk.residual_df_norm_fused_padded(
                u_hi, u_lo, f_hi, f_lo, h, n)
            return jnp.sqrt(nrm2)

        init_r0 = float(r0_norm(*st))
        run = make_on_device_df_solver(
            hier, cfg, rel_tol=1e-10, max_cycles=40, inner_cycles=1,
            trim=True, init_norm=init_r0,
        )
        _, _, norm, it = run(*st)
        rows.append((ns, int(it), float(norm) / init_r0))
        print(f"north-star n_smooth={ns}: {int(it)} V-cycles to "
              f"{float(norm)/init_r0:.2e} (vs ||r0||={init_r0:.3e})",
              flush=True)
    lines = ["| n_smooth | V-cycles to 1e-10 (vs ||r0||) | final rel resid |",
             "|---|---|---|"]
    for ns, it, rel in rows:
        lines.append(f"| {ns} | {it} | {rel:.2e} |")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="solve table + kernels only")
    ap.add_argument("--north-star", action="store_true",
                    help="regenerate the ACCURACY.md 257^3 1e-10 "
                         "convention-2 table and exit")
    args = ap.parse_args()

    if args.north_star:
        print(north_star_rows())
        return

    dev = jax.devices()[0]
    solve = solve_rows()
    kern = kernel_rows()
    if not args.quick:
        fmg = fmg_rows()
        cross = crossover_rows()
        stages, lat = stage_rows()
        esp = electrospray_row()
        esp_fold = electrospray_fold_rows()
    else:
        fmg, cross, stages, esp, lat = [], [], [], "", 0.0
        esp_fold = []

    extra = ""
    if not args.quick:
        extra = f"""
## FMG bootstrap vs plain V-cycles (257³, rel tol 1e-8)

The performance-path FMG (make_padded_fmg_bootstrap: full multigrid on
the initial defect equation) vs the plain while_loop. n_outer excludes
the bootstrap itself (the reference reports FMG separately,
mg_dirichlet_analytic.c:984-1001).

| variant | wall (s) | outer steps | final resid |
|---|---|---|---|
{chr(10).join(fmg)}

## Pallas/jnp crossover sweep (the number behind _JNP_LEVEL_MAX)

Whole 257³ solve wall time as levels ≤ lmax take the masked-roll XLA
path instead of Pallas launches:

| jnp_level_max | wall (s) |
|---|---|
{chr(10).join(cross)}

## Per-stage profile of the padded k-trim cycle (257³)

Each fused stage timed as its own jitted call, best-of-20, dispatch
latency ({lat * 1e3:.2f} ms through the axon tunnel) subtracted.
Rows much smaller than the latency (the ≤65³ stages, true cost
~0.05 ms) are dispatch-jitter bound here — single-call timings cannot
resolve them; the chain-slope measurements in docs/ROOFLINE.md are the
accurate per-kernel numbers.

| stage | ms |
|---|---|
{chr(10).join(stages)}

## Mixed-BC (electrospray) on the jit-fused path

The 65³ row's residual is RELATIVE to the initial residual norm (the
solve anchors on ||r0|| because f = 0); the 257³ rows run the Pallas
performance tiers (fold = the round-4 k-fold layout, docs/MIXED_BC.md
§3) and quote the absolute final f32 residual of the same converged
solve (||r0|| ~ 4e9 there).

| solve | wall (s) | outer steps | final resid |
|---|---|---|---|
{esp}
{chr(10).join(esp_fold)}
"""

    doc = f"""# Benchmark details (measured on {dev.device_kind}, single chip)

Solver: double-float defect correction (all-f32 on device), fused Pallas
smoother/residual kernels, 2 RB-GS pre+post sweeps, 4 inner f32 V-cycles
per outer defect step, rel tol 1e-8 vs ||f||_2 (the reference driver's
criterion, test_mg_3d.c:19,40). C baseline: gcc -O2 -fopenmp, 4 threads
(BASELINE.md). All timings best-of-N (shared chip, ±30% contention —
CLAUDE.md); see scripts/roofline.py for the latency-calibrated kernel
cross-checks and docs/ROOFLINE.md for the bound analysis.

Every table measures the SHIPPED layouts: the solve table runs the
production dispatch (split-color finest level at n >= 257 on top of
k-trim — bench.py's path), the FMG/crossover tables the k-trim solver,
the kernel/stage tables k-trim shapes plus the split-color stage, and
the electrospray rows the mixed fused tiers (full + k-fold). The 33³
solve row is DISPATCH-LATENCY-BOUND: ~16 dispatch+readback round trips
through the axon tunnel (~23-26 ms each, amortized by the jit-fused
while_loop to ~3 ms visible each) dominate its wall time — device
compute is ~5 ms; the C reference at 33³ has no such floor.

## Full solves

| Grid | wall (s) | V-cycles | final resid | err vs analytic | C 4-thr (s) | speedup |
|---|---|---|---|---|---|---|
{chr(10).join(solve)}

## Kernels at 257³ (f32, k-trim layout; split row on split pairs)

"Effective GB/s" = minimal algorithmic traffic (u in, f in, u out) over
wall time; actual DMA traffic is higher (halo overlap at bi=16-24).
The bi sweep is the measurement behind the smoother's block defaults.

| Kernel | ms | effective GB/s |
|---|---|---|
{chr(10).join(kern)}
{extra}"""
    out = Path(__file__).resolve().parents[1] / "docs" / "BENCH_DETAILS.md"
    out.parent.mkdir(exist_ok=True)
    out.write_text(doc)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

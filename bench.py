"""Headline benchmark: 3D Poisson 257^3 full multigrid solve on one chip.

Reproduces the reference's headline workload (test_mg_3d.c: coarseN=5,
levels such that finest=257, 2 RB-GS pre+post sweeps, relative residual
tolerance 1e-8 against ||f||_2 — BASELINE.md measures the C/OpenMP code at
10.74 s wall / ~113 Mlattice-updates/s on 4 CPU threads).

Solver under test: the all-f32 double-float performance path — fused
Pallas smoother/residual kernels inside an f32 correction V-cycle,
wrapped in a defect-correction outer loop whose solution is a two-f32
double-float pair and whose residual is a compensated
(error-free-transformation) Pallas kernel. No f64 ops anywhere on
device; the whole solve is one jitted lax.while_loop. Accuracy matches
the f64 path (solution error 2.1e-9 vs the analytic oracle at 257^3).

Layout (round 4): the finest level runs SPLIT-COLOR — each field is a
red/black pair with k compressed to the interior planes (half the
k-TRIM stage's computed points at equal HBM traffic; transfer k-taps
become lane rolls — cycles_split). Coarser levels stay on the k-TRIM
rect layout (high-k boundary folded into the RHS, 2/3 the full-layout
lanes). Measured 257^3 same-session: split 0.0570 s vs trim 0.0615 s
wall. Falls back to the trim solver when the split tier is unavailable
at the requested size.

Metric: time-to-solution (best-of-repeats wall seconds); vs_baseline =
baseline wall 10.74 s / our wall. The derived smoother throughput in
Mlattice-updates/s = (V-cycles x 2x2 half-sweeps x interior^3 x 1.14
level-sum) / wall-time — the metric BASELINE.md derives for the C code —
is recorded in detail.smoother_mups. Prints exactly one JSON line.
"""

import json
import statistics
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import multigrid_parallel_tpu as mg  # noqa: E402
from multigrid_parallel_tpu.cycles_padded import (  # noqa: E402
    make_on_device_df_solver,
    setup_df_problem,
)

BASELINE_MUPS = 113.0  # BASELINE.md: derived C/OpenMP throughput, 4 threads
REL_TOL = 1e-8  # the reference driver's tolerance (test_mg_3d.c:19)
INNER_CYCLES = 4  # f32 V-cycles per f64 defect-correction step


def run(levels: int = 7, n_smooth: int = 2, repeats: int = 6,
        use_fmg: bool = False, inner_cycles: int = INNER_CYCLES):
    # repeats=6 best-of: the dev chip is shared and per-run contention
    # varies ~30%; median is reported alongside so the recorded artifact
    # carries both the contention floor and the typical run.
    hier = mg.Hierarchy(ndim=3, coarse_n=5, num_levels=levels)  # 257^3
    cfg = mg.CycleConfig(n_smooth=n_smooth)
    problem = mg.poisson_3d_quadratic()

    from multigrid_parallel_tpu import cycles_split as cs
    from multigrid_parallel_tpu.cycles_padded import ref_init_norm

    init = ref_init_norm(problem, hier)
    use_split = not use_fmg and cs.split_available(hier, cfg.n_smooth)
    if use_split:
        solver = cs.make_split_df_solver(
            hier, cfg, rel_tol=REL_TOL, max_cycles=40,
            inner_cycles=inner_cycles, init_norm=init,
        )
        args = cs.setup_split_df_problem(problem, hier)
    else:
        solver = make_on_device_df_solver(
            hier, cfg, rel_tol=REL_TOL, max_cycles=40,
            inner_cycles=inner_cycles, use_fmg=use_fmg,
            trim=True, init_norm=init,
        )
        args = setup_df_problem(problem, hier, trim=True)

    # Warm-up: compile + one full solve.
    out = solver(*args)
    norm, n_outer = float(out[-2]), int(out[-1])
    assert norm <= REL_TOL * init, (norm, init)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = solver(*args)
        norm, n_outer = float(out[-2]), int(out[-1])  # host sync
        times.append(time.perf_counter() - t0)
    best = min(times)
    median = statistics.median(times)

    # Each timed call pays one dispatch + scalar-readback round trip
    # (~26 ms through the axon tunnel — docs/ROOFLINE.md); measure it so
    # the artifact records how much of the wall is tunnel, not chip.
    import jax.numpy as jnp
    tiny = jnp.zeros((8, 128), jnp.float32)
    lat_fn = jax.jit(lambda t: jnp.sum(t))
    float(lat_fn(tiny))
    lat_times = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(lat_fn(tiny))
        lat_times.append(time.perf_counter() - t0)
    lat = min(lat_times)

    n = hier.finest_n
    interior = (n - 2) ** 3
    # FMG bootstrap work ~ one extra V-cycle equivalent across levels
    n_cycles = n_outer * inner_cycles + (1 if use_fmg else 0)
    # 1.14: sum over levels of (1/8)^k work ratio (BASELINE.md derivation)
    updates = n_cycles * 4 * interior * 1.14
    mups = updates / best / 1e6
    # The headline metric is TIME-TO-SOLUTION (same problem, same 1e-8
    # relative tolerance); vs_baseline = baseline wall / our wall. For
    # equal cycle counts this equals the throughput ratio mups/113; when
    # the solver needs FEWER cycles than the reference's 16 (e.g. tuned
    # inner_cycles or FMG), time-to-solution is the honest comparison —
    # a throughput ratio would penalize algorithmic improvements.
    # (Metric renamed from round-1/2's *_smoother_throughput so
    # round-over-round artifact diffs can't mix the two definitions;
    # the derived throughput stays in detail.smoother_mups.)
    return {
        "metric": "3d_poisson_257_time_to_solution",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(10.74 / best, 2),
        "detail": {
            "smoother_mups": round(mups, 1),
            "wall_time_s": round(best, 4),
            "wall_time_median_s": round(median, 4),
            "sync_latency_s": round(lat, 4),
            "wall_time_device_est_s": round(max(best - lat, 0.0), 4),
            "vs_baseline_median": round(10.74 / median, 2),
            "vs_baseline_throughput": round(mups / BASELINE_MUPS, 2),
            "n_vcycles": n_cycles,
            "n_outer_defect_steps": n_outer,
            "inner_cycles": inner_cycles,
            "use_fmg": use_fmg,
            "rel_tol": REL_TOL,
            "final_residual": norm,
            "initial_residual": init,
            "grid": f"{n}^3",
            "layout": "split-color" if use_split else "k-trim",
            "n_smooth": n_smooth,
            "baseline_wall_time_s": 10.74,
            "backend": jax.default_backend(),
        },
    }


if __name__ == "__main__":
    print(json.dumps(run(use_fmg="--fmg" in sys.argv)))

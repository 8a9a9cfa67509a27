"""Standalone smoother convergence studies.

The reference ships two study drivers: test_rb_gs_3d.c (red-black GS
under OpenMP, the workload behind red_black_gs_scalability.txt) and
test_gs_3d.c (sequential lexicographic GS) — each runs one pre- + one
post-smoother pair per iteration on the analytic Dirichlet problem and
prints the per-iteration residual ratio until it stagnates near the
smoother's asymptotic value (~0.98 at 50^3).
"""

from __future__ import annotations

import dataclasses
import time
from typing import List

import jax
import jax.numpy as jnp

from multigrid_parallel_tpu.cycles import setup_problem
from multigrid_parallel_tpu.hierarchy import Hierarchy
from multigrid_parallel_tpu.models.poisson import poisson_3d_quadratic
from multigrid_parallel_tpu.ops import stencils_3d as ops3


@dataclasses.dataclass
class StudyResult:
    residual_norms: List[float]
    initial_residual: float
    n_iters: int
    converged: bool
    wall_time_s: float

    @property
    def final_ratio(self) -> float:
        return self.residual_norms[-1] / self.residual_norms[-2]


def _setup_any_n(n: int):
    """Reference-style (u0, f) setup for an arbitrary n^3 grid — the
    studies don't need a 2^k+1 hierarchy (the reference's is 50^3,
    red_black_gs_scalability.txt:1)."""
    import numpy as np

    from multigrid_parallel_tpu.hierarchy import apply_boundary

    h = 1.0 / (n - 1)
    prob = poisson_3d_quadratic()
    c = jnp.asarray(np.arange(n) * h)
    bc = prob.bc(c[:, None, None], c[None, :, None], c[None, None, :])
    bc = jnp.broadcast_to(bc, (n, n, n))
    f = apply_boundary(jnp.zeros((n, n, n), bc.dtype), bc)
    u = apply_boundary(jnp.zeros_like(f), bc)
    return u, f, h


def smoother_study(
    num_levels: int = 4,
    coarse_n: int = 5,
    smoother: str = "rb",
    rel_tol: float = 1e-8,
    max_iters: int = 2000,
    use_pallas: bool = False,
    verbose: bool = False,
    n: int = 0,
    n_smooth: int = 1,
) -> StudyResult:
    """Pure-smoother convergence study (no multigrid): per iteration one
    red-first + one black-first smoothing pair, like the
    preSmoother+postSmoother pair per iteration of test_rb_gs_3d.c:69-71.

    ``n`` > 0 overrides the hierarchy-derived size (any n, e.g. the
    reference's 50).
    """
    if n:
        u, f, h = _setup_any_n(n)
    else:
        hier = Hierarchy(ndim=3, coarse_n=coarse_n, num_levels=num_levels)
        u, f = setup_problem(poisson_3d_quadratic(), hier)
        h = hier.finest_spacing
        n = hier.finest_n

    if smoother == "rb" and use_pallas:
        from multigrid_parallel_tpu.ops import pallas3d as pk

        # Pad once, outside the timed loop; the iteration carries the
        # padded field so each step times only the kernels (the padded
        # layout is the kernels' native layout, not per-call overhead).
        fp_const = pk.pad3(f)

        def step(up):
            up = pk.rb_smooth_fused_padded(up, fp_const, h, n_smooth, n, red_first=True)
            up = pk.rb_smooth_fused_padded(up, fp_const, h, n_smooth, n, red_first=False)
            u = pk.unpad3(up, n)
            return up, ops3.residual_norm(u, f, h)

        u = pk.pad3(u)

    elif smoother == "rb":

        def step(u):
            u = ops3.rb_smooth(u, f, h, n_smooth, red_first=True)
            u = ops3.rb_smooth(u, f, h, n_smooth, red_first=False)
            return u, ops3.residual_norm(u, f, h)

    elif smoother == "lex":

        def step(u):
            u = ops3.gauss_seidel_lex(u, f, h, 2 * n_smooth)
            u = ops3.update_edge_values(u)  # GaussSeidelSmoother does this
            return u, ops3.residual_norm(u, f, h)

    elif smoother == "jacobi":

        def step(u):
            u = ops3.jacobi_smooth(u, f, h, 2 * n_smooth)
            return u, ops3.residual_norm(u, f, h)

    else:
        raise ValueError(f"unknown smoother {smoother!r}")

    step = jax.jit(step)
    init = float(jnp.sqrt(jnp.sum(f * f)))
    t0 = time.perf_counter()
    norms: List[float] = []
    converged = False
    old = init
    for it in range(max_iters):
        u, norm = step(u)
        v = float(norm)
        norms.append(v)
        if verbose and (it < 10 or it % 50 == 0):
            print(f"iter {it:5d}  resid {v:.6e}  ResidRatio {v / old:.6f}")
        old = v
        if v <= rel_tol * init:
            converged = True
            break
    jax.block_until_ready(u)
    return StudyResult(
        residual_norms=norms,
        initial_residual=init,
        n_iters=len(norms),
        converged=converged,
        wall_time_s=time.perf_counter() - t0,
    )

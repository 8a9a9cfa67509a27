"""Electrospray mixed-BC solver tests (the mg_3d_bkup.c capability)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multigrid_parallel_tpu.hierarchy import Hierarchy
from multigrid_parallel_tpu.mixed_bc import MixedBCSolver, build_mixed_coarse_matrix
from multigrid_parallel_tpu.models.electrospray import (
    EXTRACTOR_VOLTAGE,
    electrospray_problem,
)


@pytest.fixture(scope="module")
def solver():
    prob = electrospray_problem()
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=3, length=prob.length)  # 17^3
    return MixedBCSolver(prob, hier, n_smooth=2)


def test_mixed_coarse_matrix_rows():
    prob = electrospray_problem()
    n = 5
    mask, _ = prob.boundary_masks(n)
    h = prob.length / (n - 1)
    a = build_mixed_coarse_matrix(n, h, mask)
    # capillary center on X=0 face is Dirichlet -> identity row
    p = 0 * n * n + (n // 2) * n + (n // 2)
    assert mask[0, n // 2, n // 2]
    assert a[p, p] == 1.0 and np.count_nonzero(a[p]) == 1
    # corner (0,0,0) is Neumann with z-face copy source (0,0,1)
    assert a[0, 0] == 1.0 and a[0, 1] == -1.0 and np.count_nonzero(a[0]) == 2
    # nonsingular
    assert np.linalg.matrix_rank(a) == a.shape[0]


def test_electrospray_converges(solver):
    u, norms, init = solver.solve(rel_tol=1e-8, max_cycles=60)
    assert norms[-1] <= 1e-8 * init, norms[-5:]
    un = np.asarray(u)
    # physical sanity: potential bracketed by the electrode voltages
    assert un.min() >= EXTRACTOR_VOLTAGE - 1e-6
    assert un.max() <= 1e-6
    # Dirichlet electrodes held exactly
    n = un.shape[0]
    mask, vals = solver.problem.boundary_masks(n)
    np.testing.assert_allclose(un[mask], np.asarray(vals)[mask], atol=1e-10)
    # Neumann faces: boundary equals adjacent interior (zero normal
    # derivative), checked on face interiors away from electrodes
    s = slice(1, -1)
    ymask = ~mask[s, 0, s]
    np.testing.assert_allclose(
        un[s, 0, s][ymask], un[s, 1, s][ymask], atol=1e-8
    )


def test_electrospray_residual_decreases_multigrid_fast(solver):
    _, norms, init = solver.solve(rel_tol=1e-8, max_cycles=60)
    ratios = [b / a for a, b in zip([init] + norms, norms)][1:6]
    assert all(r < 0.7 for r in ratios), ratios

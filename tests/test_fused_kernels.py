"""Direct coverage for the production fused Pallas kernels that only
dispatch above the jnp/Pallas level crossover (cycles_padded dispatches
them for levels > jnp_level_max, so default-config tests at <= 33^3 never
execute their kernel bodies). Here each kernel is called directly at
sizes where its block planner accepts (interpreter mode on CPU), and the
whole padded cycle / df solver is re-run with an injected small
``jnp_level_max`` so every fused kernel runs inside the real cycle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from multigrid_parallel_tpu import CycleConfig, Hierarchy, poisson_3d_quadratic
from multigrid_parallel_tpu import cycles_padded as cp
from multigrid_parallel_tpu.cycles import _descend, setup_problem
from multigrid_parallel_tpu.hierarchy import evaluate_on_grid
from multigrid_parallel_tpu.ops import coarse as coarse_ops
from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import stencils_3d as ops3

N = 33
H = 1.0 / (N - 1)


def _rand_cube(seed, n=N, zero_boundary=False):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, n, n)).astype(np.float32)
    if zero_boundary:
        y = np.zeros_like(x)
        y[1:-1, 1:-1, 1:-1] = x[1:-1, 1:-1, 1:-1]
        x = y
    return jnp.asarray(x)


@pytest.mark.parametrize("n", [17, 33])
@pytest.mark.parametrize("red_first", [True, False])
def test_rb_smooth_from_zero_fused_matches_jnp(n, red_first):
    h = 1.0 / (n - 1)
    rng = np.random.default_rng(21)
    f = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    want = np.asarray(ops3.rb_smooth(jnp.zeros_like(f), f, h, 2,
                                     red_first=red_first))
    got_p = pk.rb_smooth_from_zero_fused(
        pk.pad3(f), h, 2, n, red_first=red_first, block_i=16
    )
    got = np.asarray(pk.unpad3(got_p, n))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_rb_smooth_from_zero_small_block():
    # force the partial-tail path (nb = cdiv(33, 8) = 5, tail 1 plane)
    f = _rand_cube(22)
    want = np.asarray(ops3.rb_smooth(jnp.zeros_like(f), f, H, 1))
    got = np.asarray(pk.unpad3(
        pk.rb_smooth_from_zero_fused(pk.pad3(f), H, 1, N, block_i=8), N))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("block_i", [4, 8])
def test_residual_restrict_fused_matches_separate(block_i):
    u = _rand_cube(23)
    f = _rand_cube(24)
    res = ops3.residual(u, f, H)
    want = np.asarray(ops3.restrict_full_weighting(res))
    _, sj, sk = pk.padded_shape(N)
    assert pk.rr_fused_block_i(N, sj, sk) >= block_i
    got_p = pk.residual_restrict_fused_padded(
        pk.pad3(u), pk.pad3(f), H, N, block_i=block_i
    )
    nc = (N + 1) // 2
    got = np.asarray(pk.unpad3(got_p, nc))
    # residuals are O(h^-2) here; tolerance scales with the data
    tol = 2e-6 * np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=0, atol=tol)
    # padded region and coarse boundary stay exactly zero
    full = np.asarray(got_p)
    assert np.all(full[0] == 0) and np.all(full[nc - 1 :] == 0)
    assert np.all(full[:, nc:, :] == 0) and np.all(full[:, :, nc:] == 0)


@pytest.mark.parametrize("n_iter", [1, 2])
@pytest.mark.parametrize("block_i", [4, 8])
def test_prolong_smooth_fused_matches_separate(n_iter, block_i):
    nc = (N + 1) // 2
    ec = _rand_cube(25, n=nc, zero_boundary=True)
    e = _rand_cube(26, zero_boundary=True)
    r = _rand_cube(27, zero_boundary=True)
    e2 = ops3.prolong_correct(ec, e)
    want = np.asarray(ops3.rb_smooth(e2, r, H, n_iter, red_first=False))
    _, sj, sk = pk.padded_shape(N)
    assert pk.ps_fused_block_i(N, sj, sk, n_iter) >= block_i
    got_p = pk.prolong_smooth_fused_padded(
        pk.pad3(ec), pk.pad3(e), pk.pad3(r), H, n_iter, N, block_i=block_i
    )
    got = np.asarray(pk.unpad3(got_p, N))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_padded_cycle_forced_pallas_matches_jnp_cycle():
    """num_levels=4 (33^3) with jnp_level_max=9: levels 17 and 33 take the
    fused-kernel dispatch (from-zero smoother, residual+restrict,
    prolong+correct+smooth) instead of the masked-roll path."""
    hier32 = Hierarchy(ndim=3, coarse_n=5, num_levels=4, dtype=jnp.float32)
    cfg = CycleConfig(n_smooth=2)
    n = hier32.finest_n
    r = _rand_cube(28, n=n, zero_boundary=True)

    coarse32 = coarse_ops.make_coarse_solver(5, hier32.spacing(0), 3,
                                             jnp.float32, "lu")
    want = _descend(
        ops3, hier32, cfg, coarse32, jnp.zeros_like(r), r, 3, correction=True
    )

    cyc = cp.make_padded_correction_cycle(hier32, cfg, jnp_level_max=9)
    got_p = cyc(None, pk.pad3(r), from_zero=True)
    np.testing.assert_allclose(
        np.asarray(pk.unpad3(got_p, n)), np.asarray(want), rtol=5e-5, atol=5e-5
    )


def test_fmg_df_solver_reduces_outer_steps():
    """FMG bootstrap on the performance path (defect-equation FMG):
    fewer outer defect steps at equal accuracy — the padded twin of
    mg_dirichlet_analytic.c's useFMG driver."""
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4)  # 33^3
    cfg = CycleConfig(n_smooth=2)
    st = cp.setup_df_problem(poisson_3d_quadratic(), hier)
    outs = {}
    for fmg in (False, True):
        run = cp.make_on_device_df_solver(
            hier, cfg, rel_tol=1e-8, inner_cycles=1, use_fmg=fmg
        )
        u_hi, u_lo, norm, n_outer = run(*st)
        u = pk.unpad3(pk.df_to_f64(u_hi, u_lo), hier.finest_n)
        exact = evaluate_on_grid(poisson_3d_quadratic().analytic, hier, 3)
        err = float(jnp.sqrt(jnp.sum((u - exact) ** 2)))
        assert err < 2e-8, (fmg, err)
        outs[fmg] = int(n_outer)
    assert outs[True] < outs[False], outs


def test_df_solver_forced_pallas_converges_to_oracle():
    """The full double-float performance solver with every Pallas kernel
    forced on (jnp_level_max=9) — the 257^3 bench path's code shape at a
    test-sized grid."""
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4)  # 33^3
    cfg = CycleConfig(n_smooth=2)
    run = cp.make_on_device_df_solver(
        hier, cfg, rel_tol=1e-8, inner_cycles=2, jnp_level_max=9
    )
    u_hi, u_lo, f_hi, f_lo = cp.setup_df_problem(poisson_3d_quadratic(), hier)
    u_hi, u_lo, norm, n_outer = run(u_hi, u_lo, f_hi, f_lo)
    init = float(jnp.sqrt(jnp.sum(f_hi * f_hi)))
    assert float(norm) <= 1e-8 * init
    assert int(n_outer) <= 10, int(n_outer)
    u = pk.unpad3(pk.df_to_f64(u_hi, u_lo), hier.finest_n)
    exact = evaluate_on_grid(poisson_3d_quadratic().analytic, hier, 3)
    err = float(jnp.sqrt(jnp.sum((u - exact) ** 2)))
    assert err < 2e-8, err

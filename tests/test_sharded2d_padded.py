"""2D-mesh distributed padded-Pallas path (parallel/sharded2d_padded)
on the 8-virtual-device CPU mesh, interpreter mode.

Chain of custody mirrors test_sharded_padded.py: the 2D ext kernels are
compared against the jnp local fallbacks (both run inside the SAME
shard_map cycle via the jnp_level_max dispatch), the 2D sharded cycle
against the single-chip padded cycle, and the whole-solve driver
against the analytic oracle and the 1D driver's convergence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigrid_parallel_tpu import CycleConfig, Hierarchy, poisson_3d_quadratic
from multigrid_parallel_tpu import cycles_padded as cp
from multigrid_parallel_tpu.hierarchy import evaluate_on_grid
from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.parallel import sharded2d_padded as s2p
from multigrid_parallel_tpu.parallel.sharded2d import ShardPlan2D, make_mesh_2d

N = 33


def _zb(x):
    y = np.zeros_like(x)
    y[1:-1, 1:-1, 1:-1] = x[1:-1, 1:-1, 1:-1]
    return y


def _rand(seed, n=N):
    rng = np.random.default_rng(seed)
    return jnp.asarray(_zb(rng.standard_normal((n, n, n)).astype(np.float32)))


def _to_global(x, plan):
    n = x.shape[0]
    _, sj, _ = pk.padded_shape(n)
    xp = pk.pad3(x)
    return jnp.pad(
        xp,
        ((0, plan.padded_i(0) - n), (0, plan.padded_j(0) - sj), (0, 0)),
    )


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh_2d(4, 2)


def _plan(hier, nx=4, ny=2):
    return s2p.plan_sharding_2d_padded(hier, nx, ny)


def test_plan_padded_alignment():
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4, dtype=jnp.float32)
    plan = _plan(hier)
    assert plan.fine_local_j % 8 == 0
    assert plan.fine_local_i % (1 << plan.n_sharded) == 0
    assert plan.padded_i(0) >= hier.finest_n
    assert plan.padded_j(0) >= pk.padded_shape(hier.finest_n)[1]


@pytest.mark.parametrize("gamma,gamma_min_n", [(1, 0), (2, 0), (2, 17)])
def test_sharded2d_padded_cycle_matches_single_chip(mesh, gamma, gamma_min_n):
    # gamma_min_n=17 pins the W-cycle depth cap (skips only the 9-level
    # revisit) against the identically-capped single-chip padded cycle.
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4, dtype=jnp.float32)
    cfg = CycleConfig(n_smooth=2, gamma=gamma, gamma_min_n=gamma_min_n)
    r = _rand(21)
    plan = _plan(hier)
    cyc_sh, _ = s2p.make_sharded2d_padded_cycle(
        hier, cfg, mesh, plan, jnp_level_max=9, block_i=4
    )
    rg = _to_global(r, plan)
    got = cyc_sh(jnp.zeros_like(rg), rg)

    cyc1 = cp.make_padded_correction_cycle(hier, cfg, jnp_level_max=9)
    want = np.asarray(pk.unpad3(cyc1(None, pk.pad3(r), from_zero=True), N))
    scale = np.abs(want).max()
    np.testing.assert_allclose(
        np.asarray(got)[:N, :N, :N], want, rtol=0, atol=2e-6 * scale
    )


def test_sharded2d_padded_jnp_fallback_matches_pallas(mesh):
    """Forced-Pallas (2D ext kernels) vs all-jnp local ops — the two
    dispatch paths of the 2D distributed cycle agree."""
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4, dtype=jnp.float32)
    cfg = CycleConfig(n_smooth=2)
    r = _rand(22)
    plan = _plan(hier)
    rg = _to_global(r, plan)
    cyc_jnp, _ = s2p.make_sharded2d_padded_cycle(
        hier, cfg, mesh, plan, jnp_level_max=10**9
    )
    cyc_pal, _ = s2p.make_sharded2d_padded_cycle(
        hier, cfg, mesh, plan, jnp_level_max=9, block_i=4
    )
    a = np.asarray(cyc_jnp(jnp.zeros_like(rg), rg))[:N, :N, :N]
    b = np.asarray(cyc_pal(jnp.zeros_like(rg), rg))[:N, :N, :N]
    scale = np.abs(a).max()
    np.testing.assert_allclose(b, a, rtol=0, atol=2e-6 * scale)


def test_sharded2d_padded_solver_converges_to_oracle(mesh):
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4)  # 33^3
    cfg = CycleConfig(n_smooth=2)
    run, plan = s2p.make_sharded2d_padded_df_solver(
        hier, cfg, mesh, rel_tol=1e-8, inner_cycles=2,
        jnp_level_max=9, block_i=4,
    )
    st = s2p.setup_df_problem_sharded2d_padded(
        poisson_3d_quadratic(), hier, mesh, plan
    )
    u_hi, u_lo, norm, n_outer = run(*st)
    init = float(jnp.sqrt(jnp.sum(st[2].astype(jnp.float64) ** 2)))
    assert float(norm) <= 1e-8 * init
    assert int(n_outer) <= 10, int(n_outer)
    u = s2p.unpad_solution2d(u_hi, u_lo, hier)
    exact = evaluate_on_grid(poisson_3d_quadratic().analytic, hier, 3)
    err = float(jnp.sqrt(jnp.sum((u - exact) ** 2)))
    assert err < 5e-8, err


def test_sharded2d_padded_solver_matches_1d(mesh):
    """Same outer-step count and ~same final residual as the 1D padded
    driver (same math, different decomposition)."""
    from multigrid_parallel_tpu.parallel import sharded_padded as sp
    from multigrid_parallel_tpu.parallel.sharded import make_mesh

    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4)
    cfg = CycleConfig(n_smooth=2)

    run2, plan2 = s2p.make_sharded2d_padded_df_solver(
        hier, cfg, mesh, rel_tol=1e-8, inner_cycles=2,
        jnp_level_max=9, block_i=4,
    )
    st2 = s2p.setup_df_problem_sharded2d_padded(
        poisson_3d_quadratic(), hier, mesh, plan2
    )
    _, _, norm2, n2 = run2(*st2)

    mesh1 = make_mesh(8)
    run1, plan1 = sp.make_sharded_df_solver(
        hier, cfg, mesh1, rel_tol=1e-8, inner_cycles=2,
        jnp_level_max=9, block_i=4,
    )
    st1 = sp.setup_df_problem_sharded_padded(
        poisson_3d_quadratic(), hier, mesh1, plan1
    )
    _, _, norm1, n1 = run1(*st1)

    assert int(n2) == int(n1)
    assert float(norm2) == pytest.approx(float(norm1), rel=2e-2)


def test_sharded2d_padded_mesh_orientation_invariance():
    """(4,2) and (2,4) meshes produce the same solve (global-index
    masks under both orientations)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=3)  # 17^3
    cfg = CycleConfig(n_smooth=2)
    outs = []
    for nx, ny in [(4, 2), (2, 4)]:
        mesh = make_mesh_2d(nx, ny)
        run, plan = s2p.make_sharded2d_padded_df_solver(
            hier, cfg, mesh, rel_tol=1e-8, inner_cycles=2,
            jnp_level_max=5, block_i=2,
        )
        st = s2p.setup_df_problem_sharded2d_padded(
            poisson_3d_quadratic(), hier, mesh, plan
        )
        u_hi, u_lo, norm, n_outer = run(*st)
        outs.append(
            (np.asarray(s2p.unpad_solution2d(u_hi, u_lo, hier)), int(n_outer))
        )
    assert outs[0][1] == outs[1][1]
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=0, atol=1e-10)


def test_sharded2d_padded_trim_matches_full(mesh):
    """k-TRIM through the 2D solver: same outer count, same solution."""
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4)  # 33^3
    cfg = CycleConfig(n_smooth=2)
    prob = poisson_3d_quadratic()
    init = cp.ref_init_norm(prob, hier)

    plan = _plan(hier)
    run_t, _ = s2p.make_sharded2d_padded_df_solver(
        hier, cfg, mesh, plan, rel_tol=1e-8, inner_cycles=2,
        jnp_level_max=9, block_i=4, trim=True, init_norm=init,
    )
    st_t = s2p.setup_df_problem_sharded2d_padded(prob, hier, mesh, plan,
                                                 trim=True)
    u_hi, u_lo, norm_t, it_t = run_t(*st_t)
    u_t = s2p.untrim_solution2d(u_hi, u_lo, prob, hier)

    run_f, _ = s2p.make_sharded2d_padded_df_solver(
        hier, cfg, mesh, plan, rel_tol=1e-8, inner_cycles=2,
        jnp_level_max=9, block_i=4,
    )
    st_f = s2p.setup_df_problem_sharded2d_padded(prob, hier, mesh, plan)
    fu_hi, fu_lo, norm_f, it_f = run_f(*st_f)
    u_f = s2p.unpad_solution2d(fu_hi, fu_lo, hier)
    # full solution lacks re-attached boundary handling difference: both
    # cover the full cube (full layout stores boundaries directly)
    assert int(it_t) == int(it_f)
    assert float(norm_t) <= 1e-8 * init
    np.testing.assert_allclose(np.asarray(u_t), np.asarray(u_f),
                               rtol=0, atol=1e-10)


def test_lj8_level_falls_back():
    """Regression (round-3 review): a Pallas-active level with Lj == 8
    used to clamp the prolong stage's coarse j halo to 4 columns and
    shift the static band mapping (39% error on a (2,4) mesh at 33^3).
    The _use_pallas2d gate requires Lj >= 2*HJ; since round 4 the
    narrow-Lj level runs the j-REPLICATED 1D fused tier instead of the
    jnp fallback (gather j to full width, 1D ext kernels, slice back)
    — either way the cycle must match the single-chip cycle."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh_2d(2, 4)
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4, dtype=jnp.float32)
    cfg = CycleConfig(n_smooth=2)
    plan = s2p.plan_sharding_2d_padded(hier, 2, 4)
    # depth-1 level (n=17) has Lj == 8 under this plan — the config
    # that used to corrupt the correction; it now dispatches the
    # j-replicated 1D tier (pinned here so a gate regression is loud)
    assert plan.local_j(1) == 8
    assert not s2p._use_pallas2d(17, plan.local_i(1), 8, 4, 9)
    assert plan.local_i(1) >= 6  # the 1D-jrep tier's Li gate holds
    r = _rand(31)
    cyc_sh, _ = s2p.make_sharded2d_padded_cycle(
        hier, cfg, mesh, plan, jnp_level_max=9, block_i=4
    )
    rg = _to_global(r, plan)
    got = np.asarray(cyc_sh(jnp.zeros_like(rg), rg))[:N, :N, :N]
    cyc1 = cp.make_padded_correction_cycle(hier, cfg, jnp_level_max=9)
    want = np.asarray(pk.unpad3(cyc1(None, pk.pad3(r), from_zero=True), N))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6 * scale)

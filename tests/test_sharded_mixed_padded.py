"""Distributed electrospray performance tier (sharded_mixed_padded)
vs the single-chip fused mixed solver (CPU 8-virtual-device mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigrid_parallel_tpu import mixed_padded as mp
from multigrid_parallel_tpu.hierarchy import Hierarchy
from multigrid_parallel_tpu.mixed_bc import MixedBCSolver
from multigrid_parallel_tpu.models.electrospray import electrospray_problem
from multigrid_parallel_tpu.parallel import sharded_mixed_padded as smp
from multigrid_parallel_tpu.parallel.sharded import make_mesh


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def _solve_single(s, rel_tol, inner_cycles, jnp_level_max, block_i):
    run = mp.make_mixed_padded_df_solver(
        s, rel_tol=rel_tol, inner_cycles=inner_cycles,
        jnp_level_max=jnp_level_max, block_i=block_i,
    )
    st = mp.setup_mixed_df_problem(s)
    u_hi, u_lo, norm, n_outer = run(*st)
    return mp.unpack_mixed_solution(u_hi, u_lo, s.hier), float(norm), int(n_outer)


@pytest.mark.parametrize("jlm,block_i,gamma_min_n",
                         [(9, 4, 0), (33, 4, 0), (9, 4, 17)])
def test_sharded_mixed_padded_matches_single_chip(mesh, jlm, block_i,
                                                  gamma_min_n):
    """jlm=9 forces the mixed ext Pallas kernels at the sharded level;
    jlm=33 exercises the jnp fallback local path (apply_bcs_local_padded
    + masked-roll smoother); gamma_min_n=17 pins the W-cycle depth cap
    through the sharded mixed padded recursion against the
    identically-capped single-chip tier."""
    prob = electrospray_problem()
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4, length=prob.length)
    s = MixedBCSolver(prob, hier, n_smooth=2, gamma=2,
                      gamma_min_n=gamma_min_n)

    u1, norm1, outer1 = _solve_single(s, 1e-6, 2, jlm, block_i)

    run, plan = smp.make_sharded_mixed_padded_df_solver(
        s, mesh, rel_tol=1e-6, inner_cycles=2,
        jnp_level_max=jlm, block_i=block_i,
    )
    st = smp.setup_mixed_df_problem_sharded(s, mesh, plan)
    u_hi, u_lo, norm, n_outer = run(*st)
    us = smp.unpack_mixed_solution_sharded(u_hi, u_lo, hier)

    assert int(n_outer) == outer1, (int(n_outer), outer1)
    assert float(norm) == pytest.approx(norm1, rel=1e-3)
    scale = float(jnp.max(jnp.abs(u1)))
    np.testing.assert_allclose(np.asarray(us), np.asarray(u1),
                               rtol=0, atol=1e-6 * scale)


def test_sharded_mixed_padded_device_counts_converge(mesh):
    """Each device count converges to the same single-chip solution
    (2 devices shard three levels, 8 devices one — the f32 convergence
    PATH differs across gather depths, so this pins correctness per
    count rather than bitwise cross-count equality, exactly like the
    Dirichlet test_sharded_df_solver_device_count_invariance)."""
    prob = electrospray_problem()
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4, length=prob.length)
    s = MixedBCSolver(prob, hier, n_smooth=2, gamma=2)
    u1, norm1, outer1 = _solve_single(s, 1e-6, 2, 9, 4)
    scale = float(jnp.max(jnp.abs(u1)))

    for nd in (2, 8):
        m = make_mesh(nd)
        run, plan = smp.make_sharded_mixed_padded_df_solver(
            s, m, rel_tol=1e-6, inner_cycles=2, jnp_level_max=9, block_i=4,
        )
        st = smp.setup_mixed_df_problem_sharded(s, m, plan)
        u_hi, u_lo, norm, n_outer = run(*st)
        us = np.asarray(smp.unpack_mixed_solution_sharded(u_hi, u_lo, hier))
        assert int(n_outer) == outer1, (nd, int(n_outer), outer1)
        # the residual fell ~6 orders; path-dependent f32 rounding leaves
        # ~1e-5-relative differences in the final iterate
        np.testing.assert_allclose(us, np.asarray(u1), rtol=0,
                                   atol=2e-5 * scale, err_msg=str(nd))


def test_sharded_mixed_padded_halo_tier_matches_single_chip(mesh):
    """block_i=8 with fine_local=12 dispatches the mixed HALO-DMA
    kernels (round 4): mixed_rb_smooth_halo at bi=8 with an overlapping
    tail (12 % 8 != 0) and mixed_prolong_smooth_halo at bi=6 — the
    production tier the default block_i=4 tests never reach."""
    from multigrid_parallel_tpu.parallel.sharded import ShardPlan
    from multigrid_parallel_tpu.parallel.sharded_padded import _halo_bi
    from multigrid_parallel_tpu.ops import pallas_mixed as pmx
    from multigrid_parallel_tpu.ops import pallas3d as pk

    prob = electrospray_problem()
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4, length=prob.length)
    s = MixedBCSolver(prob, hier, n_smooth=2, gamma=2)

    # the gates this test exists to exercise actually fire at L=12
    n = hier.finest_n
    _, sj, sk = pk.padded_shape(n)
    bi_s = pmx.mixed_block_i(n, sj, sk, 2, requested=8)
    bi_p = pmx.mixed_prolong_block_i(n, sj, sk, 2, requested=8)
    assert _halo_bi(bi_s, 12, 4) == 8      # smoother: overlap blocks
    assert _halo_bi(bi_p, 12, 6) == 6      # prolong: halo tier

    u1, norm1, outer1 = _solve_single(s, 1e-6, 2, 9, 8)

    plan = ShardPlan(n_dev=8, axis="x", n_sharded=2, fine_local=12)
    run, plan = smp.make_sharded_mixed_padded_df_solver(
        s, mesh, plan=plan, rel_tol=1e-6, inner_cycles=2,
        jnp_level_max=9, block_i=8,
    )
    st = smp.setup_mixed_df_problem_sharded(s, mesh, plan)
    u_hi, u_lo, norm, n_outer = run(*st)
    us = smp.unpack_mixed_solution_sharded(u_hi, u_lo, hier)

    assert int(n_outer) == outer1, (int(n_outer), outer1)
    assert float(norm) == pytest.approx(norm1, rel=1e-3)
    scale = float(jnp.max(jnp.abs(u1)))
    np.testing.assert_allclose(np.asarray(us), np.asarray(u1),
                               rtol=0, atol=1e-6 * scale)

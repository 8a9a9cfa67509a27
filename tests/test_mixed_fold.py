"""k-FOLD mixed-BC tier (ops.pallas_mixed_fold + mixed_padded fold
driver): layout roundtrips, kernel-vs-full-layout equivalence, and the
whole-solve twin test against the reference-shaped path.

Reference parity target: mg_3d_bkup.c (whole program) — the fold
layout must not change the iterates on interior nodes at all (folded
boundary reads are exact Neumann copies)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_parallel_tpu import Hierarchy
from multigrid_parallel_tpu import mixed_padded as mp
from multigrid_parallel_tpu.mixed_bc import MixedBCSolver
from multigrid_parallel_tpu.models.electrospray import electrospray_problem
from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import pallas_mixed as pm
from multigrid_parallel_tpu.ops import pallas_mixed_fold as pmf


def _solver(num_levels=4, **kw):
    prob = electrospray_problem()
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=num_levels,
                     length=prob.length)
    return MixedBCSolver(prob, hier, n_smooth=2, **kw)


def _rand_padded(n, seed=0, bc_consistent=True, solver=None):
    """Padded (n, sj, sk) f32 field; optionally with the mixed BCs
    applied (zero-pin correction form) so fold reads == stored reads."""
    rng = np.random.default_rng(seed)
    _, sj, sk = pk.padded_shape(n)
    x = np.zeros((n, sj, sk), np.float32)
    x[:n, :n, :n] = rng.standard_normal((n,) * 3).astype(np.float32)
    xp = jnp.asarray(x)
    if bc_consistent:
        pin = pm.dirichlet_pin_planes(solver.problem, n, sj, sk)
        xp = mp.apply_bcs_padded(xp, n, pin)
    return xp


def test_fold_pack_unpack_roundtrip():
    s = _solver()
    n = s.hier.finest_n
    xp = _rand_padded(n, 3, bc_consistent=True, solver=s)
    xf = pmf.pack_fold(xp, n)
    assert xf.shape == pmf.fold_shape(n)
    back = pmf.unpack_fold(xf, n)
    # BC-consistent fields roundtrip exactly on the n x n x n cube
    np.testing.assert_array_equal(
        np.asarray(pk.unpad3(back, n)), np.asarray(pk.unpad3(xp, n))
    )


def test_fold_smoother_matches_full_layout():
    """The fold smoother produces bit-identical interior iterates to
    the full-layout mixed smoother (folded reads are exact copies)."""
    s = _solver()
    n = s.hier.finest_n
    h = s.hier.spacing(s.hier.num_levels - 1)
    _, sj, sk = pk.padded_shape(n)
    _, sjf, skf = pmf.fold_shape(n)
    pin_full = pm.dirichlet_pin_planes(s.problem, n, sj, sk)
    pin_fold = pmf.fold_pin_planes(s.problem, n, sjf, skf)
    e = _rand_padded(n, 5, solver=s)
    r = _rand_padded(n, 6, bc_consistent=False, solver=s)
    out_full = pm.mixed_rb_smooth_fused(e, r, pin_full, h, 2, n, True, 4)
    out_fold = pmf.mixed_rb_smooth_fold(
        pmf.pack_fold(e, n), pmf.pack_fold(r, n), pin_fold, h, 2, n, True, 4
    )
    a = np.asarray(pk.unpad3(pmf.unpack_fold(out_fold, n), n))
    b = np.asarray(pk.unpad3(out_full, n))
    # interior + x/y faces must agree bitwise; the reconstructed z
    # faces may differ only at Dirichlet-pinned x-face edge nodes
    np.testing.assert_array_equal(a[:, :, 1:-1], b[:, :, 1:-1])
    mask0 = np.asarray(pin_full[0, :n, :n]) > 0.5
    for kface in (0, n - 1):
        diff = a[:, :, kface] != b[:, :, kface]
        assert not diff[1:-1].any()
        assert not (diff[0] & ~mask0).any()


def test_fold_from_zero_matches():
    s = _solver()
    n = s.hier.finest_n
    h = s.hier.spacing(s.hier.num_levels - 1)
    _, sj, sk = pk.padded_shape(n)
    _, sjf, skf = pmf.fold_shape(n)
    pin_full = pm.dirichlet_pin_planes(s.problem, n, sj, sk)
    pin_fold = pmf.fold_pin_planes(s.problem, n, sjf, skf)
    r = _rand_padded(n, 7, bc_consistent=False, solver=s)
    out_full = pm.mixed_rb_smooth_from_zero_fused(r, pin_full, h, 2, n,
                                                  True, 4)
    out_fold = pmf.mixed_rb_smooth_from_zero_fold(
        pmf.pack_fold(r, n), pin_fold, h, 2, n, True, 4
    )
    a = np.asarray(pk.unpad3(pmf.unpack_fold(out_fold, n), n))
    b = np.asarray(pk.unpad3(out_full, n))
    np.testing.assert_array_equal(a[:, :, 1:-1], b[:, :, 1:-1])


def test_fold_residual_restrict_matches():
    """Fold rr vs the Dirichlet fused rr on a BC-consistent field (the
    full-layout mixed path reuses the Dirichlet kernel verbatim)."""
    s = _solver()
    n = s.hier.finest_n
    nc = (n + 1) // 2
    h = s.hier.spacing(s.hier.num_levels - 1)
    e = _rand_padded(n, 8, solver=s)
    r = _rand_padded(n, 9, bc_consistent=False, solver=s)
    rc_full = pk.residual_restrict_fused_padded(e, r, h, n, block_i=4)
    rc_fold = pmf.residual_restrict_fold(
        pmf.pack_fold(e, n), pmf.pack_fold(r, n), h, n, block_i=4
    )
    a = np.asarray(rc_fold[:, :nc, : nc - 2])
    b = np.asarray(rc_full[:, :nc, 1 : nc - 1])
    np.testing.assert_allclose(a, b, rtol=0,
                               atol=2e-6 * np.abs(b).max())


def test_fold_prolong_smooth_matches():
    s = _solver()
    n = s.hier.finest_n
    nc = (n + 1) // 2
    h = s.hier.spacing(s.hier.num_levels - 1)
    _, sj, sk = pk.padded_shape(n)
    _, sjf, skf = pmf.fold_shape(n)
    pin_full = pm.dirichlet_pin_planes(s.problem, n, sj, sk)
    pin_fold = pmf.fold_pin_planes(s.problem, n, sjf, skf)
    e = _rand_padded(n, 10, solver=s)
    r = _rand_padded(n, 11, bc_consistent=False, solver=s)
    # BC-consistent coarse correction (its boundary carries copies)
    rng = np.random.default_rng(12)
    _, sjc, skc = pk.padded_shape(nc)
    ecn = np.zeros((nc, sjc, skc), np.float32)
    ecn[:nc, :nc, :nc] = 0.1 * rng.standard_normal((nc,) * 3)
    pin_c = pm.dirichlet_pin_planes(s.problem, nc, sjc, skc)
    ec = mp.apply_bcs_padded(jnp.asarray(ecn), nc, pin_c)
    out_full = pm.mixed_prolong_smooth_fused(ec, e, r, pin_full, h, 2, n,
                                             block_i=4)
    _, sjcf, skcf = pmf.fold_shape(nc)
    sgn_c = pmf.fold_edge_sign_planes(s.problem, nc, sjcf, skcf)
    assert bool(np.any(np.asarray(sgn_c)))  # the case the fix covers
    out_fold = pmf.mixed_prolong_smooth_fold(
        pmf.pack_fold(ec, nc), pmf.pack_fold(e, n), pmf.pack_fold(r, n),
        pin_fold, sgn_c, h, 2, n, block_i=4,
    )
    a = np.asarray(pk.unpad3(pmf.unpack_fold(out_fold, n), n))
    b = np.asarray(pk.unpad3(out_full, n))
    np.testing.assert_allclose(a[:, :, 1:-1], b[:, :, 1:-1], rtol=0,
                               atol=2e-6 * np.abs(b).max())


def test_fold_residual_df_norm_matches():
    s = _solver()
    n = s.hier.finest_n
    h = s.hier.spacing(s.hier.num_levels - 1)
    u_hi, u_lo, f_hi, f_lo = mp.setup_mixed_df_problem(s)
    r_full, nrm2_full = pk.residual_df_norm_fused_padded(
        u_hi, u_lo, f_hi, f_lo, h, n, block_i=4
    )
    r_fold, nrm2_fold = pmf.residual_df_norm_fold(
        pmf.pack_fold(u_hi, n), pmf.pack_fold(u_lo, n),
        pmf.pack_fold(f_hi, n), pmf.pack_fold(f_lo, n), h, n, block_i=4
    )
    scale = float(jnp.max(jnp.abs(r_full)))
    np.testing.assert_allclose(
        np.asarray(r_fold[:, :n, : n - 2]),
        np.asarray(r_full[:, :n, 1 : n - 1]),
        rtol=0, atol=1e-6 * scale,
    )
    np.testing.assert_allclose(float(nrm2_fold), float(nrm2_full),
                               rtol=1e-5)


def test_mixed_fold_df_solver_matches_padded_path():
    """Whole-solve twin test: the fold tier reproduces the full padded
    tier's outer count and solution (cf. mg_3d_bkup.c driver golden)."""
    s = _solver()
    hier = s.hier
    run_fold = mp.make_mixed_fold_df_solver(
        s, rel_tol=1e-8, inner_cycles=1, jnp_level_max=9, block_i=4
    )
    st_f = mp.setup_mixed_fold_df_problem(s)
    uf_hi, uf_lo, norm_f, it_f = run_fold(*st_f)
    u_fold = mp.unpack_mixed_fold_solution(uf_hi, uf_lo, s)

    run_full = mp.make_mixed_padded_df_solver(
        s, rel_tol=1e-8, inner_cycles=1, jnp_level_max=9, block_i=4
    )
    st = mp.setup_mixed_df_problem(s)
    u_hi, u_lo, norm, it = run_full(*st)
    u_full = mp.unpack_mixed_solution(u_hi, u_lo, hier)

    assert int(it_f) == int(it)
    scale = float(jnp.max(jnp.abs(u_full)))
    assert float(jnp.max(jnp.abs(u_fold - u_full))) < 1e-7 * scale
    np.testing.assert_allclose(float(norm_f), float(norm), rtol=1e-3)


def test_mixed_fold_df_solver_wcycle():
    """gamma=2 (the production electrospray config) through the fold
    tier: same outer count as the reference-shaped host W-cycle."""
    s = _solver(gamma=2)
    run_fold = mp.make_mixed_fold_df_solver(
        s, rel_tol=1e-8, inner_cycles=1, jnp_level_max=9, block_i=4
    )
    st_f = mp.setup_mixed_fold_df_problem(s)
    _, _, _, it_f = run_fold(*st_f)
    _, _, it_ref, _ = s.solve_on_device(
        rel_tol=1e-8, max_cycles=60, inner_cycles=1
    )
    assert int(it_f) == it_ref
    assert int(it_f) <= 20


def test_mixed_wcycle_depth_cap():
    """gamma_min_n (the W-cycle depth cap, docs/MIXED_BC.md §4): at 33^3
    capping revisits to sub-levels >= 17 skips only the 9-level revisit
    and costs at most ~1 extra cycle; the fused fold tier honors the cap
    and matches the capped host device cycle's outer count."""
    full = _solver(gamma=2)
    capped = _solver(gamma=2, gamma_min_n=17)
    _, norms_f, _ = full.solve(rel_tol=1e-8)
    _, norms_c, init_c = capped.solve(rel_tol=1e-8)
    assert len(norms_f) <= len(norms_c) <= len(norms_f) + 2
    assert norms_c[-1] <= 1e-8 * init_c

    run_fold = mp.make_mixed_fold_df_solver(
        capped, rel_tol=1e-8, inner_cycles=1, jnp_level_max=9, block_i=4
    )
    st_f = mp.setup_mixed_fold_df_problem(capped)
    _, _, _, it_f = run_fold(*st_f)
    _, _, it_ref, _ = capped.solve_on_device(
        rel_tol=1e-8, max_cycles=60, inner_cycles=1
    )
    assert int(it_f) == it_ref

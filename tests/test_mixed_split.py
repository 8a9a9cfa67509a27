"""Mixed-BC split-color tier (ops.pallas_mixed_split + the mixed_padded
split driver): layout roundtrips, kernel-vs-fold-tier equivalence
(smoother BITWISE — the folded boundary reads are exact Neumann
copies and the nbr addition order matches), and the whole-solve twin
test against the fold tier.

Reference parity target: mg_3d_bkup.c (whole program) — the layout
must not change the iterates on interior nodes at all."""

import jax.numpy as jnp
import numpy as np

from multigrid_parallel_tpu import Hierarchy
from multigrid_parallel_tpu import mixed_padded as mp
from multigrid_parallel_tpu.mixed_bc import MixedBCSolver
from multigrid_parallel_tpu.models.electrospray import electrospray_problem
from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import pallas_mixed as pm
from multigrid_parallel_tpu.ops import pallas_mixed_fold as pmf
from multigrid_parallel_tpu.ops import pallas_mixed_split as pms
from multigrid_parallel_tpu.ops import pallas_split as psp


def _solver(num_levels=4, **kw):
    prob = electrospray_problem()
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=num_levels,
                     length=prob.length)
    return MixedBCSolver(prob, hier, n_smooth=2, **kw)


def _rand_padded(n, seed=0, bc_consistent=True, solver=None):
    rng = np.random.default_rng(seed)
    _, sj, sk = pk.padded_shape(n)
    x = np.zeros((n, sj, sk), np.float32)
    x[:n, :n, :n] = rng.standard_normal((n,) * 3).astype(np.float32)
    xp = jnp.asarray(x)
    if bc_consistent:
        pin = pm.dirichlet_pin_planes(solver.problem, n, sj, sk)
        xp = mp.apply_bcs_padded(xp, n, pin)
    return xp


def _packs(solver, n):
    _, sj, skh = psp.split_shape(n)
    return pms.msplit_pin_packs(solver.problem, n, sj, skh)


def test_fold_split_roundtrip():
    s = _solver()
    n = s.hier.finest_n
    xp = _rand_padded(n, 3, solver=s)
    xf = pmf.pack_fold(xp, n)
    xr, xb = pms.fold_to_split(xf, n)
    assert xr.shape == psp.split_shape(n)
    back = pms.split_to_fold(xr, xb, n)
    # stored lanes (k = 1..n-2) roundtrip exactly
    np.testing.assert_array_equal(
        np.asarray(back[:, :, : n - 2]), np.asarray(xf[:, :, : n - 2])
    )
    # pack_split on the full padded array agrees with the fold route
    yr, yb = psp.pack_split(xp, n)
    np.testing.assert_array_equal(np.asarray(yr), np.asarray(xr))
    np.testing.assert_array_equal(np.asarray(yb), np.asarray(xb))


def test_pin_packs_mapping():
    """packs[p][face][j, kk] == pin_full[face][j, 2kk+1+p]."""
    s = _solver()
    n = s.hier.finest_n
    _, sjp, skp = pk.padded_shape(n)
    full = np.asarray(pm.dirichlet_pin_planes(s.problem, n, sjp, skp))
    assert full.any()  # the extractor annulus is live at 33^3
    _, sj, skh = psp.split_shape(n)
    packs = np.asarray(pms.msplit_pin_packs(s.problem, n, sj, skh))
    for p in (0, 1):
        for kk in range(skh):
            k = 2 * kk + 1 + p
            want = full[:, :sj, k] if k <= n - 2 else 0.0
            np.testing.assert_array_equal(packs[p, :, :, kk], want)


def test_msplit_smoother_bitwise_vs_fold():
    """The split smoother's iterates are BIT-identical to the fold
    (and hence full-layout) mixed smoother."""
    s = _solver()
    n = s.hier.finest_n
    h = s.hier.spacing(s.hier.num_levels - 1)
    _, sjf, skf = pmf.fold_shape(n)
    pin_fold = pmf.fold_pin_planes(s.problem, n, sjf, skf)
    pinp = _packs(s, n)
    e = _rand_padded(n, 5, solver=s)
    r = _rand_padded(n, 6, bc_consistent=False, solver=s)
    for red_first in (True, False):
        out_fold = pmf.mixed_rb_smooth_fold(
            pmf.pack_fold(e, n), pmf.pack_fold(r, n), pin_fold, h, 2, n,
            red_first, 4)
        er, eb = psp.pack_split(e, n)
        fr, fb = psp.pack_split(r, n)
        o_r, o_b = pms.mixed_rb_smooth_msplit(
            er, eb, fr, fb, pinp, h, 2, n, red_first=red_first, block_i=4)
        back = pms.split_to_fold(o_r, o_b, n)
        np.testing.assert_array_equal(
            np.asarray(back[:, :, : n - 2]),
            np.asarray(out_fold[:, :, : n - 2]),
        )


def test_msplit_from_zero_bitwise():
    s = _solver()
    n = s.hier.finest_n
    h = s.hier.spacing(s.hier.num_levels - 1)
    _, sjf, skf = pmf.fold_shape(n)
    pin_fold = pmf.fold_pin_planes(s.problem, n, sjf, skf)
    pinp = _packs(s, n)
    r = _rand_padded(n, 7, bc_consistent=False, solver=s)
    out_fold = pmf.mixed_rb_smooth_from_zero_fold(
        pmf.pack_fold(r, n), pin_fold, h, 2, n, True, 4)
    fr, fb = psp.pack_split(r, n)
    o_r, o_b = pms.mixed_rb_smooth_from_zero_msplit(
        fr, fb, pinp, h, 2, n, red_first=True, block_i=4)
    back = pms.split_to_fold(o_r, o_b, n)
    np.testing.assert_array_equal(
        np.asarray(back[:, :, : n - 2]),
        np.asarray(out_fold[:, :, : n - 2]),
    )


def test_msplit_residual_restrict_matches_fold():
    """Split rr emits the same coarse FOLD RHS as the fold rr kernel
    (MXU k-band vs VPU compress differ only in rounding)."""
    s = _solver()
    n = s.hier.finest_n
    nc = (n + 1) // 2
    h = s.hier.spacing(s.hier.num_levels - 1)
    e = _rand_padded(n, 8, solver=s)
    r = _rand_padded(n, 9, bc_consistent=False, solver=s)
    rc_fold = pmf.residual_restrict_fold(
        pmf.pack_fold(e, n), pmf.pack_fold(r, n), h, n, block_i=4)
    er, eb = psp.pack_split(e, n)
    fr, fb = psp.pack_split(r, n)
    rc_split = pms.residual_restrict_msplit(er, eb, fr, fb, h, n,
                                            block_i=4)
    assert rc_split.shape == rc_fold.shape
    a = np.asarray(rc_split[:, :nc, : nc - 2])
    b = np.asarray(rc_fold[:, :nc, : nc - 2])
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-6 * np.abs(b).max())


def test_msplit_prolong_smooth_matches_fold():
    """Split ps vs fold ps, including the pin-priority delta fix (the
    33^3 coarse level exercises it)."""
    s = _solver()
    n = s.hier.finest_n
    nc = (n + 1) // 2
    h = s.hier.spacing(s.hier.num_levels - 1)
    _, sjf, skf = pmf.fold_shape(n)
    pin_fold = pmf.fold_pin_planes(s.problem, n, sjf, skf)
    pinp = _packs(s, n)
    e = _rand_padded(n, 10, solver=s)
    r = _rand_padded(n, 11, bc_consistent=False, solver=s)
    rng = np.random.default_rng(12)
    _, sjc, skc = pk.padded_shape(nc)
    ecn = np.zeros((nc, sjc, skc), np.float32)
    ecn[:nc, :nc, :nc] = 0.1 * rng.standard_normal((nc,) * 3)
    pin_c = pm.dirichlet_pin_planes(s.problem, nc, sjc, skc)
    ec = mp.apply_bcs_padded(jnp.asarray(ecn), nc, pin_c)
    _, sjcf, skcf = pmf.fold_shape(nc)
    sgn_c = pmf.fold_edge_sign_planes(s.problem, nc, sjcf, skcf)
    assert bool(np.any(np.asarray(sgn_c)))  # the case the fix covers
    ec_f = pmf.pack_fold(ec, nc)
    out_fold = pmf.mixed_prolong_smooth_fold(
        ec_f, pmf.pack_fold(e, n), pmf.pack_fold(r, n),
        pin_fold, sgn_c, h, 2, n, block_i=4)
    er, eb = psp.pack_split(e, n)
    fr, fb = psp.pack_split(r, n)
    o_r, o_b = pms.mixed_prolong_smooth_msplit(
        ec_f, er, eb, fr, fb, pinp, sgn_c, h, 2, n, block_i=4,
        with_delta=True)
    back = pms.split_to_fold(o_r, o_b, n)
    # valid rows only: the fold kernel leaves (don't-care) j-band
    # output on the pad rows; the split kernel masks them to zero
    a = np.asarray(back[:, :n, : n - 2])
    b = np.asarray(out_fold[:, :n, : n - 2])
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-6 * np.abs(b).max())


def test_msplit_residual_df_norm_matches_fold():
    s = _solver()
    n = s.hier.finest_n
    h = s.hier.spacing(s.hier.num_levels - 1)
    u_hi, u_lo, f_hi, f_lo = mp.setup_mixed_df_problem(s)
    r_fold, nrm2_fold = pmf.residual_df_norm_fold(
        pmf.pack_fold(u_hi, n), pmf.pack_fold(u_lo, n),
        pmf.pack_fold(f_hi, n), pmf.pack_fold(f_lo, n), h, n, block_i=4)
    args = (*psp.pack_split(u_hi, n), *psp.pack_split(u_lo, n),
            *psp.pack_split(f_hi, n), *psp.pack_split(f_lo, n))
    r_r, r_b, nrm2 = pms.residual_df_norm_msplit(*args, h, n, block_i=4)
    back = pms.split_to_fold(r_r, r_b, n)
    scale = float(jnp.max(jnp.abs(r_fold)))
    np.testing.assert_allclose(
        np.asarray(back[:, :n, : n - 2]),
        np.asarray(r_fold[:, :n, : n - 2]),
        rtol=0, atol=1e-6 * scale,
    )
    np.testing.assert_allclose(float(nrm2), float(nrm2_fold), rtol=1e-5)


def test_apply_bcs_split_pair_matches_fold():
    s = _solver()
    n = s.hier.finest_n
    _, sjf, skf = pmf.fold_shape(n)
    _, sj, skh = psp.split_shape(n)
    pin_fold = pmf.fold_pin_planes(s.problem, n, sjf, skf)
    pinp = _packs(s, n)
    x = _rand_padded(n, 13, bc_consistent=False, solver=s)
    _, vals64 = s.problem.boundary_masks(n)
    v0 = jnp.asarray(vals64[0], jnp.float32)
    v1 = jnp.asarray(vals64[n - 1], jnp.float32)
    vals_fold = jnp.stack([
        jnp.pad(v0, ((0, sjf - n), (0, 0))),
        jnp.pad(v1, ((0, sjf - n), (0, 0))),
    ])[:, :, 1 : n - 1]
    vals_fold = jnp.pad(vals_fold, ((0, 0), (0, 0), (0, skf - (n - 2))))
    valsp = pms.msplit_plane_packs(
        jnp.stack([jnp.pad(v0, ((0, sj - n), (0, 0))),
                   jnp.pad(v1, ((0, sj - n), (0, 0)))]), n, sj, skh)
    out_fold = mp.apply_bcs_fold(pmf.pack_fold(x, n), n, pin_fold,
                                 vals_fold)
    ar, ab = psp.pack_split(x, n)
    o_r, o_b = pms.apply_bcs_split_pair(ar, ab, n, pinp, valsp)
    back = pms.split_to_fold(o_r, o_b, n)
    np.testing.assert_array_equal(
        np.asarray(back[:, :n, : n - 2]),
        np.asarray(out_fold[:, :n, : n - 2]),
    )


def test_mixed_split_df_solver_matches_fold_tier():
    """Whole-solve twin test: the split tier reproduces the fold tier's
    outer count and solution (cf. mg_3d_bkup.c driver golden)."""
    s = _solver()
    run_fold = mp.make_mixed_fold_df_solver(
        s, rel_tol=1e-8, inner_cycles=1, jnp_level_max=9, block_i=4)
    st_f = mp.setup_mixed_fold_df_problem(s)
    uf_hi, uf_lo, norm_f, it_f = run_fold(*st_f)
    u_fold = mp.unpack_mixed_fold_solution(uf_hi, uf_lo, s)

    run_split = mp.make_mixed_split_df_solver(
        s, rel_tol=1e-8, inner_cycles=1, jnp_level_max=9, block_i=4,
        smooth_block_i=4, ps_block_i=4, force=True)
    st_s = mp.setup_mixed_split_df_problem(s)
    hr, hb, lr, lb, norm_s, it_s = run_split(*st_s)
    u_split = mp.unpack_mixed_split_solution(hr, hb, lr, lb, s)

    assert int(it_s) == int(it_f)
    scale = float(jnp.max(jnp.abs(u_fold)))
    assert float(jnp.max(jnp.abs(u_split - u_fold))) < 1e-7 * scale
    np.testing.assert_allclose(float(norm_s), float(norm_f), rtol=1e-3)


def test_mixed_split_df_solver_wcycle():
    """gamma=2 (the production electrospray config) through the split
    tier: same outer count as the reference-shaped host W-cycle."""
    s = _solver(gamma=2)
    run_split = mp.make_mixed_split_df_solver(
        s, rel_tol=1e-8, inner_cycles=1, jnp_level_max=9, block_i=4,
        smooth_block_i=4, ps_block_i=4, force=True)
    st_s = mp.setup_mixed_split_df_problem(s)
    _, _, _, _, _, it_s = run_split(*st_s)
    _, _, it_ref, _ = s.solve_on_device(
        rel_tol=1e-8, max_cycles=60, inner_cycles=1)
    assert int(it_s) == it_ref
    assert int(it_s) <= 20

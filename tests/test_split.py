"""Split-color (red/black k-compressed) kernels and cycle vs the
rectangular k-trim oracles (CPU interpreter mode).

Oracle strategy: every split kernel is compared against the k-TRIM
rectangular path (the jnp masked-roll ops of cycles_padded, which are
themselves golden-tested against loop-level C semantics) through
pack_split/unpack_split. Kernel comparisons run in f64 so the
~1-ulp add-association differences of the compressed neighbor
addressing vanish below the tolerance; the full-solve test runs the
production f32 double-float path and pins behavior (outer steps,
final norm, solution error)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigrid_parallel_tpu import CycleConfig, Hierarchy, poisson_3d_quadratic
from multigrid_parallel_tpu import cycles_padded as cp
from multigrid_parallel_tpu import cycles_split as cs
from multigrid_parallel_tpu.hierarchy import evaluate_on_grid
from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import pallas_split as ps

N = 33


def trim_field(n, rng, dtype=np.float64, boundary=False):
    """Random k-TRIM-convention field: (n, SJ, SKT), zeros outside the
    live region, k=0 column zero. ``boundary``: fill the i/j boundary
    faces too (u-like fields); else interior-only (corrections)."""
    _, sj, skt = pk.padded_shape_trim(n)
    x = np.zeros((n, sj, skt), dtype)
    if boundary:
        x[:, :n, 1 : n - 1] = rng.standard_normal((n, n, n - 2))
    else:
        x[1 : n - 1, 1 : n - 1, 1 : n - 1] = rng.standard_normal(
            (n - 2,) * 3
        )
    return jnp.asarray(x)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = trim_field(N, rng, boundary=True)
    xr, xb = ps.pack_split(x, N)
    back = ps.unpack_split(xr, xb, N)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # non-live slots are exactly zero (the invariant the cycle keeps)
    _, sj, skh = ps.split_shape(N)
    ii = np.arange(N)[:, None, None]
    jj = np.arange(sj)[None, :, None]
    kk = np.arange(skh)[None, None, :]
    q = (ii + jj) % 2
    for arr, p in ((xr, q), (xb, 1 - q)):
        dead = 2 * kk + 1 + p > N - 2
        assert np.all(np.asarray(arr)[np.broadcast_to(dead, arr.shape)] == 0)


def test_split_supported_thresholds():
    assert not ps.split_supported(33)  # 16 slots pad to a full tile
    assert not ps.split_supported(129)  # 64 slots pad to a full tile
    assert ps.split_supported(257)
    assert ps.split_supported(513)
    assert ps.split_supported(1025)


@pytest.mark.parametrize("red_first", [True, False])
def test_split_smoother_matches_trim_jnp(red_first):
    rng = np.random.default_rng(1)
    e = trim_field(N, rng)
    r = trim_field(N, rng)
    h = 1.0 / (N - 1)
    want = cp._rb_smooth_padded_jnp(e, r, h, 2, N, red_first=red_first)
    er, eb = ps.pack_split(e, N)
    rr_, rb_ = ps.pack_split(r, N)
    or_, ob_ = ps.rb_smooth_split(er, eb, rr_, rb_, h, 2, N,
                                  red_first=red_first, block_i=16)
    got = ps.unpack_split(or_, ob_, N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


def test_split_smoother_from_zero_matches():
    rng = np.random.default_rng(2)
    r = trim_field(N, rng)
    h = 1.0 / (N - 1)
    want = cp._rb_smooth_padded_jnp(jnp.zeros_like(r), r, h, 2, N,
                                    red_first=True)
    rr_, rb_ = ps.pack_split(r, N)
    or_, ob_ = ps.rb_smooth_split_from_zero(rr_, rb_, h, 2, N,
                                            red_first=True, block_i=16)
    got = ps.unpack_split(or_, ob_, N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


def test_split_residual_restrict_matches_trim():
    rng = np.random.default_rng(3)
    e = trim_field(N, rng)
    r = trim_field(N, rng)
    h = 1.0 / (N - 1)
    want = cp.restrict_padded(cp._residual_padded_jnp(e, r, h, N), N)
    er, eb = ps.pack_split(e, N)
    rr_, rb_ = ps.pack_split(r, N)
    got = ps.residual_restrict_split(er, eb, rr_, rb_, h, N, block_i=4)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-10)


def test_split_prolong_smooth_matches_trim():
    rng = np.random.default_rng(4)
    nc = (N + 1) // 2
    _, sjc, skc = pk.padded_shape_trim(nc)
    ec = np.zeros((nc, sjc, skc))
    ec[1 : nc - 1, 1 : nc - 1, 1 : nc - 1] = rng.standard_normal(
        (nc - 2,) * 3
    )
    ec = jnp.asarray(ec)
    e = trim_field(N, rng)
    r = trim_field(N, rng)
    h = 1.0 / (N - 1)
    want = cp.prolong_correct_padded(ec, e, nc)
    want = cp._rb_smooth_padded_jnp(want, r, h, 2, N, red_first=False)
    er, eb = ps.pack_split(e, N)
    rr_, rb_ = ps.pack_split(r, N)
    or_, ob_ = ps.prolong_smooth_split(ec, er, eb, rr_, rb_, h, 2, N,
                                       block_i=8)
    got = ps.unpack_split(or_, ob_, N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-11)


def test_split_df_step_matches_rect():
    rng = np.random.default_rng(5)
    h = 1.0 / (N - 1)
    u_hi = trim_field(N, rng, np.float32, boundary=True)
    u_lo = (1e-8 * trim_field(N, rng, np.float32, boundary=True)).astype(
        jnp.float32
    )
    e = trim_field(N, rng, np.float32)
    f_hi = trim_field(N, rng, np.float32, boundary=True)
    f_lo = (1e-8 * trim_field(N, rng, np.float32, boundary=True)).astype(
        jnp.float32
    )
    w_hi, w_lo = pk.df_add(u_hi, u_lo, e)
    want_r = pk._residual_df_jnp(w_hi, w_lo, f_hi, f_lo, h, N)
    want_n = float(jnp.sum(want_r * want_r))

    def pack(x):
        return ps.pack_split(x, N)

    args = (*pack(u_hi), *pack(u_lo), *pack(e), *pack(f_hi), *pack(f_lo))
    hr, hb, lr, lb, r_r, r_b, nrm2 = ps.df_step_split(*args, h, N,
                                                      block_i=4)
    got_hi = ps.unpack_split(hr, hb, N)
    got_lo = ps.unpack_split(lr, lb, N)
    got_r = ps.unpack_split(r_r, r_b, N)
    # df_add is elementwise — bit-exact per color
    np.testing.assert_array_equal(np.asarray(got_hi), np.asarray(w_hi))
    np.testing.assert_array_equal(np.asarray(got_lo), np.asarray(w_lo))
    # the EFT sum association differs in compressed coordinates
    scale = np.abs(np.asarray(want_r)).max()
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               rtol=1e-5, atol=1e-6 * scale)
    assert abs(float(nrm2) - want_n) < 1e-5 * want_n


def test_split_residual_norm_matches_rect():
    rng = np.random.default_rng(6)
    h = 1.0 / (N - 1)
    u_hi = trim_field(N, rng, np.float32, boundary=True)
    u_lo = (1e-8 * trim_field(N, rng, np.float32, boundary=True)).astype(
        jnp.float32
    )
    f_hi = trim_field(N, rng, np.float32, boundary=True)
    f_lo = jnp.zeros_like(f_hi)
    want_r = pk._residual_df_jnp(u_hi, u_lo, f_hi, f_lo, h, N)
    want_n = float(jnp.sum(want_r * want_r))

    def pack(x):
        return ps.pack_split(x, N)

    r_r, r_b, nrm2 = ps.residual_df_norm_split(
        *pack(u_hi), *pack(u_lo), *pack(f_hi), *pack(f_lo), h, N, block_i=4
    )
    got_r = ps.unpack_split(r_r, r_b, N)
    scale = np.abs(np.asarray(want_r)).max()
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               rtol=1e-5, atol=1e-6 * scale)
    assert abs(float(nrm2) - want_n) < 1e-5 * want_n


def test_split_solver_matches_trim_solver():
    """Full production-path solve at 33^3: the split-tier solver and the
    k-trim rect solver agree in outer-step count and solution."""
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4, dtype=jnp.float64)
    cfg = CycleConfig(n_smooth=2)
    problem = poisson_3d_quadratic()
    init = cp.ref_init_norm(problem, hier)

    rect = cp.make_on_device_df_solver(
        hier, cfg, rel_tol=1e-8, inner_cycles=2, trim=True, init_norm=init
    )
    u_hi, u_lo, f_hi, f_lo = cp.setup_df_problem(problem, hier, trim=True)
    r_hi, r_lo, r_norm, r_outer = rect(u_hi, u_lo, f_hi, f_lo)

    split = cs.make_split_df_solver(
        hier, cfg, rel_tol=1e-8, inner_cycles=2, init_norm=init, force=True
    )
    args = cs.setup_split_df_problem(problem, hier)
    hr, hb, lr, lb, s_norm, s_outer = split(*args)

    assert int(s_outer) == int(r_outer), (int(s_outer), int(r_outer))
    assert float(s_norm) <= 1e-8 * init

    u_rect = cp.untrim_solution(r_hi, r_lo, problem, hier)
    u_split = cs.unsplit_solution(hr, hb, lr, lb, problem, hier)
    diff = float(jnp.max(jnp.abs(u_rect - u_split)))
    assert diff < 5e-9, diff

    exact = evaluate_on_grid(problem.analytic, hier, hier.num_levels - 1)
    err = float(jnp.sqrt(jnp.sum((u_split - exact) ** 2)))
    assert err < 5e-8, err


@pytest.mark.parametrize("gamma_min_n", [0, 17])
def test_split_solver_gamma_wcycle(gamma_min_n):
    """gamma=2 exercises the sub-cycle revisit plumbing; gamma_min_n=17
    additionally exercises the depth cap through the split top level
    ((n+1)//2 = 17 keeps the top revisit, the rect sub-tree drops the
    sub-17 ones)."""
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4, dtype=jnp.float64)
    cfg = CycleConfig(n_smooth=2, gamma=2, gamma_min_n=gamma_min_n)
    problem = poisson_3d_quadratic()
    init = cp.ref_init_norm(problem, hier)
    split = cs.make_split_df_solver(
        hier, cfg, rel_tol=1e-8, inner_cycles=2, init_norm=init, force=True
    )
    args = cs.setup_split_df_problem(problem, hier)
    hr, hb, lr, lb, s_norm, s_outer = split(*args)
    assert float(s_norm) <= 1e-8 * init
    u_split = cs.unsplit_solution(hr, hb, lr, lb, problem, hier)
    exact = evaluate_on_grid(problem.analytic, hier, hier.num_levels - 1)
    err = float(jnp.sqrt(jnp.sum((u_split - exact) ** 2)))
    assert err < 5e-8, err


def test_split_available_guards():
    hier33 = Hierarchy(ndim=3, coarse_n=5, num_levels=4)
    assert not cs.split_available(hier33)  # no compression at 33
    with pytest.raises(ValueError):
        cs.make_split_df_solver(hier33, init_norm=1.0)
    hier257 = Hierarchy(ndim=3, coarse_n=5, num_levels=7)
    assert cs.split_available(hier257)
    with pytest.raises(ValueError):  # init_norm required
        cs.make_split_df_solver(hier257)

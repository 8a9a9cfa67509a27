"""Distributed padded-Pallas path (parallel/sharded_padded) on the
8-virtual-device CPU mesh, interpreter mode.

Chain of custody: the sharded ext kernels are compared against the
single-device jnp ops (themselves golden-tested against loop-level C
semantics), the sharded cycle against the single-chip padded cycle
(same fused kernels), and the whole-solve driver against the analytic
oracle — so the distributed fast path inherits the full C-parity chain.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from multigrid_parallel_tpu import CycleConfig, Hierarchy, poisson_3d_quadratic
from multigrid_parallel_tpu import cycles_padded as cp
from multigrid_parallel_tpu.hierarchy import evaluate_on_grid
from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import pallas_sharded as px
from multigrid_parallel_tpu.ops import stencils_3d as ops3
from multigrid_parallel_tpu.parallel import sharded_padded as sp
from multigrid_parallel_tpu.parallel.sharded import ShardPlan, make_mesh

N = 33
H = 1.0 / (N - 1)
NDEV = 8
L = 8  # local planes (8*8 = 64 >= 33)


def _zb(x):
    y = np.zeros_like(x)
    y[1:-1, 1:-1, 1:-1] = x[1:-1, 1:-1, 1:-1]
    return y


def _rand(seed, n=N, zero_boundary=False):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, n, n)).astype(np.float32)
    return jnp.asarray(_zb(x) if zero_boundary else x)


def _to_global(x, lloc):
    xp = pk.pad3(x)
    return jnp.pad(xp, ((0, NDEV * lloc - x.shape[0]), (0, 0), (0, 0)))


def _shmap(fn, mesh, n_in, n_out=1):
    out_specs = P("x") if n_out == 1 else tuple([P("x")] * n_out)
    return jax.jit(
        jax.shard_map(fn, mesh=mesh, in_specs=(P("x"),) * n_in,
                      out_specs=out_specs, check_vma=False)
    )


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(NDEV)


@pytest.mark.parametrize("red_first", [True, False])
def test_rb_smooth_ext_bitwise_matches_jnp(mesh, red_first):
    u, f = _rand(1), _rand(2)
    hh = 4

    def local(ul, fl):
        g = sp._gi0("x", L, hh)
        return px.rb_smooth_ext(
            sp._halo_ext(ul, "x", NDEV, hh), sp._halo_ext(fl, "x", NDEV, hh),
            g, H, 2, N, L, red_first=red_first, block_i=4,
        )

    got = _shmap(local, mesh, 2)(_to_global(u, L), _to_global(f, L))
    want = np.asarray(ops3.rb_smooth(u, f, H, 2, red_first=red_first))
    gn = np.asarray(got)
    # identical masks/arithmetic/values -> bitwise equality
    np.testing.assert_array_equal(gn[:N, :N, :N], want)
    assert np.all(gn[N:] == 0) and np.all(gn[:, N:, :] == 0)


def test_rb_smooth_from_zero_ext_matches_jnp(mesh):
    f = _rand(3)

    def local(fl):
        g = sp._gi0("x", L, 4)
        return px.rb_smooth_from_zero_ext(
            sp._halo_ext(fl, "x", NDEV, 4), g, H, 2, N, L, True, 4
        )

    got = _shmap(local, mesh, 1)(_to_global(f, L))
    want = np.asarray(ops3.rb_smooth(jnp.zeros_like(f), f, H, 2))
    np.testing.assert_array_equal(np.asarray(got)[:N, :N, :N], want)


def test_residual_ext_matches_jnp(mesh):
    u, f = _rand(4), _rand(5)

    def local(ul, fl):
        g = sp._gi0("x", L, 1)
        return px.residual_ext(
            sp._halo_ext(ul, "x", NDEV, 1), sp._halo_ext(fl, "x", NDEV, 1),
            g, H, N, L, block_i=4,
        )

    got = _shmap(local, mesh, 2)(_to_global(u, L), _to_global(f, L))
    want = np.asarray(ops3.residual(u, f, H))
    tol = 2e-7 * np.abs(want).max()  # 1-ulp combine-order difference
    np.testing.assert_allclose(np.asarray(got)[:N, :N, :N], want,
                               rtol=0, atol=tol)


@pytest.mark.parametrize("block_i", [2, 4])
def test_residual_restrict_ext_matches_separate(mesh, block_i):
    u, f = _rand(6), _rand(7)

    def local(ul, fl):
        g = sp._gi0("x", L, 2)
        return px.residual_restrict_ext(
            sp._halo_ext(ul, "x", NDEV, 2), sp._halo_ext(fl, "x", NDEV, 2),
            g, H, N, L // 2, block_i=block_i,
        )

    got = _shmap(local, mesh, 2)(_to_global(u, L), _to_global(f, L))
    want = np.asarray(ops3.restrict_full_weighting(ops3.residual(u, f, H)))
    nc = (N + 1) // 2
    tol = 2e-6 * np.abs(want).max()
    np.testing.assert_allclose(
        np.asarray(got)[:nc, :nc, :nc], want, rtol=0, atol=tol
    )
    full = np.asarray(got)
    assert np.all(full[nc:] == 0) and np.all(full[:, nc:, :] == 0)


@pytest.mark.parametrize("n_iter", [1, 2])
def test_prolong_smooth_ext_matches_separate(mesh, n_iter):
    nc = (N + 1) // 2
    ec = _rand(8, n=nc, zero_boundary=True)
    e = _rand(9, zero_boundary=True)
    r = _rand(10, zero_boundary=True)
    hh = 2 * n_iter
    hc = n_iter + 1

    def local(ecl, el, rl):
        g = sp._gi0("x", L, hh)
        return px.prolong_smooth_ext(
            sp._halo_ext(ecl, "x", NDEV, hc), sp._halo_ext(el, "x", NDEV, hh),
            sp._halo_ext(rl, "x", NDEV, hh), g, H, n_iter, N, L, block_i=4,
        )

    got = _shmap(local, mesh, 3)(
        _to_global(ec, L // 2), _to_global(e, L), _to_global(r, L)
    )
    want = np.asarray(
        ops3.rb_smooth(ops3.prolong_correct(ec, e), r, H, n_iter,
                       red_first=False)
    )
    np.testing.assert_allclose(
        np.asarray(got)[:N, :N, :N], want, rtol=2e-6, atol=2e-6
    )


def test_residual_df_norm_ext_matches_f64(mesh):
    rng = np.random.default_rng(11)
    u64 = jnp.asarray(rng.standard_normal((N, N, N)))
    f64 = jnp.asarray(rng.standard_normal((N, N, N)))
    want = np.asarray(ops3.residual(u64, f64, H))

    u_hi, u_lo = pk.df_split(u64, pad=True)
    f_hi, f_lo = pk.df_split(f64, pad=True)

    def local(a, b, c, d):
        exts = [sp._halo_ext(x, "x", NDEV, 1) for x in (a, b, c, d)]
        r, part = px.residual_df_norm_ext(
            *exts, sp._gi0("x", L, 1), H, N, L, block_i=4
        )
        return r, jax.lax.psum(part, "x")

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P("x"),) * 4,
        out_specs=(P("x"), P()), check_vma=False,
    ))
    pad = lambda x: jnp.pad(x, ((0, NDEV * L - N), (0, 0), (0, 0)))
    r, nrm2 = fn(pad(u_hi), pad(u_lo), pad(f_hi), pad(f_lo))
    got = np.asarray(r)[:N, :N, :N].astype(np.float64)
    err = np.abs(got - want)
    assert err.max() < 2e-7 * np.abs(want).max() + 1e-10, err.max()
    want_n2 = float((want**2).sum())
    assert float(nrm2) == pytest.approx(want_n2, rel=1e-5)


@pytest.mark.parametrize(
    "n_sharded,gamma,gamma_min_n",
    [(1, 1, 0), (2, 1, 0), (2, 2, 0), (2, 2, 17)],
)
def test_sharded_cycle_matches_single_chip_padded_cycle(
    mesh, n_sharded, gamma, gamma_min_n
):
    # gamma=2 with n_sharded=2 exercises the W-cycle revisit through BOTH
    # a sharded re-entry and the gather-level e_init handoff;
    # gamma_min_n=17 pins the depth cap (skips only the 9-level revisit)
    # against the identically-capped single-chip padded cycle.
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4, dtype=jnp.float32)
    cfg = CycleConfig(n_smooth=2, gamma=gamma, gamma_min_n=gamma_min_n)
    r = _rand(12, zero_boundary=True)
    plan = ShardPlan(n_dev=NDEV, axis="x", n_sharded=n_sharded, fine_local=L)
    cyc_sh, _ = sp.make_sharded_padded_cycle(
        hier, cfg, mesh, plan, jnp_level_max=9, block_i=4
    )
    rg = _to_global(r, L)
    got = cyc_sh(jnp.zeros_like(rg), rg)

    cyc1 = cp.make_padded_correction_cycle(hier, cfg, jnp_level_max=9)
    want = np.asarray(pk.unpad3(cyc1(None, pk.pad3(r), from_zero=True), N))
    scale = np.abs(want).max()
    np.testing.assert_allclose(
        np.asarray(got)[:N, :N, :N], want, rtol=0, atol=2e-6 * scale
    )


def test_sharded_cycle_jnp_fallback_matches_pallas(mesh):
    """All-jnp local ops (jnp_level_max huge) vs forced-Pallas — the two
    dispatch paths of the distributed cycle agree."""
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4, dtype=jnp.float32)
    cfg = CycleConfig(n_smooth=2)
    r = _rand(13, zero_boundary=True)
    rg = _to_global(r, L)
    plan = ShardPlan(n_dev=NDEV, axis="x", n_sharded=1, fine_local=L)
    cyc_jnp, _ = sp.make_sharded_padded_cycle(
        hier, cfg, mesh, plan, jnp_level_max=10**9
    )
    cyc_pal, _ = sp.make_sharded_padded_cycle(
        hier, cfg, mesh, plan, jnp_level_max=9, block_i=4
    )
    a = np.asarray(cyc_jnp(jnp.zeros_like(rg), rg))[:N, :N, :N]
    b = np.asarray(cyc_pal(jnp.zeros_like(rg), rg))[:N, :N, :N]
    scale = np.abs(a).max()
    np.testing.assert_allclose(b, a, rtol=0, atol=2e-6 * scale)


def test_sharded_df_solver_converges_to_oracle(mesh):
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4)  # 33^3
    cfg = CycleConfig(n_smooth=2)
    run, plan = sp.make_sharded_df_solver(
        hier, cfg, mesh, rel_tol=1e-8, inner_cycles=2,
        jnp_level_max=9, block_i=4,
    )
    st = sp.setup_df_problem_sharded_padded(poisson_3d_quadratic(), hier,
                                            mesh, plan)
    u_hi, u_lo, norm, n_outer = run(*st)
    init = float(jnp.sqrt(jnp.sum(st[2] ** 2)))
    assert float(norm) <= 1e-8 * init
    assert int(n_outer) <= 10, int(n_outer)
    u = sp.unpad_solution(u_hi, u_lo, hier)
    exact = evaluate_on_grid(poisson_3d_quadratic().analytic, hier, 3)
    err = float(jnp.sqrt(jnp.sum((u - exact) ** 2)))
    assert err < 2e-8, err


def test_sharded_df_solver_fmg_bootstrap(mesh):
    """use_fmg on the distributed solver: converges to the oracle in
    FEWER outer steps than the plain solver (the FMG start replaces
    ~1-2 defect steps), same final accuracy."""
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4)  # 33^3
    cfg = CycleConfig(n_smooth=2)
    prob = poisson_3d_quadratic()

    run_f, plan = sp.make_sharded_df_solver(
        hier, cfg, mesh, rel_tol=1e-8, inner_cycles=2,
        jnp_level_max=9, block_i=4, use_fmg=True,
    )
    st = sp.setup_df_problem_sharded_padded(prob, hier, mesh, plan)
    u_hi, u_lo, norm, n_fmg = run_f(*st)
    init = float(jnp.sqrt(jnp.sum(st[2] ** 2)))
    assert float(norm) <= 1e-8 * init

    run_p, _ = sp.make_sharded_df_solver(
        hier, cfg, mesh, plan, rel_tol=1e-8, inner_cycles=2,
        jnp_level_max=9, block_i=4,
    )
    _, _, _, n_plain = run_p(*st)
    assert int(n_fmg) < int(n_plain), (int(n_fmg), int(n_plain))

    u = sp.unpad_solution(u_hi, u_lo, hier)
    exact = evaluate_on_grid(poisson_3d_quadratic().analytic, hier, 3)
    err = float(jnp.sqrt(jnp.sum((u - exact) ** 2)))
    assert err < 2e-8, err


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_df_solver_device_count_invariance(n_dev):
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=3)  # 17^3
    cfg = CycleConfig(n_smooth=2)
    mesh = make_mesh(n_dev)
    run, plan = sp.make_sharded_df_solver(
        hier, cfg, mesh, rel_tol=1e-8, inner_cycles=2,
        jnp_level_max=9, block_i=2,
    )
    st = sp.setup_df_problem_sharded_padded(poisson_3d_quadratic(), hier,
                                            mesh, plan)
    u_hi, u_lo, norm, n_outer = run(*st)
    u = sp.unpad_solution(u_hi, u_lo, hier)
    exact = evaluate_on_grid(poisson_3d_quadratic().analytic, hier, 2)
    err = float(jnp.sqrt(jnp.sum((u - exact) ** 2)))
    assert err < 2e-8, (n_dev, err)


def test_sharded_cycle_65_matches_single_chip():
    """65^3 on the 8-device mesh (the verdict's target size): two sharded
    Pallas levels (65, 33) + replicated coarse tail."""
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=5, dtype=jnp.float32)
    cfg = CycleConfig(n_smooth=2)
    n = 65
    mesh = make_mesh(NDEV)
    rng = np.random.default_rng(14)
    r = jnp.asarray(_zb(rng.standard_normal((n, n, n)).astype(np.float32)))
    plan = ShardPlan(n_dev=NDEV, axis="x", n_sharded=2, fine_local=12)
    cyc_sh, _ = sp.make_sharded_padded_cycle(
        hier, cfg, mesh, plan, jnp_level_max=17, block_i=4
    )
    rg = jnp.pad(pk.pad3(r), ((0, NDEV * 12 - n), (0, 0), (0, 0)))
    got = np.asarray(cyc_sh(jnp.zeros_like(rg), rg))[:n, :n, :n]

    cyc1 = cp.make_padded_correction_cycle(hier, cfg, jnp_level_max=17)
    want = np.asarray(pk.unpad3(cyc1(None, pk.pad3(r), from_zero=True), n))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6 * scale)


def test_sharded_df_solver_trim_matches_full(mesh):
    """k-TRIM layout through the distributed solver: same outer count,
    same solution as the full layout (and as the single-chip trim)."""
    from multigrid_parallel_tpu import cycles_padded as cpd

    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4)  # 33^3
    cfg = CycleConfig(n_smooth=2)
    prob = poisson_3d_quadratic()
    init = cpd.ref_init_norm(prob, hier)

    run_t, plan = sp.make_sharded_df_solver(
        hier, cfg, mesh, rel_tol=1e-8, inner_cycles=2,
        jnp_level_max=9, block_i=4, trim=True, init_norm=init,
    )
    st_t = sp.setup_df_problem_sharded_padded(prob, hier, mesh, plan,
                                              trim=True)
    u_hi, u_lo, norm_t, it_t = run_t(*st_t)
    u_t = sp.untrim_solution_sharded(u_hi, u_lo, prob, hier)

    run_f, _ = sp.make_sharded_df_solver(
        hier, cfg, mesh, plan, rel_tol=1e-8, inner_cycles=2,
        jnp_level_max=9, block_i=4,
    )
    st_f = sp.setup_df_problem_sharded_padded(prob, hier, mesh, plan)
    fu_hi, fu_lo, norm_f, it_f = run_f(*st_f)
    u_f = sp.unpad_solution(fu_hi, fu_lo, hier)

    assert int(it_t) == int(it_f)
    assert float(norm_t) <= 1e-8 * init
    np.testing.assert_allclose(np.asarray(u_t), np.asarray(u_f),
                               rtol=0, atol=1e-10)

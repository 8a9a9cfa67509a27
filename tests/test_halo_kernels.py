"""Halo-DMA kernel tier (ops.pallas_sharded *_halo) vs the ext tier.

The halo-DMA kernels stitch each block's slab from (local, lh, rhc)
triples with in-kernel DMAs instead of reading a caller-materialized
(L+2H) extended copy. Round 4 generalized them to NON-dividing block
sizes via the same overlapping-tail block scheme the ext kernels use
(ob = min(b*bi, L-bi)) plus a composite right-edge buffer, so these
tests deliberately pick L/block_i pairs where L % block_i != 0 — the
overlap and composite-tail code paths.

Oracle: the ext kernels (themselves tested against jnp ops / loop-level
C-semantics goldens in test_sharded_padded.py). Equality is bitwise:
both tiers run identical slab arithmetic on identically-stitched slabs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from multigrid_parallel_tpu import CycleConfig, Hierarchy, poisson_3d_quadratic
from multigrid_parallel_tpu import cycles_padded as cp
from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import pallas_sharded as px
from multigrid_parallel_tpu.parallel import sharded_padded as sp
from multigrid_parallel_tpu.parallel.sharded import ShardPlan, make_mesh

N = 33
H = 1.0 / (N - 1)
NDEV = 8
L = 12  # 8*12 = 96 >= 33; bi=8 -> blocks start 0, 4 (overlapping tail)


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


def test_halo_ok_overlap_semantics():
    # dividing and non-dividing both eligible; parity/head constraints not
    assert px.halo_ok(12, 4, 4)          # divides
    assert px.halo_ok(12, 8, 4)          # 12 % 8 != 0: overlap
    assert px.halo_ok(8, 8, 4)           # single block
    assert not px.halo_ok(6, 4, 4)       # L < bi + halo and L != bi
    assert not px.halo_ok(12, 7, 4)      # odd bi
    assert not px.halo_ok(13, 4, 4)      # odd L
    assert not px.halo_ok(4, 8, 4)       # L < bi


@pytest.mark.parametrize("block_i", [4, 8])  # 4 divides L=12, 8 overlaps
def test_rb_smooth_halo_matches_ext(mesh, block_i):
    u, f = _rand(1), _rand(2)
    hh = 4

    def loc_ext(ul, fl):
        g = sp._gi0("x", L, hh)
        return px.rb_smooth_ext(
            sp._halo_ext(ul, "x", NDEV, hh), sp._halo_ext(fl, "x", NDEV, hh),
            g, H, 2, N, L, red_first=True, block_i=block_i,
        )

    def loc_halo(ul, fl):
        g = sp._gi0("x", L, hh)
        return px.rb_smooth_halo(
            sp._halo_parts(ul, "x", NDEV, hh, hh, block_i),
            sp._halo_parts(fl, "x", NDEV, hh, hh, block_i),
            g, H, 2, N, L, red_first=True, block_i=block_i,
        )

    args = (_to_global(u, L), _to_global(f, L))
    a = np.asarray(_shmap(loc_ext, mesh, 2)(*args))
    b = np.asarray(_shmap(loc_halo, mesh, 2)(*args))
    np.testing.assert_array_equal(a, b)


def test_rb_smooth_from_zero_halo_matches_ext(mesh):
    f = _rand(3)
    hh, bi = 4, 8

    def loc_ext(fl):
        g = sp._gi0("x", L, hh)
        return px.rb_smooth_from_zero_ext(
            sp._halo_ext(fl, "x", NDEV, hh), g, H, 2, N, L, True, bi)

    def loc_halo(fl):
        g = sp._gi0("x", L, hh)
        return px.rb_smooth_from_zero_halo(
            sp._halo_parts(fl, "x", NDEV, hh, hh, bi), g, H, 2, N, L, True, bi)

    a = np.asarray(_shmap(loc_ext, mesh, 1)(_to_global(f, L)))
    b = np.asarray(_shmap(loc_halo, mesh, 1)(_to_global(f, L)))
    np.testing.assert_array_equal(a, b)


def test_residual_restrict_halo_matches_ext(mesh):
    # Lc = 6, bi = 4 -> coarse blocks start 0, 2 (overlapping tail)
    u, f = _rand(4), _rand(5)
    bi = 4

    def loc_ext(ul, fl):
        g = sp._gi0("x", L, 2)
        return px.residual_restrict_ext(
            sp._halo_ext(ul, "x", NDEV, 2), sp._halo_ext(fl, "x", NDEV, 2),
            g, H, N, L // 2, block_i=bi,
        )

    def loc_halo(ul, fl):
        g = sp._gi0("x", L, 2)
        return px.residual_restrict_halo(
            sp._halo_parts(ul, "x", NDEV, 2, 1),
            sp._halo_parts(fl, "x", NDEV, 2, 1),
            g, H, N, L // 2, block_i=bi,
        )

    args = (_to_global(u, L), _to_global(f, L))
    a = np.asarray(_shmap(loc_ext, mesh, 2)(*args))
    b = np.asarray(_shmap(loc_halo, mesh, 2)(*args))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("n_iter", [1, 2])
def test_prolong_smooth_halo_matches_ext(mesh, n_iter):
    nc = (N + 1) // 2
    ec = _rand(8, n=nc, zero_boundary=True)
    e = _rand(9, zero_boundary=True)
    r = _rand(10, zero_boundary=True)
    hh, hc, bi = 2 * n_iter, n_iter + 1, 8

    def loc_ext(ecl, el, rl):
        g = sp._gi0("x", L, hh)
        return px.prolong_smooth_ext(
            sp._halo_ext(ecl, "x", NDEV, hc), sp._halo_ext(el, "x", NDEV, hh),
            sp._halo_ext(rl, "x", NDEV, hh), g, H, n_iter, N, L, block_i=bi,
        )

    def loc_halo(ecl, el, rl):
        g = sp._gi0("x", L, hh)
        return px.prolong_smooth_halo(
            sp._halo_parts(ecl, "x", NDEV, n_iter, n_iter + 1, bi // 2),
            sp._halo_parts(el, "x", NDEV, hh, hh, bi),
            sp._halo_parts(rl, "x", NDEV, hh, hh, bi),
            g, H, n_iter, N, L, block_i=bi,
        )

    args = (_to_global(ec, L // 2), _to_global(e, L), _to_global(r, L))
    a = np.asarray(_shmap(loc_ext, mesh, 3)(*args))
    b = np.asarray(_shmap(loc_halo, mesh, 3)(*args))
    np.testing.assert_array_equal(a, b)


def test_residual_df_norm_halo_matches_ext(mesh):
    # bi = 8 at L = 12: the overlapped tail block must not double-count
    # rows [8, 12) in the partial norm (nominal-window ownership)
    arrs = [_rand(s) for s in (11, 12, 13, 14)]
    bi = 8

    def loc_ext(a1, a2, a3, a4):
        g = sp._gi0("x", L, 1)
        exts = [sp._halo_ext(x, "x", NDEV, 1) for x in (a1, a2, a3, a4)]
        r, p = px.residual_df_norm_ext(*exts, g, H, N, L, block_i=bi)
        return r, jax.lax.psum(p, "x").reshape(1)

    def loc_halo(a1, a2, a3, a4):
        g = sp._gi0("x", L, 1)
        parts = [sp._halo_parts(x, "x", NDEV, 1, 1, bi)
                 for x in (a1, a2, a3, a4)]
        r, p = px.residual_df_norm_halo(*parts, g, H, N, L, block_i=bi)
        return r, jax.lax.psum(p, "x").reshape(1)

    args = [_to_global(x, L) for x in arrs]
    ra, na = _shmap(loc_ext, mesh, 4, 2)(*args)
    rb, nb = _shmap(loc_halo, mesh, 4, 2)(*args)
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))
    assert float(na[0]) == float(nb[0])


def test_sharded_df_solver_overlap_blocks_matches_single_chip(mesh):
    """Whole-solve equivalence with fine_local=12 / block_i=8: every
    sharded level dispatches halo-DMA kernels with overlapping tails
    (smoother L=12 bi=8, restrict Lc=6 bi=4, prolong L=12 bi=6)."""
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4)  # 33^3
    cfg = CycleConfig(n_smooth=2)
    plan = ShardPlan(n_dev=NDEV, axis="x", n_sharded=2, fine_local=L)
    prob = poisson_3d_quadratic()

    run, plan = sp.make_sharded_df_solver(
        hier, cfg, mesh, plan, rel_tol=1e-10, max_cycles=20, inner_cycles=2,
        jnp_level_max=9, block_i=8,
    )
    st = sp.setup_df_problem_sharded_padded(prob, hier, mesh, plan)
    uh, ul, norm, n_outer = run(*st)

    run1 = cp.make_on_device_df_solver(hier, cfg, rel_tol=1e-10,
                                       max_cycles=20, inner_cycles=2,
                                       jnp_level_max=9, block_i=8)
    st1 = cp.setup_df_problem(prob, hier)
    uh1, ul1, n1, o1 = run1(*st1)

    assert int(n_outer) == int(o1)
    sol = np.asarray(sp.unpad_solution(uh, ul, hier))
    n = hier.finest_n
    s1 = np.asarray(pk.unpad3(pk.df_to_f64(uh1, ul1)[:n], n))
    assert np.abs(sol - s1).max() < 1e-11


# ------------------------- 2D (i, j) mesh: i-halo-DMA tier vs ext2d ----
# The halo2d kernels keep the j-ext copy but assemble the i axis with
# tri-source DMA (ops.pallas_sharded2d). Same bitwise-equality oracle.

from multigrid_parallel_tpu.ops import pallas_sharded2d as px2  # noqa: E402
from multigrid_parallel_tpu.parallel import sharded2d_padded as s2p  # noqa: E402
from multigrid_parallel_tpu.parallel.sharded2d import make_mesh_2d  # noqa: E402


@pytest.fixture(scope="module")
def mesh2d():
    return make_mesh_2d(4, 2)


def _plan2d():
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4, dtype=jnp.float32)
    return s2p.plan_sharding_2d_padded(hier, 4, 2)  # Li=12, Lj=32


def _to_global2d(x, plan):
    n = x.shape[0]
    _, sj, _ = pk.padded_shape(n)
    xp = pk.pad3(x)
    return jnp.pad(
        xp,
        ((0, plan.padded_i(0) - n), (0, plan.padded_j(0) - sj), (0, 0)),
    )


def _shmap2d(fn, mesh, n_in, n_out=1):
    from jax.sharding import PartitionSpec as P2
    spec = P2("x", "y")
    out_specs = spec if n_out == 1 else tuple([spec] * n_out)
    return jax.jit(
        jax.shard_map(fn, mesh=mesh, in_specs=(spec,) * n_in,
                      out_specs=out_specs, check_vma=False)
    )


def test_rb_smooth_halo2d_matches_ext2d(mesh2d):
    plan = _plan2d()
    Li, Lj = plan.fine_local_i, plan.fine_local_j  # 12, 32
    u, f = _rand(31), _rand(32)
    hh, bi = 4, 8  # 12 % 8 != 0: overlapping tail

    def ext2(x, hi):
        return s2p._halo_ext_j(
            s2p._halo_ext_i(x, "x", plan.nx, hi), "y", plan.ny, px2.HJ)

    def loc_ext(ul, fl):
        g = s2p._gij0(plan, 0, hh)
        return px2.rb_smooth_ext2d(ext2(ul, hh), ext2(fl, hh), g, H, 2, N,
                                   Li, Lj, red_first=True, block_i=bi)

    def loc_halo(ul, fl):
        g = s2p._gij0(plan, 0, hh)
        return px2.rb_smooth_halo2d(
            s2p._halo_parts2d(ul, plan, hh, hh, bi),
            s2p._halo_parts2d(fl, plan, hh, hh, bi),
            g, H, 2, N, Li, Lj, red_first=True, block_i=bi)

    args = (_to_global2d(u, plan), _to_global2d(f, plan))
    a = np.asarray(_shmap2d(loc_ext, mesh2d, 2)(*args))
    b = np.asarray(_shmap2d(loc_halo, mesh2d, 2)(*args))
    np.testing.assert_array_equal(a, b)


def test_residual_restrict_halo2d_matches_ext2d(mesh2d):
    plan = _plan2d()
    Li, Lj = plan.fine_local_i, plan.fine_local_j
    u, f = _rand(33), _rand(34)
    bi = 4  # Lc = 6: blocks start 0, 2 (overlap)
    nc = (N + 1) // 2
    skc = cp._coarse_k_width(N, pk.padded_shape(N)[2])

    def ext2(x, hi):
        return s2p._halo_ext_j(
            s2p._halo_ext_i(x, "x", plan.nx, hi), "y", plan.ny, px2.HJ)

    def loc_ext(ul, fl):
        g = s2p._gij0(plan, 0, 2)
        return px2.residual_restrict_ext2d(
            ext2(ul, 2), ext2(fl, 2), g, H, N, Li // 2, Lj // 2, skc,
            block_i=bi)

    def loc_halo(ul, fl):
        g = s2p._gij0(plan, 0, 2)
        return px2.residual_restrict_halo2d(
            s2p._halo_parts2d(ul, plan, 2, 1),
            s2p._halo_parts2d(fl, plan, 2, 1),
            g, H, N, Li // 2, Lj // 2, skc, block_i=bi)

    args = (_to_global2d(u, plan), _to_global2d(f, plan))
    a = np.asarray(_shmap2d(loc_ext, mesh2d, 2)(*args))
    b = np.asarray(_shmap2d(loc_halo, mesh2d, 2)(*args))
    np.testing.assert_array_equal(a, b)


def test_prolong_smooth_halo2d_matches_ext2d(mesh2d):
    plan = _plan2d()
    Li, Lj = plan.fine_local_i, plan.fine_local_j
    nc = (N + 1) // 2
    ec = _rand(35, n=nc, zero_boundary=True)
    e = _rand(36, zero_boundary=True)
    r = _rand(37, zero_boundary=True)
    n_iter, bi = 2, 6  # H=4, bi=6 >= H+2; L=12 dividing
    hh, hc = 2 * n_iter, n_iter + 1

    def to_g_coarse(x):
        _, sjc, _ = pk.padded_shape(nc)
        xp = pk.pad3(x)
        return jnp.pad(
            xp,
            ((0, plan.padded_i(1) - nc), (0, plan.padded_j(1) - sjc), (0, 0)),
        )

    def ext2(x, hi):
        return s2p._halo_ext_j(
            s2p._halo_ext_i(x, "x", plan.nx, hi), "y", plan.ny, px2.HJ)

    def loc_ext(ecl, el, rl):
        g = s2p._gij0(plan, 0, hh)
        return px2.prolong_smooth_ext2d(
            ext2(ecl, hc), ext2(el, hh), ext2(rl, hh), g, H, n_iter, N,
            Li, Lj, block_i=bi)

    def loc_halo(ecl, el, rl):
        g = s2p._gij0(plan, 0, hh)
        return px2.prolong_smooth_halo2d(
            s2p._halo_parts2d(ecl, plan, n_iter, n_iter + 1, bi // 2),
            s2p._halo_parts2d(el, plan, hh, hh, bi),
            s2p._halo_parts2d(rl, plan, hh, hh, bi),
            g, H, n_iter, N, Li, Lj, block_i=bi)

    from jax.sharding import PartitionSpec as P2
    spec = P2("x", "y")

    def run(fn):
        return jax.jit(jax.shard_map(
            fn, mesh=mesh2d, in_specs=(spec,) * 3, out_specs=spec,
            check_vma=False,
        ))(to_g_coarse(ec), _to_global2d(e, plan), _to_global2d(r, plan))

    np.testing.assert_array_equal(np.asarray(run(loc_ext)),
                                  np.asarray(run(loc_halo)))


def test_residual_df_norm_halo2d_matches_ext2d(mesh2d):
    plan = _plan2d()
    Li, Lj = plan.fine_local_i, plan.fine_local_j
    arrs = [_rand(s) for s in (41, 42, 43, 44)]
    bi = 8  # Li=12: overlap; owned-window double-count check

    def ext2(x):
        return s2p._halo_ext_j(
            s2p._halo_ext_i(x, "x", plan.nx, 1), "y", plan.ny, px2.HJ)

    def loc_ext(a1, a2, a3, a4):
        g = s2p._gij0(plan, 0, 1)
        r, p = px2.residual_df_norm_ext2d(
            ext2(a1), ext2(a2), ext2(a3), ext2(a4), g, H, N, Li, Lj,
            block_i=bi)
        return r, jax.lax.psum(p, ("x", "y")).reshape(1, 1)

    def loc_halo(a1, a2, a3, a4):
        g = s2p._gij0(plan, 0, 1)
        parts = [s2p._halo_parts2d(x, plan, 1, 1, bi)
                 for x in (a1, a2, a3, a4)]
        r, p = px2.residual_df_norm_halo2d(*parts, g, H, N, Li, Lj,
                                           block_i=bi)
        return r, jax.lax.psum(p, ("x", "y")).reshape(1, 1)

    from jax.sharding import PartitionSpec as P2
    spec = P2("x", "y")

    def run(fn):
        return jax.jit(jax.shard_map(
            fn, mesh=mesh2d, in_specs=(spec,) * 4,
            out_specs=(spec, P2()), check_vma=False,
        ))(*[_to_global2d(x, plan) for x in arrs])

    ra, na = run(loc_ext)
    rb, nb2 = run(loc_halo)
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))
    assert float(np.asarray(na).ravel()[0]) == float(np.asarray(nb2).ravel()[0])


# --------------------- mixed-BC halo-DMA kernels vs their ext twins ----
# (round-4 review finding: the mixed halo kernels were unreachable at
# the test suite's block_i=4 — these pin them directly, bi=8 with an
# overlapping tail for the smoother, bi=6 for the prolong.)

from multigrid_parallel_tpu.models.electrospray import electrospray_problem  # noqa: E402
from multigrid_parallel_tpu.ops import pallas_mixed as pmx  # noqa: E402


def _mixed_pin():
    prob = electrospray_problem()
    _, sj, sk = pk.padded_shape(N)
    return pmx.dirichlet_pin_planes(prob, N, sj, sk)


@pytest.mark.parametrize("from_zero", [False, True])
def test_mixed_rb_smooth_halo_matches_ext(mesh, from_zero):
    u, f = _rand(51), _rand(52)
    pin = _mixed_pin()
    hh, bi = 4, 8  # L=12: blocks 0, 4 (overlapping tail)

    def loc_ext(ul, fl):
        g = sp._gi0("x", L, hh)
        if from_zero:
            return pmx.mixed_rb_smooth_from_zero_ext(
                sp._halo_ext(fl, "x", NDEV, hh), pin, g, H, 2, N, L,
                red_first=True, block_i=bi)
        return pmx.mixed_rb_smooth_ext(
            sp._halo_ext(ul, "x", NDEV, hh), sp._halo_ext(fl, "x", NDEV, hh),
            pin, g, H, 2, N, L, red_first=True, block_i=bi)

    def loc_halo(ul, fl):
        g = sp._gi0("x", L, hh)
        if from_zero:
            return pmx.mixed_rb_smooth_from_zero_halo(
                sp._halo_parts(fl, "x", NDEV, hh, hh, bi), pin, g, H, 2,
                N, L, red_first=True, block_i=bi)
        return pmx.mixed_rb_smooth_halo(
            sp._halo_parts(ul, "x", NDEV, hh, hh, bi),
            sp._halo_parts(fl, "x", NDEV, hh, hh, bi),
            pin, g, H, 2, N, L, red_first=True, block_i=bi)

    args = (_to_global(u, L), _to_global(f, L))
    a = np.asarray(_shmap(loc_ext, mesh, 2)(*args))
    b = np.asarray(_shmap(loc_halo, mesh, 2)(*args))
    np.testing.assert_array_equal(a, b)


def test_mixed_prolong_smooth_halo_matches_ext(mesh):
    nc = (N + 1) // 2
    ec = _rand(53, n=nc, zero_boundary=True)
    e = _rand(54, zero_boundary=True)
    r = _rand(55, zero_boundary=True)
    pin = _mixed_pin()
    n_iter, bi = 2, 6  # bi >= H+2; L=12 dividing
    hh, hc = 2 * n_iter, n_iter + 1

    def loc_ext(ecl, el, rl):
        g = sp._gi0("x", L, hh)
        return pmx.mixed_prolong_smooth_ext(
            sp._halo_ext(ecl, "x", NDEV, hc), sp._halo_ext(el, "x", NDEV, hh),
            sp._halo_ext(rl, "x", NDEV, hh), pin, g, H, n_iter, N, L,
            block_i=bi)

    def loc_halo(ecl, el, rl):
        g = sp._gi0("x", L, hh)
        return pmx.mixed_prolong_smooth_halo(
            sp._halo_parts(ecl, "x", NDEV, n_iter, n_iter + 1, bi // 2),
            sp._halo_parts(el, "x", NDEV, hh, hh, bi),
            sp._halo_parts(rl, "x", NDEV, hh, hh, bi),
            pin, g, H, n_iter, N, L, block_i=bi)

    args = (_to_global(ec, L // 2), _to_global(e, L), _to_global(r, L))
    a = np.asarray(_shmap(loc_ext, mesh, 3)(*args))
    b = np.asarray(_shmap(loc_halo, mesh, 3)(*args))
    np.testing.assert_array_equal(a, b)


# ------------------ copy-free j-DMA 2D tier (x, jl, jr, lh, rhc) -------
# (round-4: the production 2D dispatch; the B-copy triples remain as
# the oracle here.)


def test_rb_smooth_jdma_matches_bcopy(mesh2d):
    plan = _plan2d()
    Li, Lj = plan.fine_local_i, plan.fine_local_j
    u, f = _rand(61), _rand(62)
    hh, bi = 4, 8

    def loc_b(ul, fl):
        g = s2p._gij0(plan, 0, hh)
        return px2.rb_smooth_halo2d(
            s2p._halo_parts2d(ul, plan, hh, hh, bi),
            s2p._halo_parts2d(fl, plan, hh, hh, bi),
            g, H, 2, N, Li, Lj, red_first=True, block_i=bi)

    def loc_j(ul, fl):
        g = s2p._gij0(plan, 0, hh)
        return px2.rb_smooth_halo2d(
            s2p._halo_parts2dj(ul, plan, hh, hh, bi),
            s2p._halo_parts2dj(fl, plan, hh, hh, bi),
            g, H, 2, N, Li, Lj, red_first=True, block_i=bi)

    args = (_to_global2d(u, plan), _to_global2d(f, plan))
    a = np.asarray(_shmap2d(loc_b, mesh2d, 2)(*args))
    b = np.asarray(_shmap2d(loc_j, mesh2d, 2)(*args))
    np.testing.assert_array_equal(a, b)


def test_residual_restrict_jdma_matches_bcopy(mesh2d):
    plan = _plan2d()
    Li, Lj = plan.fine_local_i, plan.fine_local_j
    u, f = _rand(63), _rand(64)
    bi = 4
    skc = cp._coarse_k_width(N, pk.padded_shape(N)[2])

    def loc_b(ul, fl):
        g = s2p._gij0(plan, 0, 2)
        return px2.residual_restrict_halo2d(
            s2p._halo_parts2d(ul, plan, 2, 1),
            s2p._halo_parts2d(fl, plan, 2, 1),
            g, H, N, Li // 2, Lj // 2, skc, block_i=bi)

    def loc_j(ul, fl):
        g = s2p._gij0(plan, 0, 2)
        return px2.residual_restrict_halo2d(
            s2p._halo_parts2dj(ul, plan, 2, 1),
            s2p._halo_parts2dj(fl, plan, 2, 1),
            g, H, N, Li // 2, Lj // 2, skc, block_i=bi, sjl=Lj)

    args = (_to_global2d(u, plan), _to_global2d(f, plan))
    a = np.asarray(_shmap2d(loc_b, mesh2d, 2)(*args))
    b = np.asarray(_shmap2d(loc_j, mesh2d, 2)(*args))
    np.testing.assert_array_equal(a, b)


def test_prolong_smooth_jdma_matches_bcopy(mesh2d):
    plan = _plan2d()
    Li, Lj = plan.fine_local_i, plan.fine_local_j
    nc = (N + 1) // 2
    ec = _rand(65, n=nc, zero_boundary=True)
    e = _rand(66, zero_boundary=True)
    r = _rand(67, zero_boundary=True)
    n_iter, bi = 2, 6
    hh = 2 * n_iter

    def to_g_coarse(x):
        _, sjc, _ = pk.padded_shape(nc)
        xp = pk.pad3(x)
        return jnp.pad(
            xp,
            ((0, plan.padded_i(1) - nc), (0, plan.padded_j(1) - sjc), (0, 0)),
        )

    def loc(parts):
        def go(ecl, el, rl):
            g = s2p._gij0(plan, 0, hh)
            return px2.prolong_smooth_halo2d(
                parts(ecl, plan, n_iter, n_iter + 1, bi // 2),
                parts(el, plan, hh, hh, bi),
                parts(rl, plan, hh, hh, bi),
                g, H, n_iter, N, Li, Lj, block_i=bi)
        return go

    from jax.sharding import PartitionSpec as P2
    spec = P2("x", "y")

    def run(fn):
        return jax.jit(jax.shard_map(
            fn, mesh=mesh2d, in_specs=(spec,) * 3, out_specs=spec,
            check_vma=False,
        ))(to_g_coarse(ec), _to_global2d(e, plan), _to_global2d(r, plan))

    a = np.asarray(run(loc(s2p._halo_parts2d)))
    b = np.asarray(run(loc(s2p._halo_parts2dj)))
    np.testing.assert_array_equal(a, b)


def test_prolong_smooth_jdma_unaligned_coarse(mesh2d):
    # sjlc = Lj//2 = 20 is NOT a multiple of the 8-row sublane tile: the
    # coarse slab's j-DMA windows are sublane-unaligned (allowed — only
    # the minor/lane dim needs tile alignment; see _tri_dma2d). This is
    # the geometry production plans hit under the 7% padding cap (e.g.
    # 257^3 1x1: depth-1 Lj=136 -> sjlc=68). Pin it bitwise vs the
    # B-copy tier.
    from multigrid_parallel_tpu.parallel.sharded2d import ShardPlan2D

    plan = ShardPlan2D(nx=4, ny=2, axes=("x", "y"), n_sharded=2,
                       fine_local_i=12, fine_local_j=40)
    Li, Lj = plan.fine_local_i, plan.fine_local_j
    nc = (N + 1) // 2
    ec = _rand(81, n=nc, zero_boundary=True)
    e = _rand(82, zero_boundary=True)
    r = _rand(83, zero_boundary=True)
    n_iter, bi = 2, 6
    hh = 2 * n_iter

    def to_g_coarse(x):
        _, sjc, _ = pk.padded_shape(nc)
        xp = pk.pad3(x)
        return jnp.pad(
            xp,
            ((0, plan.padded_i(1) - nc), (0, plan.padded_j(1) - sjc), (0, 0)),
        )

    def loc(parts):
        def go(ecl, el, rl):
            g = s2p._gij0(plan, 0, hh)
            return px2.prolong_smooth_halo2d(
                parts(ecl, plan, n_iter, n_iter + 1, bi // 2),
                parts(el, plan, hh, hh, bi),
                parts(rl, plan, hh, hh, bi),
                g, H, n_iter, N, Li, Lj, block_i=bi)
        return go

    from jax.sharding import PartitionSpec as P2
    spec = P2("x", "y")

    def run(fn):
        return jax.jit(jax.shard_map(
            fn, mesh=mesh2d, in_specs=(spec,) * 3, out_specs=spec,
            check_vma=False,
        ))(to_g_coarse(ec), _to_global2d(e, plan), _to_global2d(r, plan))

    a = np.asarray(run(loc(s2p._halo_parts2d)))
    b = np.asarray(run(loc(s2p._halo_parts2dj)))
    np.testing.assert_array_equal(a, b)


def test_residual_df_norm_jdma_matches_bcopy(mesh2d):
    plan = _plan2d()
    Li, Lj = plan.fine_local_i, plan.fine_local_j
    arrs = [_rand(s) for s in (71, 72, 73, 74)]
    bi = 8

    def loc(parts):
        def go(a1, a2, a3, a4):
            g = s2p._gij0(plan, 0, 1)
            ps = [parts(x, plan, 1, 1, bi) for x in (a1, a2, a3, a4)]
            r, p = px2.residual_df_norm_halo2d(*ps, g, H, N, Li, Lj,
                                               block_i=bi)
            return r, jax.lax.psum(p, ("x", "y")).reshape(1, 1)
        return go

    from jax.sharding import PartitionSpec as P2
    spec = P2("x", "y")

    def run(fn):
        return jax.jit(jax.shard_map(
            fn, mesh=mesh2d, in_specs=(spec,) * 4,
            out_specs=(spec, P2()), check_vma=False,
        ))(*[_to_global2d(x, plan) for x in arrs])

    ra, na = run(loc(s2p._halo_parts2d))
    rb, nb2 = run(loc(s2p._halo_parts2dj))
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))
    assert float(np.asarray(na).ravel()[0]) == float(np.asarray(nb2).ravel()[0])

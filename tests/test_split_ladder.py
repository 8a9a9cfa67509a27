"""Split-ladder dispatch coverage (round-4 review finding).

The ladder branches — single-iteration smoother passes and the
interpolate+correct+ONE-iteration prolong split — are gated on VMEM
planning outcomes (full-window block < 4) that only occur at 513³+
plane sizes, so at CPU test grids they would never execute. These tests
FORCE the gates by monkeypatching the block planners and pin that the
forced ladder produces BITWISE-identical results to the unforced path:
the ladder preserves the exact half-sweep sequence (pre-smooth
red-first, post-smooth black-first), and every kernel is bitwise
block_i-invariant, so any deviation is a dispatch bug (wrong n_iter,
wrong red_first, wrong halo widths).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigrid_parallel_tpu import CycleConfig, Hierarchy, poisson_3d_quadratic
from multigrid_parallel_tpu import cycles_padded as cp
from multigrid_parallel_tpu import cycles_split as cs
from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import pallas_sharded as px
from multigrid_parallel_tpu.parallel import sharded_padded as sp
from multigrid_parallel_tpu.parallel.sharded import ShardPlan, make_mesh

N = 33


def _zb(x):
    y = np.zeros_like(x)
    y[1:-1, 1:-1, 1:-1] = x[1:-1, 1:-1, 1:-1]
    return y


def _rand(seed, n=N):
    rng = np.random.default_rng(seed)
    return jnp.asarray(_zb(rng.standard_normal((n, n, n)).astype(np.float32)))


@pytest.mark.parametrize("from_zero", [True, False])
def test_padded_cycle_forced_split_ladder_bitwise(monkeypatch, from_zero):
    """cycles_padded._make_descend with the smoother's full window
    forced to bi=2 (triggering rb_smooth_fused_pipelined's and
    rb_smooth_from_zero_fused's single-iteration splits) and
    ps_fused_block_i forced to 0 at n_iter=2 (triggering the prolong
    bi_ps1 split branch) == the unforced cycle, bitwise."""
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4, dtype=jnp.float32)
    cfg = CycleConfig(n_smooth=2)
    r = pk.pad3(_rand(1))

    cyc = cp.make_padded_correction_cycle(hier, cfg, jnp_level_max=9)
    e0 = None if from_zero else pk.pad3(_rand(2))
    want = np.asarray(cyc(e0, r, from_zero=from_zero))

    real_auto = pk._auto_block_i
    real_ps = pk.ps_fused_block_i

    def fake_auto(n, sj, sk, halo, itemsize, pipelined, requested):
        bi = real_auto(n, sj, sk, halo, itemsize, pipelined, requested)
        return min(bi, 2) if halo >= 4 else bi

    def fake_ps(n, sj, sk, n_iter, itemsize=4, requested=16):
        return 0 if n_iter > 1 else real_ps(n, sj, sk, n_iter, itemsize,
                                            requested)

    monkeypatch.setattr(pk, "_auto_block_i", fake_auto)
    monkeypatch.setattr(pk, "ps_fused_block_i", fake_ps)
    # sanity: the forced gates actually flip at this size
    _, sj, sk = pk.padded_shape(N)
    assert fake_auto(N, sj, sk, 4, 4, True, 16) == 2
    assert real_auto(N, sj, sk, 2, 4, True, 16) >= 4
    assert fake_ps(N, sj, sk, 2) == 0 and fake_ps(N, sj, sk, 1) >= 4

    cyc_f = cp.make_padded_correction_cycle(hier, cfg, jnp_level_max=9)
    got = np.asarray(cyc_f(e0, r, from_zero=from_zero))
    np.testing.assert_array_equal(got, want)


def test_sharded_forced_split_ladder_matches_single_chip(monkeypatch):
    """sharded_padded.smooth_stage's use_split branch + the prolong
    n_iter=1 halo split, forced by shrinking the full-window planners;
    whole sharded solve == the (unforced) single-chip solve bitwise
    (the same comparison test_halo_kernels makes for the unforced
    dispatch)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4)
    cfg = CycleConfig(n_smooth=2)
    plan = ShardPlan(n_dev=8, axis="x", n_sharded=2, fine_local=12)
    prob = poisson_3d_quadratic()

    real_ext = px.ext_block_i
    real_pro = px.prolong_ext_block_i

    def fake_ext(L, sj, sk, halo, n_in, itemsize=4, requested=8):
        bi = real_ext(L, sj, sk, halo, n_in, itemsize, requested)
        return min(bi, 2) if halo >= 4 else bi

    def fake_pro(L, sj, sk, n_iter, itemsize=4, requested=8):
        bi = real_pro(L, sj, sk, n_iter, itemsize, requested)
        return min(bi, 2) if n_iter > 1 else bi

    monkeypatch.setattr(px, "ext_block_i", fake_ext)
    monkeypatch.setattr(px, "prolong_ext_block_i", fake_pro)
    # the forced gates flip: full windows land at 2, 1-iter windows >= 4
    _, sj, sk = pk.padded_shape(N)
    assert fake_ext(12, sj, sk, 4, 2) == 2 and real_ext(12, sj, sk, 2, 2) >= 4
    assert fake_pro(12, sj, sk, 2) == 2 and fake_pro(12, sj, sk, 1) >= 4

    run, plan = sp.make_sharded_df_solver(
        hier, cfg, mesh, plan, rel_tol=1e-10, max_cycles=20,
        inner_cycles=2, jnp_level_max=9, block_i=8,
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


def test_cycles_split_forced_ladder_bitwise(monkeypatch):
    """cycles_split's sm_split/ps_split branches, forced by capping the
    n_smooth>=2 plan at bi=4 (plan1 stays real, so both gates flip);
    the forced solver == the unforced solver bitwise."""
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4)
    cfg = CycleConfig(n_smooth=2)
    prob = poisson_3d_quadratic()
    init = cp.ref_init_norm(prob, hier)

    def solve():
        run = cs.make_split_df_solver(hier, cfg, rel_tol=1e-8,
                                      inner_cycles=2, init_norm=init,
                                      force=True)
        args = cs.setup_split_df_problem(prob, hier)
        out = run(*args)
        return [np.asarray(x) for x in out[:4]] + [float(out[4]),
                                                   int(out[5])]

    want = solve()

    real_plan = cs.split_plan

    def fake_plan(n, sj, skh, n_smooth, *a, **k):
        p = real_plan(n, sj, skh, n_smooth, *a, **k)
        if n_smooth >= 2:
            # cap ONLY the ladder-gated stages: capping step/resid would
            # regroup their SMEM norm accumulation (bi-dependent partial
            # sums) and break the bitwise comparison for an unrelated
            # reason
            p = dict(p, smooth=min(p["smooth"], 4), ps=min(p["ps"], 4))
        return p

    monkeypatch.setattr(cs, "split_plan", fake_plan)
    # gates flip: capped full plan < 8, 1-iter plan bigger
    from multigrid_parallel_tpu.ops import pallas_split as ps

    _, sj, skh = ps.split_shape(N)
    assert fake_plan(N, sj, skh, 2)["ps"] == 4 < real_plan(N, sj, skh, 1)["ps"]

    got = solve()
    assert got[5] == want[5]
    assert got[4] == want[4]
    for g, w in zip(got[:4], want[:4]):
        np.testing.assert_array_equal(g, w)

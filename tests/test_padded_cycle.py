"""Padded Pallas-based correction cycle vs the jnp f32 cycle, and the
padded mixed solver vs the analytic oracle (CPU interpreter mode)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigrid_parallel_tpu import CycleConfig, Hierarchy, poisson_3d_quadratic
from multigrid_parallel_tpu import cycles_padded as cp
from multigrid_parallel_tpu.cycles import _descend, setup_problem
from multigrid_parallel_tpu.ops import coarse as coarse_ops
from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import stencils_3d as ops3


def test_restrict_padded_matches_unpadded():
    nf = 17
    rng = np.random.default_rng(5)
    r = np.zeros((nf, nf, nf), np.float64)
    r[1:-1, 1:-1, 1:-1] = rng.standard_normal((nf - 2,) * 3)
    want = np.asarray(ops3.restrict_full_weighting(jnp.asarray(r)))
    got_p = cp.restrict_padded(pk.pad3(jnp.asarray(r)), nf)
    got = np.asarray(pk.unpad3(got_p, 9))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-13)
    # pad region stays zero
    full = np.asarray(got_p)
    assert np.all(full[:, 9:, :] == 0) and np.all(full[:, :, 9:] == 0)


def test_prolong_padded_matches_unpadded():
    nc, nf = 9, 17
    rng = np.random.default_rng(6)
    ec = np.zeros((nc, nc, nc))
    ec[1:-1, 1:-1, 1:-1] = rng.standard_normal((nc - 2,) * 3)
    ef = rng.standard_normal((nf, nf, nf))
    want = np.asarray(ops3.prolong_correct(jnp.asarray(ec), jnp.asarray(ef)))
    got_p = cp.prolong_correct_padded(pk.pad3(jnp.asarray(ec)), pk.pad3(jnp.asarray(ef)), nc)
    np.testing.assert_allclose(np.asarray(pk.unpad3(got_p, nf)), want, rtol=0, atol=1e-13)


@pytest.mark.parametrize("gamma,gamma_min_n", [(1, 0), (2, 0), (2, 17)])
def test_padded_correction_cycle_matches_jnp_cycle(gamma, gamma_min_n):
    # gamma=2 pins the W-cycle plumbing of cycles_padded._make_descend
    # against the reference-shaped recursion (cycles._descend, which
    # honors gamma at every level); gamma_min_n=17 pins the depth cap
    # the same way (at 17^3 it skips the 9-level revisit on BOTH sides).
    hier32 = Hierarchy(ndim=3, coarse_n=5, num_levels=3, dtype=jnp.float32)
    cfg = CycleConfig(n_smooth=2, gamma=gamma, gamma_min_n=gamma_min_n)
    n = hier32.finest_n
    rng = np.random.default_rng(7)
    r = np.zeros((n, n, n), np.float32)
    r[1:-1, 1:-1, 1:-1] = rng.standard_normal((n - 2,) * 3).astype(np.float32)
    rj = jnp.asarray(r)

    # jnp f32 correction cycle (zero init)
    coarse32 = coarse_ops.make_coarse_solver(5, hier32.spacing(0), 3, jnp.float32, "lu")
    want = _descend(
        ops3, hier32, cfg, coarse32, jnp.zeros_like(rj), rj, 2, correction=True
    )

    cyc = cp.make_padded_correction_cycle(hier32, cfg)
    got_p = cyc(jnp.zeros(pk.padded_shape(n), jnp.float32), pk.pad3(rj))
    np.testing.assert_allclose(
        np.asarray(pk.unpad3(got_p, n)), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_padded_mixed_solver_converges_to_oracle():
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4)  # 33^3, f64 outer
    cfg = CycleConfig(n_smooth=2)
    run = cp.make_on_device_mixed_solver_pallas(hier, cfg, rel_tol=1e-8, inner_cycles=2)
    u0, f = setup_problem(poisson_3d_quadratic(), hier)
    u, norm, n_outer = run(u0, f)
    init = float(jnp.sqrt(jnp.sum(f * f)))
    assert float(norm) <= 1e-8 * init
    assert int(n_outer) <= 10, int(n_outer)  # 2 inner cycles per outer step
    from multigrid_parallel_tpu.hierarchy import evaluate_on_grid

    exact = evaluate_on_grid(poisson_3d_quadratic().analytic, hier, 3)
    err = float(jnp.sqrt(jnp.sum((u - exact) ** 2)))
    assert err < 2e-8, err


def test_trim_layout_solver_matches_full():
    """k-TRIM layout (boundary fold + dropped high-k lane,
    pk.padded_shape_trim) produces the IDENTICAL solve: same outer-step
    count, same final norm, same solution after untrim — measured
    bit-identical on CPU at 33^3/65^3 (docs/ROOFLINE.md round-3)."""
    from multigrid_parallel_tpu.hierarchy import evaluate_on_grid

    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4)  # 33^3
    cfg = CycleConfig(n_smooth=2)
    prob = poisson_3d_quadratic()
    init = cp.ref_init_norm(prob, hier)

    run_t = cp.make_on_device_df_solver(
        hier, cfg, rel_tol=1e-8, inner_cycles=4, trim=True, init_norm=init
    )
    st = cp.setup_df_problem(prob, hier, trim=True)
    u_hi, u_lo, norm_t, it_t = run_t(*st)
    u_t = cp.untrim_solution(u_hi, u_lo, prob, hier)

    run_f = cp.make_on_device_df_solver(hier, cfg, rel_tol=1e-8, inner_cycles=4)
    st_f = cp.setup_df_problem(prob, hier)
    fu_hi, fu_lo, norm_f, it_f = run_f(*st_f)
    u_f = pk.unpad3(pk.df_to_f64(fu_hi, fu_lo), hier.finest_n)

    assert int(it_t) == int(it_f)
    assert float(norm_t) == pytest.approx(float(norm_f), rel=1e-6)
    np.testing.assert_allclose(np.asarray(u_t), np.asarray(u_f),
                               rtol=0, atol=1e-10)
    exact = evaluate_on_grid(prob.analytic, hier, 3)
    err = float(jnp.sqrt(jnp.sum((u_t - exact) ** 2)))
    assert err < 2e-8, err


def test_trim_layout_requires_init_norm():
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=3)
    with pytest.raises(ValueError):
        cp.make_on_device_df_solver(hier, CycleConfig(), trim=True)


def test_trim_restrict_prolong_shapes():
    """Trim-layout transfer ops keep the layout across levels and agree
    with the full-layout ops on the live region (129-level widths: trim
    128 vs full 256)."""
    nf = 257
    nc = 129
    rng = np.random.default_rng(3)
    r = np.zeros((nf, nf, nf), np.float32)
    r[1:-1, 1:-1, 1:-1] = rng.standard_normal((nf - 2,) * 3).astype(np.float32)
    rj = jnp.asarray(r)
    _, sj, skt = pk.padded_shape_trim(nf)
    assert skt == 256 and pk.padded_shape(nf)[2] == 384
    r_trim = jnp.pad(rj[:, :, : nf - 1],
                     ((0, 0), (0, sj - nf), (0, skt - (nf - 1))))
    rc_t = cp.restrict_padded(r_trim, nf)
    assert rc_t.shape == pk.padded_shape_trim(nc), rc_t.shape
    rc_f = cp.restrict_padded(pk.pad3(rj), nf)
    # trim stores coarse k = 0..nc-2 only (boundary col dropped)
    np.testing.assert_allclose(np.asarray(rc_t[:, :nc, : nc - 1]),
                               np.asarray(rc_f[:, :nc, : nc - 1]),
                               rtol=0, atol=1e-5)
    assert float(jnp.max(jnp.abs(rc_f[:, :, nc - 1]))) == 0.0
    # prolong back up: trim coarse -> trim fine, matches full on live
    ef_t = jnp.zeros((nf, sj, skt), jnp.float32)
    ef_f = jnp.zeros(pk.padded_shape(nf), jnp.float32)
    up_t = cp.prolong_correct_padded(rc_t, ef_t, nc)
    up_f = cp.prolong_correct_padded(rc_f, ef_f, nc)
    np.testing.assert_allclose(np.asarray(up_t[:, :nf, : nf - 1]),
                               np.asarray(up_f[:, :nf, : nf - 1]),
                               rtol=0, atol=1e-5)

"""Mixed-fold split-ladder dispatch coverage.

The fold descend's ladder branches (mixed_padded._make_mixed_descend_fold:
single-iteration smoother passes and the interpolate+correct+ONE-iteration
prolong split) are gated on VMEM planning outcomes that only occur at
513^3 fold planes — the configuration where the previous dispatch
delegated the whole subtree to the full layout and lost the fold tier
entirely. These tests FORCE the gates by monkeypatching the fold block
planners (the test_split_ladder.py pattern) and pin that the forced
ladder is BITWISE-identical to the unforced fold path: the ladder
preserves the exact half-sweep sequence (pre red-first, post black-first,
folded BC pass after every half-sweep), so any deviation is a dispatch
bug (wrong n_iter, wrong red_first, wrong block).

Ref: mg_3d_bkup.c:84-133 (the BC semantics the folded passes preserve).
"""

import numpy as np
import pytest

from multigrid_parallel_tpu import Hierarchy
from multigrid_parallel_tpu import mixed_padded as mp
from multigrid_parallel_tpu.mixed_bc import MixedBCSolver
from multigrid_parallel_tpu.models.electrospray import electrospray_problem
from multigrid_parallel_tpu.ops import pallas_mixed_fold as pmf

N = 33


def _solve(s, inner_cycles=1):
    run = mp.make_mixed_fold_df_solver(s, rel_tol=1e-6, max_cycles=30,
                                       inner_cycles=inner_cycles,
                                       jnp_level_max=9, block_i=8)
    st = mp.setup_mixed_fold_df_problem(s)
    out = run(*st)
    return [np.asarray(out[0]), np.asarray(out[1]), float(out[2]),
            int(out[3])]


@pytest.mark.parametrize("gamma", [1, 2])
def test_mixed_fold_forced_ladder_bitwise(monkeypatch, gamma):
    prob = electrospray_problem()
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4, length=prob.length)
    s = MixedBCSolver(prob, hier, n_smooth=2, gamma=gamma)

    want = _solve(s)

    real_sm = pmf.mixed_fold_block_i
    real_ps = pmf.mixed_fold_prolong_block_i

    def fake_sm(n, sj, skf, n_iter, itemsize=4, requested=8):
        bi = real_sm(n, sj, skf, n_iter, itemsize, requested)
        return min(bi, 2) if n_iter > 1 else bi

    def fake_ps(n, sj, skf, n_iter, itemsize=4, requested=8):
        return 0 if n_iter > 1 else real_ps(n, sj, skf, n_iter, itemsize,
                                            requested)

    monkeypatch.setattr(pmf, "mixed_fold_block_i", fake_sm)
    monkeypatch.setattr(pmf, "mixed_fold_prolong_block_i", fake_ps)
    # sanity: the forced gates actually flip at this size (sm_split and
    # ps_split both true: full windows tiny, 1-iter windows >= 4)
    _, sj, skf = pmf.fold_shape(N)
    assert fake_sm(N, sj, skf, 2) == 2 and fake_sm(N, sj, skf, 1) >= 4
    assert fake_ps(N, sj, skf, 2) == 0 and fake_ps(N, sj, skf, 1) >= 4

    got = _solve(s)
    assert got[3] == want[3]
    assert got[2] == want[2]
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_mixed_fold_smoother_iteration_split_bitwise():
    """The kernel-level fact the ladder relies on: two n_iter=1 fold
    smoother calls == one n_iter=2 call, bitwise (the folded BC pass
    runs after every half-sweep in both)."""
    import jax.numpy as jnp

    prob = electrospray_problem()
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=4, length=prob.length)
    n = hier.finest_n
    h = hier.spacing(hier.num_levels - 1)
    _, sj, skf = pmf.fold_shape(n)
    rng = np.random.default_rng(3)
    e = jnp.asarray(rng.standard_normal((n, sj, skf)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((n, sj, skf)).astype(np.float32))
    pin = pmf.fold_pin_planes(prob, n, sj, skf)

    for red_first in (True, False):
        full = pmf.mixed_rb_smooth_fold(e, r, pin, h, 2, n,
                                        red_first=red_first, block_i=8)
        step = pmf.mixed_rb_smooth_fold(e, r, pin, h, 1, n,
                                        red_first=red_first, block_i=8)
        step = pmf.mixed_rb_smooth_fold(step, r, pin, h, 1, n,
                                        red_first=red_first, block_i=8)
        np.testing.assert_array_equal(np.asarray(step), np.asarray(full))

    fz = pmf.mixed_rb_smooth_from_zero_fold(r, pin, h, 2, n,
                                            red_first=True, block_i=8)
    fz1 = pmf.mixed_rb_smooth_from_zero_fold(r, pin, h, 1, n,
                                             red_first=True, block_i=8)
    fz1 = pmf.mixed_rb_smooth_fold(fz1, r, pin, h, 1, n,
                                   red_first=True, block_i=8)
    np.testing.assert_array_equal(np.asarray(fz1), np.asarray(fz))

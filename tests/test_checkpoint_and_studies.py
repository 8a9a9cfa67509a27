"""Checkpoint/resume and standalone smoother-study tests."""

import numpy as np
import pytest

from multigrid_parallel_tpu import MultigridSolver
from multigrid_parallel_tpu.studies import smoother_study


def test_checkpoint_resume_bit_exact(tmp_path):
    s = MultigridSolver(coarse_n=5, num_levels=3, gs_iter=2)
    s.setup_boundary_conditions()
    for _ in range(3):
        s.lin_solve()
    path = str(tmp_path / "state.npz")
    s.save(path)

    # continue the original
    norms_orig = [s.lin_solve() for _ in range(3)]

    # resume from checkpoint and continue
    r = MultigridSolver.restore(path)
    norms_resumed = [r.lin_solve() for _ in range(3)]

    np.testing.assert_allclose(norms_resumed, norms_orig, rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(r.u), np.asarray(s.u))


def test_smoother_study_rb_ratio_fingerprint():
    # Standalone RB-GS study (test_rb_gs_3d.c): the per-iteration ratio
    # climbs toward the smoother's asymptotic value (~0.98 at ~50^3;
    # smaller at 17^3 since rho ~ 1 - O(h^2)).
    res = smoother_study(num_levels=3, rel_tol=1e-6, max_iters=800)
    assert res.converged
    assert 0.80 < res.final_ratio < 1.0, res.final_ratio
    # monotone late-stage ratios
    tail = res.residual_norms[-5:]
    ratios = [b / a for a, b in zip(tail, tail[1:])]
    assert max(ratios) - min(ratios) < 0.01, ratios


def test_smoother_study_rb_converges_slower_than_multigrid():
    from multigrid_parallel_tpu import CycleConfig, Hierarchy, poisson_3d_quadratic, solve

    res = smoother_study(num_levels=3, rel_tol=1e-6, max_iters=800)
    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=3)
    mg = solve(poisson_3d_quadratic(), hier, CycleConfig(n_smooth=2), rel_tol=1e-6)
    assert mg.n_cycles * 10 < res.n_iters  # multigrid wins by >10x


def test_smoother_study_jacobi_slower_than_rb():
    rb = smoother_study(num_levels=2, smoother="rb", rel_tol=1e-6, max_iters=2000)
    ja = smoother_study(num_levels=2, smoother="jacobi", rel_tol=1e-6, max_iters=2000)
    assert rb.converged
    # weighted Jacobi needs more iterations than RB-GS
    assert ja.n_iters > rb.n_iters


def test_smoother_study_50cubed_reference_fingerprint():
    # The reference's published artifact (red_black_gs_scalability.txt):
    # standalone RB-GS at 50^3 converges with asymptotic per-iteration
    # ratio 0.983675. The asymptotic ratio is reached long before full
    # convergence (full 1e-8 convergence takes ~1500 iterations at this
    # rate); at 600 iterations our pair ratio has settled to 0.9836746,
    # i.e. within 5e-7 of the artifact — the artifact itself only
    # carries 6 digits, so 1e-5 is the meaningful agreement bound.
    # The reference study's reported per-iteration ratio corresponds to
    # TWO of our red-first+black-first pairs (their smootherIter=2), so
    # the published 0.983675 equals our asymptotic pair-ratio squared.
    res = smoother_study(n=50, rel_tol=1e-8, max_iters=600)
    assert res.final_ratio**2 == pytest.approx(0.983675, abs=1e-5), res.final_ratio


def test_smoother_study_pallas_matches_jnp():
    # The Pallas-kernel study path (padded layout carried across
    # iterations, f padded once) must produce the same residual
    # trajectory as the jnp path.
    ref = smoother_study(num_levels=2, rel_tol=0.0, max_iters=6)
    pal = smoother_study(num_levels=2, rel_tol=0.0, max_iters=6, use_pallas=True)
    assert pal.n_iters == ref.n_iters
    for a, b in zip(pal.residual_norms, ref.residual_norms):
        assert a == pytest.approx(b, rel=1e-5)

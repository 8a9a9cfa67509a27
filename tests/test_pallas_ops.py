"""Pallas kernels vs jnp reference ops (interpreter mode on CPU).

The jnp ops are themselves golden-tested against loop-level C semantics
(test_ops_3d.py), so agreement here closes the chain kernel -> jnp -> C.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from multigrid_parallel_tpu.ops import pallas3d
from multigrid_parallel_tpu.ops import stencils_3d as ops

N = 17
H = 1.0 / (N - 1)


@pytest.fixture
def uf():
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.standard_normal((N, N, N)), dtype=jnp.float32)
    f = jnp.asarray(rng.standard_normal((N, N, N)), dtype=jnp.float32)
    return u, f


@pytest.mark.parametrize("n_iter", [1, 2])
@pytest.mark.parametrize("red_first", [True, False])
def test_rb_smooth_fused_matches_jnp(uf, n_iter, red_first):
    u, f = uf
    want = np.asarray(ops.rb_smooth(u, f, H, n_iter, red_first=red_first))
    got = np.asarray(
        pallas3d.rb_smooth_fused(u, f, H, n_iter, red_first=red_first, block_i=4)
    )
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_rb_smooth_fused_nondivisible_blocks(uf):
    # N=17 with block_i=8: 3 blocks, last partial — edge masking must hold
    u, f = uf
    want = np.asarray(ops.rb_smooth(u, f, H, 2, red_first=True))
    got = np.asarray(pallas3d.rb_smooth_fused(u, f, H, 2, red_first=True, block_i=8))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_rb_smooth_fused_boundary_untouched(uf):
    u, f = uf
    got = np.asarray(pallas3d.rb_smooth_fused(u, f, H, 2, block_i=4))
    un = np.asarray(u)
    for ax in range(3):
        for side in (0, -1):
            idx = [slice(None)] * 3
            idx[ax] = side
            np.testing.assert_array_equal(got[tuple(idx)], un[tuple(idx)])


def test_residual_fused_matches_jnp(uf):
    u, f = uf
    want = np.asarray(ops.residual(u, f, H))
    got = np.asarray(pallas3d.residual_fused(u, f, H, block_i=4))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    assert np.all(got[0] == 0) and np.all(got[:, :, -1] == 0)


def test_residual_norm_fused(uf):
    u, f = uf
    want = float(ops.residual_norm(u, f, H))
    got = float(pallas3d.residual_norm_fused(u, f, H, block_i=4))
    assert got == pytest.approx(want, rel=1e-5)


def test_fused_smoother_in_f64(uf):
    # f64 path (CPU interpreter; TPU would emulate) for parity checking
    u, f = uf
    u64, f64 = u.astype(jnp.float64), f.astype(jnp.float64)
    want = np.asarray(ops.rb_smooth(u64, f64, H, 1))
    got = np.asarray(pallas3d.rb_smooth_fused(u64, f64, H, 1, block_i=4))
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-14)


def test_rb_smooth_residual_fused_matches_separate(uf):
    from multigrid_parallel_tpu.ops import pallas3d as pk

    u, f = uf
    up, fp = pk.pad3(u), pk.pad3(f)
    want_u = pk.rb_smooth_fused_padded(up, fp, H, 2, N, block_i=4)
    want_r = pk.residual_fused_padded(want_u, fp, H, N, block_i=4)
    got_u, got_r = pk.rb_smooth_residual_fused_padded(up, fp, H, 2, N, block_i=4)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u),
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n_iter", [1, 2, 3])
@pytest.mark.parametrize("block_i", [2, 4, 8])
def test_rb_smooth_pipelined_matches_jnp(n_iter, block_i):
    # the kernel wired into the hot path (incl. the iteration-split
    # fallback when the fusion halo exceeds the planning budget)
    from multigrid_parallel_tpu.ops import pallas3d as pk

    rng = np.random.default_rng(13)
    u = jnp.asarray(rng.standard_normal((N, N, N)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((N, N, N)), jnp.float32)
    want = np.asarray(ops.rb_smooth(u, f, H, n_iter))
    got = np.asarray(
        pk.unpad3(
            pk.rb_smooth_fused_pipelined(
                pk.pad3(u), pk.pad3(f), H, n_iter, N, block_i=block_i
            ),
            N,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("block_i", [2, 4, 8])
def test_residual_pipelined_matches_jnp(block_i):
    from multigrid_parallel_tpu.ops import pallas3d as pk

    rng = np.random.default_rng(14)
    u = jnp.asarray(rng.standard_normal((N, N, N)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((N, N, N)), jnp.float32)
    want = np.asarray(ops.residual(u, f, H))
    got = np.asarray(
        pk.unpad3(
            pk.residual_fused_pipelined(pk.pad3(u), pk.pad3(f), H, N,
                                        block_i=block_i),
            N,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

"""Compile + validate the distributed fast path under REAL Mosaic.

Round-2 verdict: every kernel in ops/pallas_sharded.py had only ever run
in interpreter mode on the CPU test mesh. This script closes that gap on
the real chip, in two stages:

  A. Direct-call each ext kernel (no shard_map) on-device at 65^3-ish
     local sizes, against the single-chip fused kernels / jnp ops as the
     oracle — a cheap per-kernel Mosaic lowering check.
  B. Run the whole distributed solver (make_sharded_df_solver) on a
     1-device TPU mesh at 257^3, timed against the single-chip solver —
     the sharded path's overhead at n_dev=1 IS the distributed tax.

Usage (real TPU):  python scripts/tpu_sharded_compile.py [--skip-a]
Writes results to stdout; docs/SCALING.md records the artifact.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from multigrid_parallel_tpu import CycleConfig, Hierarchy, poisson_3d_quadratic
from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import pallas_sharded as px
from multigrid_parallel_tpu.parallel import sharded_padded as sp
from multigrid_parallel_tpu.parallel.sharded import ShardPlan


def sync(x):
    # axon's block_until_ready does not block; a scalar readback does.
    return float(jnp.sum(x.astype(jnp.float32)))


def _zb(x):
    y = np.zeros_like(x)
    y[1:-1, 1:-1, 1:-1] = x[1:-1, 1:-1, 1:-1]
    return y


def stage_a(n=65, block_i=8):
    """Direct-call every ext kernel; compare against single-chip path."""
    print(f"== stage A: per-kernel Mosaic compile at n={n} ==", flush=True)
    _, sj, sk = pk.padded_shape(n)
    L = -(-n // 8) * 8  # one device owns the whole (i-padded) grid
    h = 1.0 / (n - 1)
    n_iter = 2
    H = 2 * n_iter
    rng = np.random.default_rng(0)
    e = jnp.asarray(_zb(rng.standard_normal((n, n, n))).astype(np.float32))
    r = jnp.asarray(_zb(rng.standard_normal((n, n, n))).astype(np.float32))
    ep = jnp.pad(pk.pad3(e), ((0, L - n), (0, 0), (0, 0)))
    rp = jnp.pad(pk.pad3(r), ((0, L - n), (0, 0), (0, 0)))

    def ext(x, halo):
        return jnp.pad(x, ((halo, halo), (0, 0), (0, 0)))

    def gi0(halo):
        return jnp.asarray([-halo], jnp.int32)

    results = {}

    def check(name, got, want, atol=3e-6):
        got = np.asarray(got)[:n, :n, :n]
        want = np.asarray(want)[:n, :n, :n]
        scale = max(np.abs(want).max(), 1e-30)
        err = np.abs(got - want).max() / scale
        ok = err <= atol
        results[name] = (ok, err)
        print(f"  {name:28s} {'OK' if ok else 'FAIL'}  rel-err {err:.2e}",
              flush=True)

    # 1. rb_smooth_ext vs single-chip fused stage
    t0 = time.perf_counter()
    got = px.rb_smooth_ext(ext(ep, H), ext(rp, H), gi0(H), h, n_iter, n, L,
                           red_first=True, block_i=block_i)
    sync(got)
    print(f"  [compile+run {time.perf_counter()-t0:.1f}s]", flush=True)
    want = pk.rb_smooth_fused_pipelined(ep[:n], rp[:n], h, n_iter, n,
                                        red_first=True, block_i=8)
    check("rb_smooth_ext", got, want)

    # 2. rb_smooth_from_zero_ext
    t0 = time.perf_counter()
    got = px.rb_smooth_from_zero_ext(ext(rp, H), gi0(H), h, n_iter, n, L,
                                     red_first=True, block_i=block_i)
    sync(got)
    print(f"  [compile+run {time.perf_counter()-t0:.1f}s]", flush=True)
    want = pk.rb_smooth_from_zero_fused(rp[:n], h, n_iter, n, red_first=True,
                                        block_i=8)
    check("rb_smooth_from_zero_ext", got, want)

    # 3. residual_ext
    t0 = time.perf_counter()
    got = px.residual_ext(ext(ep, 1), ext(rp, 1), gi0(1), h, n, L,
                          block_i=block_i)
    sync(got)
    print(f"  [compile+run {time.perf_counter()-t0:.1f}s]", flush=True)
    want = pk.residual_fused_pipelined(ep[:n], rp[:n], h, n)
    check("residual_ext", got, want)

    # 4. residual_restrict_ext
    nc = (n + 1) // 2
    Lc = L // 2
    bi_r = px.restrict_ext_block_i(Lc, sj, sk, requested=block_i)
    t0 = time.perf_counter()
    got_c = px.residual_restrict_ext(ext(ep, 2), ext(rp, 2), gi0(2), h, n, Lc,
                                     block_i=bi_r)
    sync(got_c)
    print(f"  [compile+run {time.perf_counter()-t0:.1f}s]", flush=True)
    bi1 = pk.rr_fused_block_i(n, sj, sk, 4)
    want_c = pk.residual_restrict_fused_padded(ep[:n], rp[:n], h, n, block_i=bi1)
    got_cn = np.asarray(got_c)[:nc, :nc, :nc]
    want_cn = np.asarray(want_c)[:nc, :nc, :nc]
    scale = max(np.abs(want_cn).max(), 1e-30)
    err = np.abs(got_cn - want_cn).max() / scale
    results["residual_restrict_ext"] = (err <= 3e-6, err)
    print(f"  {'residual_restrict_ext':28s} {'OK' if err <= 3e-6 else 'FAIL'}"
          f"  rel-err {err:.2e}", flush=True)

    # 5. prolong_smooth_ext
    ec = jnp.asarray(_zb(rng.standard_normal((nc, nc, nc))).astype(np.float32))
    ecp = jnp.pad(pk.pad3(ec), ((0, Lc - nc), (0, 0), (0, 0)))
    hc = H // 2 + 1
    t0 = time.perf_counter()
    got = px.prolong_smooth_ext(ext(ecp, hc), ext(ep, H), ext(rp, H), gi0(H),
                                h, n_iter, n, L, block_i=block_i)
    sync(got)
    print(f"  [compile+run {time.perf_counter()-t0:.1f}s]", flush=True)
    bi_p = pk.ps_fused_block_i(n, sj, sk, n_iter, 4)
    want = pk.prolong_smooth_fused_padded(ecp[:nc], ep[:n], rp[:n], h,
                                          n_iter, n, block_i=bi_p)
    check("prolong_smooth_ext", got, want)

    # 6. residual_df_norm_ext (SMEM norm output — the prime suspect)
    u64 = jnp.asarray(_zb(rng.standard_normal((n, n, n))))
    f64 = jnp.asarray(_zb(rng.standard_normal((n, n, n))))
    u_hi, u_lo = pk.df_split(u64, pad=True)
    f_hi, f_lo = pk.df_split(f64, pad=True)
    pad_i = ((0, L - n), (0, 0), (0, 0))
    u_hi, u_lo = jnp.pad(u_hi, pad_i), jnp.pad(u_lo, pad_i)
    f_hi, f_lo = jnp.pad(f_hi, pad_i), jnp.pad(f_lo, pad_i)
    t0 = time.perf_counter()
    got_r, got_n2 = px.residual_df_norm_ext(
        ext(u_hi, 1), ext(u_lo, 1), ext(f_hi, 1), ext(f_lo, 1), gi0(1),
        h, n, L, block_i=block_i,
    )
    sync(got_r)
    print(f"  [compile+run {time.perf_counter()-t0:.1f}s]", flush=True)
    want_r, want_n2 = pk.residual_df_norm_fused_padded(
        u_hi[:n], u_lo[:n], f_hi[:n], f_lo[:n], h, n
    )
    check("residual_df_norm_ext", got_r, want_r)
    n2_err = abs(float(got_n2) - float(want_n2)) / max(abs(float(want_n2)), 1e-30)
    ok = n2_err <= 1e-5
    results["residual_df_norm_ext.n2"] = (ok, n2_err)
    print(f"  {'residual_df_norm_ext.n2':28s} {'OK' if ok else 'FAIL'}"
          f"  rel-err {n2_err:.2e}", flush=True)

    bad = [k for k, (ok, _) in results.items() if not ok]
    print(f"stage A: {len(results) - len(bad)}/{len(results)} OK"
          + (f"  FAILED: {bad}" if bad else ""), flush=True)
    return not bad


def stage_b(levels=7, repeats=5, inner_cycles=4, n_sharded=3, block_i=8):
    """Whole distributed solver, 1-device TPU mesh, 257^3."""
    from jax.sharding import Mesh

    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=levels)
    n = hier.finest_n
    print(f"== stage B: make_sharded_df_solver, 1-dev mesh, {n}^3 ==",
          flush=True)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("x",))
    fine_local = -(-n // (1 << n_sharded)) * (1 << n_sharded)
    plan = ShardPlan(n_dev=1, axis="x", n_sharded=n_sharded,
                     fine_local=fine_local)
    cfg = CycleConfig(n_smooth=2)
    t0 = time.perf_counter()
    run, plan = sp.make_sharded_df_solver(
        hier, cfg, mesh, plan, rel_tol=1e-8, inner_cycles=inner_cycles,
        block_i=block_i,
    )
    st = sp.setup_df_problem_sharded_padded(poisson_3d_quadratic(), hier,
                                            mesh, plan)
    u_hi, u_lo, norm, n_outer = run(*st)
    norm, n_outer = float(norm), int(n_outer)
    print(f"  compile+first solve {time.perf_counter()-t0:.1f}s  "
          f"norm {norm:.3e}  n_outer {n_outer}", flush=True)
    init = float(jnp.sqrt(jnp.sum(st[2].astype(jnp.float64) ** 2)))
    assert norm <= 1e-8 * init, (norm, init)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _, _, nd, od = run(*st)
        float(nd), int(od)
        times.append(time.perf_counter() - t0)
    best = min(times)
    med = sorted(times)[len(times) // 2]
    print(f"  sharded(1dev) wall: best {best:.4f}s  median {med:.4f}s  "
          f"(times {['%.3f' % t for t in times]})", flush=True)

    # single-chip reference solve, same session (same contention)
    from multigrid_parallel_tpu.cycles_padded import (
        make_on_device_df_solver, setup_df_problem,
    )

    run1 = make_on_device_df_solver(hier, cfg, rel_tol=1e-8,
                                    inner_cycles=inner_cycles)
    st1 = setup_df_problem(poisson_3d_quadratic(), hier)
    _, _, n1, o1 = run1(*st1)
    float(n1), int(o1)
    times1 = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _, _, nd, od = run1(*st1)
        float(nd), int(od)
        times1.append(time.perf_counter() - t0)
    best1 = min(times1)
    print(f"  single-chip   wall: best {best1:.4f}s  median "
          f"{sorted(times1)[len(times1)//2]:.4f}s", flush=True)
    print(f"  distributed tax at n_dev=1: {best/best1:.3f}x "
          f"(+{(best-best1)*1e3:.1f} ms)", flush=True)


def stage_c(n=65, block_i=8):
    """Direct-call every 2D ext kernel (ops.pallas_sharded2d) under real
    Mosaic, against the 1D ext kernels on the same data (gj0 = -HJ, one
    j shard owning the whole width — the 2D kernels must reproduce the
    1D results exactly)."""
    from multigrid_parallel_tpu.ops import pallas_sharded2d as px2

    print(f"== stage C: 2D ext kernels, Mosaic compile at n={n} ==",
          flush=True)
    _, sj, sk = pk.padded_shape(n)
    sjl = -(-sj // 8) * 8  # owned j extent = full padded width
    L = -(-n // 8) * 8
    h = 1.0 / (n - 1)
    n_iter = 2
    H = 2 * n_iter
    HJ = px2.HJ
    rng = np.random.default_rng(3)
    e = jnp.asarray(_zb(rng.standard_normal((n, n, n))).astype(np.float32))
    r = jnp.asarray(_zb(rng.standard_normal((n, n, n))).astype(np.float32))

    def blockify(x, lloc=L, width=sjl):
        xp = pk.pad3(x)
        if width >= xp.shape[1]:
            xp = jnp.pad(xp, ((0, 0), (0, width - xp.shape[1]), (0, 0)))
        else:
            # owned width below the padded width: the dropped columns are
            # zero pad (width >= n always)
            xp = xp[:, :width]
        return jnp.pad(xp, ((0, lloc - x.shape[0]), (0, 0), (0, 0)))

    def ext(x, hi):
        return jnp.pad(x, ((hi, hi), (HJ, HJ), (0, 0)))

    def gij0(hi):
        return jnp.asarray([-hi, -HJ], jnp.int32)

    ep, rp = blockify(e), blockify(r)
    results = {}

    def check(name, got, want, atol=3e-6):
        got = np.asarray(got)[:n, :n, :n]
        want = np.asarray(want)[:n, :n, :n]
        scale = max(np.abs(want).max(), 1e-30)
        err = np.abs(got - want).max() / scale
        ok = err <= atol
        results[name] = (ok, err)
        print(f"  {name:28s} {'OK' if ok else 'FAIL'}  rel-err {err:.2e}",
              flush=True)

    t0 = time.perf_counter()
    got = px2.rb_smooth_ext2d(ext(ep, H), ext(rp, H), gij0(H), h, n_iter, n,
                              L, sjl, red_first=True, block_i=block_i)
    sync(got)
    print(f"  [compile+run {time.perf_counter()-t0:.1f}s]", flush=True)
    want = pk.rb_smooth_fused_pipelined(ep[:n, :sj], rp[:n, :sj], h, n_iter,
                                        n, red_first=True, block_i=8)
    check("rb_smooth_ext2d", got, want)

    t0 = time.perf_counter()
    got = px2.rb_smooth_from_zero_ext2d(ext(rp, H), gij0(H), h, n_iter, n,
                                        L, sjl, red_first=True,
                                        block_i=block_i)
    sync(got)
    print(f"  [compile+run {time.perf_counter()-t0:.1f}s]", flush=True)
    want = pk.rb_smooth_from_zero_fused(rp[:n, :sj], h, n_iter, n,
                                        red_first=True, block_i=8)
    check("rb_smooth_from_zero_ext2d", got, want)

    nc = (n + 1) // 2
    Lc = L // 2
    skc = pk.padded_shape(nc)[2]
    bi_r = px2.restrict2d_block_i(Lc, sjl + 2 * HJ, sk, requested=block_i)
    t0 = time.perf_counter()
    got_c = px2.residual_restrict_ext2d(ext(ep, 2), ext(rp, 2), gij0(2), h,
                                        n, Lc, sjl // 2, skc, block_i=bi_r)
    sync(got_c)
    print(f"  [compile+run {time.perf_counter()-t0:.1f}s]", flush=True)
    bi1 = pk.rr_fused_block_i(n, sj, sk, 4)
    want_c = pk.residual_restrict_fused_padded(ep[:n, :sj], rp[:n, :sj], h,
                                               n, block_i=bi1)
    got_cn = np.asarray(got_c)[:nc, :nc, :nc]
    want_cn = np.asarray(want_c)[:nc, :nc, :nc]
    scale = max(np.abs(want_cn).max(), 1e-30)
    err = np.abs(got_cn - want_cn).max() / scale
    results["residual_restrict_ext2d"] = (err <= 3e-6, err)
    print(f"  {'residual_restrict_ext2d':28s} "
          f"{'OK' if err <= 3e-6 else 'FAIL'}  rel-err {err:.2e}", flush=True)

    ec = jnp.asarray(_zb(rng.standard_normal((nc, nc, nc))).astype(np.float32))
    ecb = blockify(ec, Lc, sjl // 2)
    hc = H // 2 + 1
    t0 = time.perf_counter()
    got = px2.prolong_smooth_ext2d(
        ext(ecb, hc), ext(ep, H), ext(rp, H), gij0(H), h, n_iter, n, L, sjl,
        block_i=block_i,
    )
    sync(got)
    print(f"  [compile+run {time.perf_counter()-t0:.1f}s]", flush=True)
    bi_p = pk.ps_fused_block_i(n, sj, sk, n_iter, 4)
    want = pk.prolong_smooth_fused_padded(
        pk.pad3(ec), ep[:n, :sj], rp[:n, :sj], h, n_iter, n, block_i=bi_p,
    )
    check("prolong_smooth_ext2d", got, want)

    u64 = jnp.asarray(_zb(rng.standard_normal((n, n, n))))
    f64 = jnp.asarray(_zb(rng.standard_normal((n, n, n))))

    def prep(x64):
        hi, lo = pk.df_split(x64, pad=True)
        w = ((0, L - n), (0, sjl - hi.shape[1]), (0, 0))
        return jnp.pad(hi, w), jnp.pad(lo, w)

    u_hi, u_lo = prep(u64)
    f_hi, f_lo = prep(f64)
    t0 = time.perf_counter()
    got_r, got_n2 = px2.residual_df_norm_ext2d(
        ext(u_hi, 1), ext(u_lo, 1), ext(f_hi, 1), ext(f_lo, 1), gij0(1),
        h, n, L, sjl, block_i=block_i,
    )
    sync(got_r)
    print(f"  [compile+run {time.perf_counter()-t0:.1f}s]", flush=True)
    want_r, want_n2 = pk.residual_df_norm_fused_padded(
        u_hi[:n, :sj], u_lo[:n, :sj], f_hi[:n, :sj], f_lo[:n, :sj], h, n
    )
    check("residual_df_norm_ext2d", got_r, want_r)
    n2_err = abs(float(got_n2) - float(want_n2)) / max(abs(float(want_n2)),
                                                       1e-30)
    ok = n2_err <= 1e-5
    results["residual_df_norm_ext2d.n2"] = (ok, n2_err)
    print(f"  {'residual_df_norm_ext2d.n2':28s} {'OK' if ok else 'FAIL'}"
          f"  rel-err {n2_err:.2e}", flush=True)

    bad = [k for k, (ok, _) in results.items() if not ok]
    print(f"stage C: {len(results) - len(bad)}/{len(results)} OK"
          + (f"  FAILED: {bad}" if bad else ""), flush=True)
    return not bad


def stage_d(levels=7, repeats=5, inner_cycles=4, n_sharded=3, block_i=8):
    """Round 4: the halo-DMA tier's 1-dev distributed tax on the TRIM
    layout — sharded trim solve (halo kernels active) vs the single-chip
    trim solver, same session. Pass levels=8 for the first-ever 513^3
    on-chip sharded solve."""
    from jax.sharding import Mesh

    from multigrid_parallel_tpu.cycles_padded import (
        make_on_device_df_solver, ref_init_norm, setup_df_problem,
    )

    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=levels)
    n = hier.finest_n
    print(f"== stage D: trim sharded (halo-DMA) vs single-chip, 1-dev "
          f"mesh, {n}^3 ==", flush=True)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("x",))
    fine_local = -(-n // (1 << n_sharded)) * (1 << n_sharded)
    plan = ShardPlan(n_dev=1, axis="x", n_sharded=n_sharded,
                     fine_local=fine_local)
    cfg = CycleConfig(n_smooth=2)
    problem = poisson_3d_quadratic()
    init = ref_init_norm(problem, hier)

    t0 = time.perf_counter()
    run, plan = sp.make_sharded_df_solver(
        hier, cfg, mesh, plan, rel_tol=1e-8, inner_cycles=inner_cycles,
        block_i=block_i, trim=True, init_norm=init,
    )
    st = sp.setup_df_problem_sharded_padded(problem, hier, mesh, plan,
                                            trim=True)
    _, _, norm, n_outer = run(*st)
    norm, n_outer = float(norm), int(n_outer)
    print(f"  compile+first solve {time.perf_counter()-t0:.1f}s  "
          f"norm {norm:.3e}  n_outer {n_outer}", flush=True)
    assert norm <= 1e-8 * init, (norm, init)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _, _, nd, od = run(*st)
        float(nd), int(od)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"  sharded-trim(1dev,halo) wall: best {best:.4f}s  median "
          f"{sorted(times)[len(times)//2]:.4f}s "
          f"(times {['%.3f' % t for t in times]})", flush=True)

    run1 = make_on_device_df_solver(hier, cfg, rel_tol=1e-8,
                                    inner_cycles=inner_cycles,
                                    trim=True, init_norm=init)
    st1 = setup_df_problem(problem, hier, trim=True)
    _, _, n1, o1 = run1(*st1)
    float(n1), int(o1)
    times1 = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _, _, nd, od = run1(*st1)
        float(nd), int(od)
        times1.append(time.perf_counter() - t0)
    best1 = min(times1)
    print(f"  single-chip-trim   wall: best {best1:.4f}s  median "
          f"{sorted(times1)[len(times1)//2]:.4f}s", flush=True)
    print(f"  distributed tax at n_dev=1 (trim+halo): {best/best1:.3f}x "
          f"(+{(best-best1)*1e3:.1f} ms)", flush=True)



def stage_h(n=65, block_i=8):
    """Round 4: direct-call the generalized (overlapping-tail) halo-DMA
    kernels under REAL Mosaic at a NON-dividing L, against the ext
    kernels as oracle — validates the tri-source dynamic-offset DMA and
    the composite tail buffer lower correctly on-chip."""
    import numpy as np

    from multigrid_parallel_tpu.ops import pallas_sharded2d as px2

    print(f"== stage H: halo-DMA kernels (overlap blocks) vs ext, n={n}, "
          f"1-dev, Mosaic ==", flush=True)
    _, sj, sk = pk.padded_shape(n)
    L = -(-n // 4) * 4 + 4  # 72 at n=65: NOT a multiple of 16 -> overlap
    assert L % 16 != 0, L
    h = 1.0 / (n - 1)
    n_iter = 2
    H = 2 * n_iter
    rng = np.random.default_rng(0)
    e = jnp.asarray(_zb(rng.standard_normal((n, n, n))).astype(np.float32))
    r = jnp.asarray(_zb(rng.standard_normal((n, n, n))).astype(np.float32))
    ep = jnp.pad(pk.pad3(e), ((0, L - n), (0, 0), (0, 0)))
    rp = jnp.pad(pk.pad3(r), ((0, L - n), (0, 0), (0, 0)))
    bi = 16  # L = 72: blocks 0,16,32,48,56 -> overlapping tail

    def ext(x, halo):
        return jnp.pad(x, ((halo, halo), (0, 0), (0, 0)))

    def parts(x, kl, kr, tail_local):
        # 1-dev stand-in for _halo_parts: zero side buffers + composite
        zl = jnp.zeros((kl,) + x.shape[1:], x.dtype)
        zr = jnp.zeros((kr,) + x.shape[1:], x.dtype)
        rhc = jnp.concatenate([x[x.shape[0] - tail_local:], zr], axis=0) \
            if tail_local else zr
        return (x, zl, rhc)

    def gi0(halo):
        return jnp.asarray([-halo], jnp.int32)

    results = {}

    def check(name, got, want):
        got, want = np.asarray(got), np.asarray(want)
        ok = np.array_equal(got, want)
        err = 0.0 if ok else np.abs(got - want).max()
        results[name] = ok
        print(f"  {name:30s} {'OK (bitwise)' if ok else f'FAIL {err:.2e}'}",
              flush=True)

    t0 = time.perf_counter()
    got = px.rb_smooth_halo(parts(ep, H, H, bi), parts(rp, H, H, bi),
                            gi0(H), h, n_iter, n, L, True, bi)
    sync(got)
    print(f"  [compile+run {time.perf_counter()-t0:.1f}s]", flush=True)
    want = px.rb_smooth_ext(ext(ep, H), ext(rp, H), gi0(H), h, n_iter, n, L,
                            True, bi)
    check("rb_smooth_halo(overlap)", got, want)

    got = px.residual_restrict_halo(parts(ep, 2, 1, 0), parts(rp, 2, 1, 0),
                                    gi0(2), h, n, L // 2, block_i=4)
    want = px.residual_restrict_ext(ext(ep, 2), ext(rp, 2), gi0(2), h, n,
                                    L // 2, block_i=4)
    check("residual_restrict_halo", got, want)  # Lc=36, bi=4: divides

    ec = jnp.asarray(_zb(rng.standard_normal(((n + 1) // 2,) * 3))
                     .astype(np.float32))
    ecp = jnp.pad(pk.pad3(ec), ((0, L // 2 - (n + 1) // 2), (0, 0), (0, 0)))
    got = px.prolong_smooth_halo(
        parts(ecp, n_iter, n_iter + 1, bi // 2),
        parts(ep, H, H, bi), parts(rp, H, H, bi),
        gi0(H), h, n_iter, n, L, block_i=bi,
    )
    want = px.prolong_smooth_ext(
        ext(ecp, n_iter + 1), ext(ep, H), ext(rp, H),
        gi0(H), h, n_iter, n, L, block_i=bi,
    )
    check("prolong_smooth_halo(overlap)", got, want)

    arrs = [jnp.pad(pk.pad3(jnp.asarray(
        _zb(rng.standard_normal((n, n, n))).astype(np.float32))),
        ((0, L - n), (0, 0), (0, 0))) for _ in range(4)]
    rh_, ph = px.residual_df_norm_halo(
        *[parts(a, 1, 1, bi) for a in arrs], gi0(1), h, n, L, block_i=bi)
    re_, pe = px.residual_df_norm_ext(
        *[ext(a, 1) for a in arrs], gi0(1), h, n, L, block_i=bi)
    check("residual_df_norm_halo", rh_, re_)
    ok_n = float(ph) == float(pe)
    results["df_norm partial"] = ok_n
    print(f"  {'df_norm partial':30s} "
          f"{'OK' if ok_n else f'FAIL {float(ph)} != {float(pe)}'}",
          flush=True)

    # ---- 2D halo2d kernels (1-dev: j ext is zeros at the chain ends)
    sjl = sj  # whole j width local on the 1-dev mesh
    sje = sjl + 2 * px2.HJ

    def jext(x):
        return jnp.pad(x, ((0, 0), (px2.HJ, px2.HJ), (0, 0)))

    def parts2(x, kl, kr, tail_local):
        B = jext(x)
        zl = jnp.zeros((kl,) + B.shape[1:], B.dtype)
        zr = jnp.zeros((kr,) + B.shape[1:], B.dtype)
        rhc = jnp.concatenate([B[B.shape[0] - tail_local:], zr], axis=0) \
            if tail_local else zr
        return (B, zl, rhc)

    def gij0(halo):
        return jnp.asarray([-halo, -px2.HJ], jnp.int32)

    got = px2.rb_smooth_halo2d(parts2(ep, H, H, bi), parts2(rp, H, H, bi),
                               gij0(H), h, n_iter, n, L, sjl, True, bi)
    want = px2.rb_smooth_ext2d(jext(ext(ep, H)), jext(ext(rp, H)), gij0(H),
                               h, n_iter, n, L, sjl, True, bi)
    check("rb_smooth_halo2d(overlap)", got, want)

    skc = pk.padded_shape((n + 1) // 2)[2]
    got = px2.residual_restrict_halo2d(
        parts2(ep, 2, 1, 0), parts2(rp, 2, 1, 0), gij0(2), h, n, L // 2,
        sjl // 2, skc, block_i=4)
    want = px2.residual_restrict_ext2d(
        jext(ext(ep, 2)), jext(ext(rp, 2)), gij0(2), h, n, L // 2,
        sjl // 2, skc, block_i=4)
    check("residual_restrict_halo2d", got, want)

    ok = all(results.values())
    print(f"stage H: {'ALL OK' if ok else 'FAILURES'}", flush=True)
    return ok


def stage_e(levels=7, repeats=5, inner_cycles=4, block_i=8, trim=True):
    """Round 4: the 2D tier's 1x1-mesh distributed tax with the i-halo
    tier active (one j-ext copy instead of two concatenated copies).
    Both sides run the production k-TRIM layout by default."""
    from jax.sharding import Mesh

    from multigrid_parallel_tpu.cycles_padded import (
        make_on_device_df_solver, ref_init_norm, setup_df_problem,
    )
    from multigrid_parallel_tpu.parallel import sharded2d_padded as s2p

    hier = Hierarchy(ndim=3, coarse_n=5, num_levels=levels)
    n = hier.finest_n
    lab = "trim" if trim else "full"
    print(f"== stage E: 2D tier (i-halo-DMA, {lab}) vs single-chip, "
          f"1x1 mesh, {n}^3 ==", flush=True)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("x", "y"))
    cfg = CycleConfig(n_smooth=2)
    problem = poisson_3d_quadratic()
    init = ref_init_norm(problem, hier) if trim else None

    t0 = time.perf_counter()
    run, plan = s2p.make_sharded2d_padded_df_solver(
        hier, cfg, mesh, rel_tol=1e-8, inner_cycles=inner_cycles,
        block_i=block_i, trim=trim, init_norm=init,
    )
    st = s2p.setup_df_problem_sharded2d_padded(problem, hier, mesh, plan,
                                               trim=trim)
    if init is None:
        init = float(jnp.sqrt(jnp.sum(st[2].astype(jnp.float64) ** 2)))
    _, _, norm, n_outer = run(*st)
    norm, n_outer = float(norm), int(n_outer)
    print(f"  compile+first solve {time.perf_counter()-t0:.1f}s  "
          f"norm {norm:.3e}  n_outer {n_outer}  plan {plan}", flush=True)
    assert norm <= 1e-8 * init, (norm, init)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _, _, nd, od = run(*st)
        float(nd), int(od)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"  2d-sharded(1x1,halo,{lab}) wall: best {best:.4f}s  median "
          f"{sorted(times)[len(times)//2]:.4f}s "
          f"(times {['%.3f' % t for t in times]})", flush=True)

    run1 = make_on_device_df_solver(hier, cfg, rel_tol=1e-8,
                                    inner_cycles=inner_cycles,
                                    trim=trim, init_norm=init if trim
                                    else None)
    st1 = setup_df_problem(problem, hier, trim=trim)
    _, _, n1, o1 = run1(*st1)
    float(n1), int(o1)
    times1 = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _, _, nd, od = run1(*st1)
        float(nd), int(od)
        times1.append(time.perf_counter() - t0)
    best1 = min(times1)
    print(f"  single-chip({lab})    wall: best {best1:.4f}s", flush=True)
    print(f"  2D distributed tax at 1x1: {best/best1:.3f}x "
          f"(+{(best-best1)*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-a", action="store_true")
    ap.add_argument("--skip-b", action="store_true")
    ap.add_argument("--skip-c", action="store_true")
    ap.add_argument("--n-sharded", type=int, default=3)
    ap.add_argument("--stage-d", action="store_true")
    ap.add_argument("--stage-e", action="store_true")
    ap.add_argument("--stage-h", action="store_true")
    ap.add_argument("--levels", type=int, default=7)
    ap.add_argument("--block-i", type=int, default=8)
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          flush=True)
    ok = True
    if not args.skip_a:
        ok = stage_a()
    if not args.skip_c:
        ok = stage_c() and ok
    if not args.skip_b:
        stage_b(n_sharded=args.n_sharded)
    if args.stage_h:
        ok = stage_h() and ok
    if args.stage_d:
        stage_d(levels=args.levels, n_sharded=args.n_sharded,
                block_i=args.block_i)
    if args.stage_e:
        stage_e(levels=args.levels, block_i=args.block_i)
    sys.exit(0 if ok else 1)

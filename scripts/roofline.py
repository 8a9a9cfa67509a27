"""Roofline measurement for the fused smoothing kernels (real TPU).

Measures, on the padded 257^3 layout:
  * HBM streaming bandwidth (big-array copy, jnp);
  * the DMA floor of the pipelined stencil template (same slab/tile
    traffic as the RB stage, identity body);
  * VPU f32 throughput (chained FMA on a VMEM-resident block);
  * the fused RB stage at several block_i values;
  * per-point op/byte accounting -> roofline verdict.

All kernel timings chain CH calls inside one jit and block on a scalar
(axon's block_until_ready doesn't block; python->device dispatch costs
~0.5-1 ms, so single-kernel timings are noise — CLAUDE.md).

    python scripts/roofline.py [--n 257] [--reps 12] [--chain 8]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def timed(fn, reps):
    """best + median of reps calls of an already-jitted scalar-returning fn."""
    float(fn())  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[0], ts[len(ts) // 2]


def slope(make_run, c1, c2, reps):
    """Per-op time from two chain lengths: removes the host->device
    dispatch + scalar-readback latency (measured ~3 ms through the axon
    tunnel, which dwarfs ms-scale kernels — single-call timings are
    pure noise here)."""
    r1, _ = timed(make_run(c1), reps)
    r2, _ = timed(make_run(c2), reps)
    return (r2 - r1) / (c2 - c1), r1, r2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=257)
    ap.add_argument("--reps", type=int, default=12)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--block-i", type=int, nargs="+", default=[8, 16, 24])
    args = ap.parse_args()

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from multigrid_parallel_tpu.ops import pallas3d as pk

    n, ch = args.n, args.chain
    _, sj, sk = pk.padded_shape(n)
    plane = sj * sk * 4
    print(f"backend={jax.default_backend()}  n={n}  padded planes {sj}x{sk} "
          f"({plane / 2**20:.2f} MiB)  chain={ch}  reps={args.reps}")

    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (n, sj, sk), dtype=jnp.float32)
    f = jax.random.normal(jax.random.PRNGKey(1), (n, sj, sk), dtype=jnp.float32)
    h = 1.0 / (n - 1)
    # keep both chain lengths small: the tunnel compiler chokes on
    # many-kernel modules (a 16-chain pipelined-kernel jit hung >40 min)
    c1, c2 = ch, ch + 6

    # ---- 0. dispatch + readback latency ----
    tiny = jnp.zeros((8, 128), jnp.float32)
    latfn = jax.jit(lambda t: jnp.sum(t))
    lat, _ = timed(lambda: latfn(tiny), args.reps)
    print(f"sync latency:     {lat * 1e3:7.3f} ms (scalar readback round trip)")

    # ---- 1. HBM streaming bandwidth (jnp triad; full-array sum so XLA
    # cannot slice the chain away) ----
    def make_hbm(chain):
        @jax.jit
        def run(x):
            y = x
            for _ in range(chain):
                y = y * 1.0000001 + x  # depends on full x each step
            return jnp.sum(y)

        return lambda: run(u)

    per, r1, r2 = slope(make_hbm, c1, c2, args.reps)
    gbs = 2 * n * plane / per / 1e9
    print(f"hbm jnp triad:    {per * 1e3:7.3f} ms/pass  -> {gbs:6.1f} GB/s "
          f"(r+w; raw {r1 * 1e3:.1f}/{r2 * 1e3:.1f} ms)")

    # ---- 2. DMA floor: pipelined template, identity body ----
    def identity_stage(bi, chain):
        hh = 4  # same halo as the n_iter=2 RB stage
        si = bi + 2 * hh
        nb = pl.cdiv(n, bi)
        kern = pk._make_pipelined_kernel(
            n, si, sj, sk, bi, hh, nb, lambda eu, ef, i, p: eu
        )
        call = pk._pallas_stencil_call_pipelined(kern, n, si, sj, sk, bi,
                                                 jnp.float32)

        @jax.jit
        def run(x, y):
            out = x
            for _ in range(chain):
                out = call(out, y)
            return jnp.sum(out[:1])

        return lambda: run(u, f)

    for bi in args.block_i:
        per, r1, r2 = slope(lambda c: identity_stage(bi, c), c1, c2, args.reps)
        eff = 3 * n * plane / per / 1e9
        si = bi + 8
        act = (2 * si * pl.cdiv(n, bi) + n) * plane / per / 1e9
        print(f"dma floor bi={bi:2d}:  {per * 1e3:7.3f} ms/stage -> "
              f"{eff:6.1f} GB/s algorithmic, {act:6.1f} GB/s actual DMA")

    # ---- 3. VPU f32 throughput (chained FMA in VMEM) ----
    K = 2048
    vsj, vsk = 256, 1024  # 1 MiB block

    def vpu_kernel(a_ref, o_ref):
        y = a_ref[:]
        c = a_ref[0, 0]
        for _ in range(K):
            y = y * c + 1.0
        o_ref[:] = y

    vcall = pl.pallas_call(
        vpu_kernel,
        out_shape=jax.ShapeDtypeStruct((vsj, vsk), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=pk._interpret(),
    )
    a = jax.random.normal(key, (vsj, vsk), dtype=jnp.float32) * 1e-3

    def make_vpu(chain):
        @jax.jit
        def run(a):
            with jax.enable_x64(False):
                y = a
                for _ in range(chain):
                    y = vcall(y)
                return jnp.sum(y[:1])

        return lambda: run(a)

    per, r1, r2 = slope(make_vpu, c1, c2, args.reps)
    tflops = vsj * vsk * K * 2 / per / 1e12
    print(f"vpu fma chain:    {per * 1e3:7.3f} ms/call  -> {tflops:6.2f} "
          "TFLOP/s f32 (2 ops/FMA)")

    # ---- 4. fused RB stage (n_iter=2 -> 4 half-sweeps) ----
    for bi in args.block_i:
        def make_rb(chain, bi=bi):
            @jax.jit
            def run(x, y):
                out = x
                for _ in range(chain):
                    out = pk.rb_smooth_fused_pipelined(
                        out, y, h, 2, n, red_first=True, block_i=bi
                    )
                return jnp.sum(out[:1])

            return lambda: run(u, f)

        per, r1, r2 = slope(make_rb, c1, c2, args.reps)
        eff = 3 * n * plane / per / 1e9
        # op accounting (body ops over computed region):
        # per half-sweep per computed point: 5 add + 4 roll-lane-ops
        # + 1 sub + 1 mul + 1 select = 12 VPU ops (mask gen hoisted)
        si = bi + 8
        nb = pl.cdiv(n, bi)
        pts = nb * (si - 2) * sj * sk          # computed pts per half-sweep
        gops = 4 * pts * 12 / per / 1e9
        print(f"rb stage bi={bi:2d}:   {per * 1e3:7.3f} ms/stage -> "
              f"{eff:6.1f} GB/s algorithmic, {gops:7.1f} Gop/s VPU "
              f"(raw {r1 * 1e3:.1f}/{r2 * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()

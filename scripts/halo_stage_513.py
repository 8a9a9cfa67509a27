"""Per-stage finest-level (513) comparison: single-chip fused kernels
vs the sharded halo-DMA kernels on identical trim-layout data (1-dev,
chain-slope timing)."""
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from multigrid_parallel_tpu import Hierarchy, poisson_3d_quadratic
from multigrid_parallel_tpu import cycles_padded as cp
from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import pallas_sharded as px
from multigrid_parallel_tpu.parallel import sharded_padded as sp


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def slope(fn, args, n1=2, n2=6):
    def make(reps):
        @jax.jit
        def go(*a):
            out = a[0]
            for _ in range(reps):
                out = fn(out, *a[1:])
            return out
        return go

    g1, g2 = make(n1), make(n2)
    sync(g1(*args)); sync(g2(*args))
    ts = []
    for g in (g1, g2):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            sync(g(*args))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (n2 - n1)


hier = Hierarchy(ndim=3, coarse_n=5, num_levels=8)
n = hier.finest_n
h = hier.spacing(hier.num_levels - 1)
problem = poisson_3d_quadratic()
u_hi, u_lo, f_hi, f_lo = cp.setup_df_problem(problem, hier, trim=True)
r = f_hi
e0 = jnp.zeros_like(r)
_, sj, sk = r.shape
n_iter = 2
H = 2 * n_iter
L = -(-n // 8) * 8  # 520

print(f"== per-stage at {n}^3 trim (sj={sj}, sk={sk}, L={L}) ==", flush=True)

# pad to L planes for the sharded kernels
def padL(x):
    return jnp.pad(x, ((0, L - x.shape[0]), (0, 0), (0, 0)))

rp, ep = padL(r), padL(e0)

# ---- smoother stage
bi1 = pk._auto_block_i(n, sj, sk, H, 4, True, 16)
t = slope(lambda e, rr: pk.rb_smooth_fused_pipelined(e, rr, h, n_iter, n,
                                                     red_first=True,
                                                     block_i=bi1),
          (r[:n], r[:n]))
print(f"  smoother single-chip (bi={bi1})   : {t*1e3:7.2f} ms", flush=True)

bi2 = px.ext_block_i(L, sj, sk, H, 2, requested=16)
bi2h = sp._halo_bi(bi2, L, H)
def parts(x, kl, kr, tl):
    zl = jnp.zeros((kl,) + x.shape[1:], x.dtype)
    zr = jnp.zeros((kr,) + x.shape[1:], x.dtype)
    rhc = jnp.concatenate([x[x.shape[0]-tl:], zr], 0) if tl else zr
    return (x, zl, rhc)
g = jnp.asarray([-H], jnp.int32)
t = slope(lambda e, rr: px.rb_smooth_halo(parts(e, H, H, bi2h),
                                          parts(rr, H, H, bi2h), g, h,
                                          n_iter, n, L, True, bi2h),
          (rp, rp))
print(f"  smoother sharded-halo (bi={bi2h}) : {t*1e3:7.2f} ms", flush=True)

# ---- residual + restrict
bi3 = pk.rr_fused_block_i(n, sj, sk)
t = slope(lambda e, rr: pk.residual_restrict_fused_padded(e, rr, h, n,
                                                          block_i=bi3),
          (r[:n], r[:n]))
print(f"  resid+restrict single (bi={bi3})  : {t*1e3:7.2f} ms", flush=True)

bi4 = px.restrict_ext_block_i(L // 2, sj, sk, requested=16)
bi4h = sp._halo_bi(bi4, L // 2, 1)
g2 = jnp.asarray([-2], jnp.int32)
t = slope(lambda e, rr: px.residual_restrict_halo(
    parts(e, 2, 1, 0), parts(rr, 2, 1, 0), g2, h, n, L // 2, bi4h),
          (rp, rp))
print(f"  resid+restrict halo (bi={bi4h})   : {t*1e3:7.2f} ms", flush=True)

# ---- prolong + correct + post-smooth
nc = (n + 1) // 2
_, sjc, _ = pk.padded_shape(nc)
skc = pk.coarse_k_width(n, sk)
ec = jnp.zeros((L // 2, sjc, skc), jnp.float32)
bi5 = pk.ps_fused_block_i(n, sj, sk, n_iter)
t = slope(lambda e, eec, rr: pk.prolong_smooth_fused_padded(
    eec, e, rr, h, n_iter, n, block_i=bi5),
          (r[:n], jnp.zeros((nc, sjc, skc), jnp.float32), r[:n]))
print(f"  prolong+smooth single (bi={bi5})  : {t*1e3:7.2f} ms", flush=True)

bi6 = px.prolong_ext_block_i(L, sj, sk, n_iter, requested=16)
bi6h = sp._halo_bi(bi6, L, H + 2)
gH = jnp.asarray([-H], jnp.int32)
t = slope(lambda e, eec, rr: px.prolong_smooth_halo(
    parts(eec, n_iter, n_iter + 1, bi6h // 2), parts(e, H, H, bi6h),
    parts(rr, H, H, bi6h), gH, h, n_iter, n, L, block_i=bi6h),
          (rp, ec, rp))
print(f"  prolong+smooth halo (bi={bi6h})   : {t*1e3:7.2f} ms", flush=True)

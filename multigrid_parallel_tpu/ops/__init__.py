"""Pure compute ops: jnp reference implementations and Pallas TPU kernels.

Two implementations of every hot op, same semantics:

  * ``stencils_3d`` / ``stencils_1d`` — pure jnp, the always-on correctness
    oracle (runs everywhere, f64-capable, trivially differentiable).
  * ``pallas3d`` — fused Pallas TPU kernels for the memory-bound sweeps.

Kernel-level tests assert the two agree (tests/test_pallas_ops.py), the
TPU analogue of the reference's 1..8-thread invariance check
(red_black_gs_scalability.txt).
"""

"""Layout experiment: N-major (transposed-storage) w8a8 matmul kernels.

The shipped w8a8 kernel stores weights [K, N]; for gate_up (K=3584,
N=37888, per-column scales) the largest VMEM-fitting tile is [3584, 1024],
whose DMA reads 3584 separate 1 KB row segments (stride 37888) — suspected
cause of the measured ~605 GB/s vs the ~819 GB/s HBM peak.  Storing the
weight [N, K] makes a [BN, K] tile FULLY CONTIGUOUS.  This probe measures:

  base : shipped [K, N] kernel (_w8a8_matmul)
  nmB  : [N, K] tile, dot_general(x, w) contracting (1,1)  -> out [M, BN]
  nmA  : [N, K] tile, dot(w, x^T) -> [BN, M], transpose in kernel
  nmC  : [N, K] tile, dot(w, x^T) -> out stored [N, M], no transpose

    python tools/nmajor_probe.py [M] [K] [N]
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tools.kernel_probe import loop_time


def main() -> None:
    # probes compile the same graphs the engine does: reuse its
    # persistent compile cache so re-runs skip the minutes-long build
    from caesar_tpu.engine.engine import _enable_persistent_compile_cache
    _enable_persistent_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 3584
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 37888

    key = jax.random.PRNGKey(0)
    xq = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
    qw_kn = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
    qw_nk = jax.random.randint(key, (n, k), -127, 127, jnp.int8)
    s_col = jnp.full((1, n), 0.01, jnp.bfloat16)  # per-column
    s_row = jnp.full((n, 1), 0.01, jnp.bfloat16)
    gb = n * k / 1e9

    def bench(name, fn, x0, extras):
        t_big = loop_time(fn, x0, 200, extras)
        t_small = loop_time(fn, x0, 20, extras)
        ms = (t_big - t_small) / 180 * 1e3
        print(f"  {name:34s} {ms:8.4f} ms   {gb / (ms / 1e3):7.1f} GB/s")
        return ms

    # ---- base: shipped kernel ------------------------------------------
    from caesar_tpu.ops.quant_matmul import _pick_tiles_w8a8, _w8a8_matmul

    tiles = _pick_tiles_w8a8(m, k, n, k)  # per-column: group == k
    print(f"shapes: x[{m},{k}] w[{k},{n}]; base tiles {tiles}")

    def base_step(x, w, s):
        out = _w8a8_matmul(x, w, s, k, k, n, tiles[0], tiles[1], False)
        return x + out[:, :1].astype(jnp.int8) * 0

    bench("base [K,N] kernel", base_step, xq, (qw_kn, s_col))

    # ---- nmajor variants ------------------------------------------------
    def pick_bn(limit_mb=8.0):
        best = None
        for bn in range(32, n + 1, 32):
            if n % bn:
                continue
            if 2 * bn * k <= limit_mb * 1024 * 1024:
                best = bn
        return best

    bn = pick_bn()
    print(f"nmajor bn = {bn} (tile {bn * k / 1e6:.2f} MB, {n // bn} steps)")

    def nmB_kernel(xq_ref, qw_ref, s_ref, out_ref):
        ig = jax.lax.dot_general(
            xq_ref[:], qw_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [M, BN]
        # s block is [BN, 1]: transpose to a [1, BN] row so every output
        # column gets ITS scale (s_ref[0, :] would broadcast column 0's)
        out_ref[:] = ig.astype(jnp.float32) * s_ref[:, 0].astype(jnp.float32)[None, :]

    @functools.partial(jax.jit, static_argnames=())
    def nmB(x, w, s):
        return pl.pallas_call(
            nmB_kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            grid=(n // bn,),
            in_specs=[
                pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (m, bn), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * m * n * k, bytes_accessed=n * k, transcendentals=0
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
        )(x, w, s)

    def nmB_step(x, w, s):
        out = nmB(x, w, s)
        return x + out[:, :1].astype(jnp.int8) * 0

    bench("nmB [N,K] dot_general (1,1)", nmB_step, xq, (qw_nk, s_row))

    def nmA_kernel(xt_ref, qw_ref, s_ref, out_ref):
        ig = jnp.dot(qw_ref[:], xt_ref[:], preferred_element_type=jnp.int32)
        out_ref[:] = (ig.astype(jnp.float32) * s_ref[:].astype(jnp.float32)).T

    @functools.partial(jax.jit, static_argnames=())
    def nmA(xt, w, s):
        return pl.pallas_call(
            nmA_kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            grid=(n // bn,),
            in_specs=[
                pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (m, bn), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * m * n * k, bytes_accessed=n * k, transcendentals=0
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
        )(xt, w, s)

    xt = xq.T

    def nmA_step(x, w, s):
        out = nmA(x, w, s)
        return x + out[:1, :].astype(jnp.int8).T * 0

    bench("nmA [N,K] dot + in-kernel T", nmA_step, xt, (qw_nk, s_row))

    def nmC_kernel(xt_ref, qw_ref, s_ref, out_ref):
        ig = jnp.dot(qw_ref[:], xt_ref[:], preferred_element_type=jnp.int32)
        out_ref[:] = ig.astype(jnp.float32) * s_ref[:].astype(jnp.float32)

    @functools.partial(jax.jit, static_argnames=())
    def nmC(xt, w, s):
        return pl.pallas_call(
            nmC_kernel,
            out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
            grid=(n // bn,),
            in_specs=[
                pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bn, m), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * m * n * k, bytes_accessed=n * k, transcendentals=0
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
        )(xt, w, s)

    def nmC_step(xt_, w, s):
        out = nmC(xt_, w, s)  # [N, M] — consumer would transpose
        return xt_ + out[:1, :].astype(jnp.int8) * 0

    bench("nmC [N,K] dot, out [N,M]", nmC_step, xt, (qw_nk, s_row))


if __name__ == "__main__":
    main()

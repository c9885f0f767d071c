"""A/B probe for the w8a8 decode-MLP roofline (round-5 VERDICT item 1).

The w8a8 MLP kernel measured ~610 GB/s of weight bytes (9.30 of the
15.10 ms step) against the v5e's ~819 GB/s HBM.  Hypotheses:

  H1 (DMA geometry): weight tiles are column slices of the [K, N] array —
     a [bk, bn] block reads bn contiguous bytes per 32-row int8 tile-row,
     so HBM sees strided bursts.  A SUPERTILE layout [N/bn, K, bn] makes
     every grid step's weight DMA one contiguous bk*bn-byte stream.
  H2 (fixed step cost): too few bytes per grid step.
  H3 (VPU epilogue): the per-column rescale + per-token xs multiply and
     the silu/quantize glue between the two matmuls.

Measures, for gate_up [3584, 37888] and down [18944, 3584] at decode M:

  v0  current quant_matmul_pallas (baseline)
  v1  DMA-only kernel, current layout + geometry  (geometry ceiling)
  v2  supertile-layout dot kernel                  (H1 fix)
  v3  DMA-only on supertile layout                 (absolute ceiling)

    python tools/mlp_roofline_probe.py [M] [which]
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tools.kernel_probe import loop_time


def _mk_probe():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary")
    )

    # ---- v1: DMA-only, current [K, N] layout ------------------------
    def _dma_kernel(qw_ref, out_ref):
        k_idx = pl.program_id(1)

        @pl.when(k_idx == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # touch one row so the block DMA cannot be elided; no MXU work
        out_ref[:] += qw_ref[:1, :].astype(jnp.float32)

    @functools.partial(jax.jit, static_argnames=("bk", "bn"))
    def dma_only(qw, bk, bn):
        k, n = qw.shape
        return pl.pallas_call(
            _dma_kernel,
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
            grid=(n // bn, k // bk),
            in_specs=[
                pl.BlockSpec((bk, bn), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bn), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            compiler_params=params,
        )(qw)

    # ---- v2: supertile [N/bn, K, bn] dot kernel ---------------------
    def _st_kernel(xq_ref, qw_ref, s_ref, out_ref, acc_ref):
        k_idx = pl.program_id(1)

        @pl.when(k_idx == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            xq_ref[:], qw_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

        @pl.when(k_idx == pl.num_programs(1) - 1)
        def _():
            ws = s_ref[0, 0, :].astype(jnp.float32)[None, :]
            out_ref[:] = acc_ref[:].astype(jnp.float32) * ws

    @functools.partial(jax.jit, static_argnames=("bk", "bn"))
    def st_matmul(xq, qw_t, scales, bk, bn):
        # qw_t: [N/bn, K, bn]; scales [1, N]
        nslab, k, _ = qw_t.shape
        n = nslab * bn
        m = xq.shape[0]
        return pl.pallas_call(
            _st_kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            grid=(nslab, k // bk),
            in_specs=[
                pl.BlockSpec((m, bk), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, bn), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bn), lambda i, j: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, bn), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((m, bn), jnp.int32)],
            compiler_params=params,
        )(xq, qw_t, scales.reshape(1, 1, n))

    # ---- v3: DMA-only on supertile layout ---------------------------
    def _st_dma_kernel(qw_ref, out_ref):
        k_idx = pl.program_id(1)

        @pl.when(k_idx == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += qw_ref[0, :1, :].astype(jnp.float32)

    @functools.partial(jax.jit, static_argnames=("bk", "bn"))
    def st_dma_only(qw_t, bk, bn):
        nslab, k, _ = qw_t.shape
        n = nslab * bn
        return pl.pallas_call(
            _st_dma_kernel,
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
            grid=(nslab, k // bk),
            in_specs=[
                pl.BlockSpec((1, bk, bn), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bn), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            compiler_params=params,
        )(qw_t)

    return dma_only, st_matmul, st_dma_only


def main() -> None:
    import jax
    import jax.numpy as jnp

    from caesar_tpu.engine.quant import quantize_weight
    from caesar_tpu.ops.quant_matmul import (
        _pick_tiles_w8a8,
        quant_matmul_pallas,
    )

    m_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    m_pad = m_tokens + (-m_tokens % 32)

    dma_only, st_matmul, st_dma_only = _mk_probe()
    rng = np.random.default_rng(0)

    shapes = [("gate_up", 3584, 37888), ("down", 18944, 3584)]
    for name, k, n in shapes:
        w = rng.standard_normal((k, n), np.float32) * 0.02
        q = quantize_weight(w, bits=8, group=0, act="int8")
        qbytes = q.qweight.size
        x0 = jnp.asarray(
            rng.standard_normal((m_tokens, k), np.float32) * 0.1,
            jnp.bfloat16,
        )
        tiles = _pick_tiles_w8a8(m_pad, k, n, k)
        print(f"{name} [{k}x{n}] picked tiles (bk, bn) = {tiles}",
              flush=True)
        bk, bn = tiles

        def run(label, step, x0, extras=()):
            iters = int(os.environ.get('PROBE_ITERS', '600'))
            t_big = loop_time(step, x0, iters, extras)
            t_small = loop_time(step, x0, iters // 10, extras)
            ms = (t_big - t_small) / (iters - iters // 10) * 1e3
            print(f"  {label:34s} {ms:8.4f} ms  "
                  f"({qbytes / (ms / 1e3) / 1e9:7.1f} GB/s)", flush=True)
            return ms

        if which in ("all", "v0"):
            def v0(x, q=q):
                out = quant_matmul_pallas(x, q)
                return x + out[:, :1].astype(jnp.bfloat16) * 0.0

            run("v0 current kernel", v0, x0)

        if which in ("all", "v1"):
            def v1(x, qw):
                out = dma_only(qw, bk, bn)
                return x + out[:1, :1].astype(jnp.bfloat16) * 0.0

            run(f"v1 dma-only cur layout {bk}x{bn}", v1, x0,
                extras=(q.qweight,))

        # supertile variants: try the SAME (bk, bn) plus full-K slabs
        qw_np = np.asarray(q.qweight)
        xq0 = jnp.asarray(
            np.clip(rng.standard_normal((m_pad, k)) * 20, -127, 127),
            jnp.int8,
        )
        scales = jnp.asarray(np.asarray(q.scales, np.float32))

        geoms = {(bk, bn)}
        # full-K slabs at feasible widths (VMEM: 2*k*bnn + m*bnn*8 <= ~12MB)
        for bnn in (512, 1024, 2048):
            if n % bnn == 0 and 2 * k * bnn + m_pad * bnn * 8 < 12 * 2**20:
                geoms.add((k, bnn))
        for g_bk, g_bn in sorted(geoms):
            # [N/bn, K, bn] supertile layout (host-side rearrange)
            qt = np.ascontiguousarray(
                qw_np.reshape(k, n // g_bn, g_bn).transpose(1, 0, 2)
            )
            qt_d = jnp.asarray(qt)

            if which in ("all", "v2"):
                def v2(x, qt_d, scales):
                    out = st_matmul(x, qt_d, scales, g_bk, g_bn)
                    return x + out[:, :1].astype(jnp.int8) * 0

                run(f"v2 supertile dot {g_bk}x{g_bn}", v2, xq0,
                    extras=(qt_d, scales))
            if which in ("all", "v3"):
                def v3(x, qt_d):
                    out = st_dma_only(qt_d, g_bk, g_bn)
                    return x + out[:1, :1].astype(jnp.int8) * 0

                run(f"v3 dma-only supertile {g_bk}x{g_bn}", v3, xq0,
                    extras=(qt_d,))


if __name__ == "__main__":
    main()

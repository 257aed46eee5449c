"""Pallas TPU kernel: weight-only int8 matmul with in-VMEM dequantization.

Single-stream LLM decode is HBM-bandwidth-bound on weight streaming.  A
plain XLA ``x @ w_int8.astype(bf16) * scale`` materialises the bf16 copy and
is *slower* than bf16 (measured); this kernel streams int8 tiles HBM->VMEM
and dequantises in registers right before the MXU, so each weight byte
crosses HBM once at half the bf16 width.

    y (M, D) bf16  @  w (D, O) int8 [per-out-channel scale (O,) f32]
      -> (M, O) bf16

Used by the quantized decode path (models/quant.py) for qkv/o/gate/up/down
and lm_head.  Falls back to the jnp reference off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmm_kernel(y_ref, w_ref, s_ref, o_ref, *, out_dtype):
    w = w_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(
        y_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )
    o_ref[:] = (acc * s_ref[0][None, :].astype(jnp.float32)).astype(out_dtype)


def quantized_matmul(
    y: jnp.ndarray,  # (M, D)
    w_q: jnp.ndarray,  # (D, O) int8
    scale: jnp.ndarray,  # (O,) f32
    tile_o: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    M, D = y.shape
    D2, O = w_q.shape
    assert D == D2
    if tile_o == 0:
        # keep the double-buffered weight tile within scoped VMEM:
        # D * tile_o int8 (+ its bf16 dequant copy) must fit ~16 MB with
        # the y/out tiles; ~4 MB per weight tile is safe for D up to 16k
        tile_o = max(128, min(512, (4 * 1024 * 1024 // D) // 128 * 128))
        while O % tile_o != 0 and tile_o > 128:
            tile_o -= 128
    assert O % tile_o == 0, (O, tile_o)
    # M tiling: the activation tile (tile_m, D) bf16 must also fit VMEM
    # alongside the double-buffered weight tile (large-M prefill batches).
    # Never pad small decode batches up to the tile budget.
    m8 = max(8, ((M + 7) // 8) * 8)
    budget = max(8, min(256, (4 * 1024 * 1024 // (2 * D)) // 8 * 8))
    if m8 <= budget:
        tile_m = m8
    else:
        tile_m = next(
            (t for t in (256, 192, 128, 96, 64, 32, 16, 8)
             if t <= budget and m8 % t == 0),
            min(128, budget),
        )
    Mp = ((M + tile_m - 1) // tile_m) * tile_m
    if Mp != M:
        y = jnp.pad(y, ((0, Mp - M), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, out_dtype=y.dtype),
        grid=(Mp // tile_m, O // tile_o),
        in_specs=[
            pl.BlockSpec(
                (tile_m, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (D, tile_o), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            # scale passed as (1, O): 1-D operands hit XLA/Mosaic layout
            # tiling mismatches
            pl.BlockSpec(
                (1, tile_o), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_o), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, O), y.dtype),
        interpret=interpret,
    )(y, w_q, scale[None, :])
    return out[:M]


def _qmm_i8_kernel(ys_ref, y_ref, w_ref, s_ref, o_ref, *, out_dtype):
    # int8 x int8 -> int32 natively on the MXU (v5e+: 2x bf16 throughput);
    # no VPU dequant of the weight tile at all — the tile goes HBM -> VMEM
    # -> MXU untouched, so the kernel is pure DMA + matmul.
    acc = jnp.dot(y_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = (
        acc.astype(jnp.float32)
        * ys_ref[:].astype(jnp.float32)
        * s_ref[0][None, :].astype(jnp.float32)
    ).astype(out_dtype)


def quantize_activation(y: jnp.ndarray):
    """Symmetric per-row int8 quantization of (M, D) activations.
    Returns (y_q int8 (M, D), scale f32 (M, 1))."""
    amax = jnp.max(jnp.abs(y.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    y_q = jnp.clip(
        jnp.round(y.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)
    return y_q, scale


def quantized_matmul_w8a8(
    y: jnp.ndarray,  # (M, D) bf16/f32
    w_q: jnp.ndarray,  # (D, O) int8
    scale: jnp.ndarray,  # (O,) f32
    tile_o: int = 0,
    interpret: bool = False,
    out_dtype=None,
) -> jnp.ndarray:
    """W8A8 matmul: per-row activation quant + per-out-channel weight quant,
    int8 MXU accumulation in int32, rescale to ``out_dtype``.

    STATUS: kept as a measured-and-rejected alternative, not on the
    production path — models/quant.mm routes W8A8 through a plain XLA
    ``dot_general`` instead, because at decode shapes the fixed per-call
    Pallas cost across 7 projections x 32 layers dominated (see the
    optimization log in ARCHITECTURE.md).  Retained with its tests for
    shapes where a fused kernel may win again (very wide single matmuls).

    Removes the in-kernel int8->bf16 weight convert of
    :func:`quantized_matmul`, which is VPU-bound at very wide outputs
    (the 128k lm_head) — there the convert cost exceeded the bandwidth
    saving and bf16 won; this path restores the 2x byte saving."""
    out_dtype = out_dtype or y.dtype
    M, D = y.shape
    D2, O = w_q.shape
    assert D == D2
    y_q, y_s = quantize_activation(y)
    if tile_o == 0:
        # int8 tile only (no bf16 copy) -> a larger tile fits VMEM
        tile_o = max(128, min(1024, (6 * 1024 * 1024 // D) // 128 * 128))
        while O % tile_o != 0 and tile_o > 128:
            tile_o -= 128
    assert O % tile_o == 0, (O, tile_o)
    m8 = max(8, ((M + 7) // 8) * 8)
    budget = max(8, min(256, (4 * 1024 * 1024 // D) // 8 * 8))
    if m8 <= budget:
        tile_m = m8
    else:
        tile_m = next(
            (t for t in (256, 192, 128, 96, 64, 32, 16, 8)
             if t <= budget and m8 % t == 0),
            min(128, budget),
        )
    Mp = ((M + tile_m - 1) // tile_m) * tile_m
    if Mp != M:
        y_q = jnp.pad(y_q, ((0, Mp - M), (0, 0)))
        y_s = jnp.pad(y_s, ((0, Mp - M), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_qmm_i8_kernel, out_dtype=out_dtype),
        grid=(Mp // tile_m, O // tile_o),
        in_specs=[
            pl.BlockSpec(
                (tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_m, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (D, tile_o), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_o), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_o), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, O), out_dtype),
        interpret=interpret,
    )(y_s, y_q, w_q, scale[None, :])
    return out[:M]


def _qmm_i8_grouped_kernel(ys_ref, y_ref, w_ref, s_ref, o_ref):
    # grouped W8A8: K is tiled into G groups of ``gs`` with per-(group,
    # out-channel) weight scales and per-(row, group) activation scales.
    # The G axis is the INNERMOST grid dim, so the f32 output tile stays
    # resident in VMEM across all G partial dots — the (M, G, O) int32
    # intermediate that the XLA einsum lowering round-trips through HBM
    # (G x the output traffic; +13.6% decode RTF at 8B) never exists.
    # ys/s arrive with their full G axis (Pallas TPU forbids size-1
    # blocks on a >1 dim) and are sliced at the current group.
    g = pl.program_id(2)

    @pl.when(g == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    # select group g by masked reduction (dynamic_slice is not lowerable
    # in Pallas TPU); cost is a tiny VPU pass vs the int8 MXU dot
    ys = ys_ref[:]
    ys_g = jnp.sum(
        ys * (jax.lax.broadcasted_iota(jnp.int32, ys.shape, 1) == g),
        axis=1, keepdims=True,
    )  # (tile_m, 1)
    s = s_ref[:]
    s_g = jnp.sum(
        s * (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) == g),
        axis=0, keepdims=True,
    )  # (1, tile_o)
    acc = jnp.dot(y_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] += (
        acc.astype(jnp.float32)
        * ys_g.astype(jnp.float32)
        * s_g.astype(jnp.float32)
    )


def quantize_activation_grouped(y: jnp.ndarray, gs: int):
    """Symmetric per-(row, group) int8 quantization of (M, D) activations.
    Returns (y_q int8 (M, D), scale f32 (M, D//gs))."""
    M, D = y.shape
    yg = y.reshape(M, D // gs, gs).astype(jnp.float32)
    amax = jnp.max(jnp.abs(yg), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)  # (M, G)
    y_q = jnp.clip(
        jnp.round(yg / scale[..., None]), -127, 127
    ).astype(jnp.int8).reshape(M, D)
    return y_q, scale


def quantized_matmul_w8a8_grouped(
    y: jnp.ndarray,  # (M, D) bf16/f32
    w_q: jnp.ndarray,  # (D, O) int8
    scale: jnp.ndarray,  # (G, O) f32, G = D // gs
    tile_o: int = 0,
    interpret: bool = False,
    out_dtype=None,
) -> jnp.ndarray:
    """Grouped W8A8 matmul (quality-belt quantization, models/quant.mm):
    per-(group, out-channel) weight scales, per-(row, group) activation
    scales, int8 MXU accumulation per group, f32 rescale-accumulate fused
    in VMEM.  Weights stream HBM->VMEM->MXU once, untouched."""
    out_dtype = out_dtype or y.dtype
    M, D = y.shape
    D2, O = w_q.shape
    G = scale.shape[0]
    assert D == D2 and D % G == 0
    gs = D // G
    y_q, y_s = quantize_activation_grouped(y, gs)
    if tile_o == 0:
        tile_o = max(128, min(1024, (6 * 1024 * 1024 // gs) // 128 * 128))
        while O % tile_o != 0 and tile_o > 128:
            tile_o -= 128
    assert O % tile_o == 0, (O, tile_o)
    m8 = max(8, ((M + 7) // 8) * 8)
    budget = max(8, min(256, (4 * 1024 * 1024 // D) // 8 * 8))
    if m8 <= budget:
        tile_m = m8
    else:
        tile_m = next(
            (t for t in (256, 192, 128, 96, 64, 32, 16, 8)
             if t <= budget and m8 % t == 0),
            min(128, budget),
        )
    Mp = ((M + tile_m - 1) // tile_m) * tile_m
    if Mp != M:
        y_q = jnp.pad(y_q, ((0, Mp - M), (0, 0)))
        y_s = jnp.pad(y_s, ((0, Mp - M), (0, 0)))

    out = pl.pallas_call(
        _qmm_i8_grouped_kernel,
        grid=(Mp // tile_m, O // tile_o, G),
        in_specs=[
            pl.BlockSpec(
                (tile_m, G), lambda i, j, g: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_m, gs), lambda i, j, g: (i, g),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (gs, tile_o), lambda i, j, g: (g, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G, tile_o), lambda i, j, g: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_o), lambda i, j, g: (i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, O), jnp.float32),
        interpret=interpret,
    )(y_s, y_q, w_q, scale)
    return out[:M].astype(out_dtype)


def quantized_matmul_w8a8_grouped_reference(y, w_q, scale, out_dtype=None):
    M, D = y.shape
    G, O = scale.shape
    gs = D // G
    y_q, y_s = quantize_activation_grouped(y, gs)
    acc = jnp.einsum(
        "mgk,gko->mgo",
        y_q.reshape(M, G, gs).astype(jnp.int32),
        w_q.reshape(G, gs, O).astype(jnp.int32),
    )
    out = (acc.astype(jnp.float32) * y_s[..., None] * scale[None]).sum(1)
    return out.astype(out_dtype or y.dtype)


def quantized_matmul_w8a8_reference(y, w_q, scale, out_dtype=None):
    y_q, y_s = quantize_activation(y)
    acc = y_q.astype(jnp.int32) @ w_q.astype(jnp.int32)
    return (acc.astype(jnp.float32) * y_s * scale[None, :]).astype(
        out_dtype or y.dtype
    )


def quantize_weight(w: jnp.ndarray, axis: int = 0):
    """Symmetric per-out-channel int8 quantization of (…, in, out) weights.
    Returns (w_q int8, scale f32 over the out axis)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return w_q, jnp.squeeze(scale, axis=axis)


def quantized_matmul_reference(y, w_q, scale):
    return (
        (y.astype(jnp.float32) @ w_q.astype(jnp.float32)) * scale[None, :]
    ).astype(y.dtype)

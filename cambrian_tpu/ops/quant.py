"""Weight-only int8/int4 quantization + fused Pallas dequant-matmuls.

The reference loads 4/8-bit weights through bitsandbytes CUDA kernels
(model/builder.py:35-44, train_fsdp.py:1455-1471); the TPU-native equivalent
(SURVEY.md §2.9) keeps weights in HBM as int8 — or int4 nibble-packed two per
int8 byte — and dequantizes inside the matmul kernel, halving (int8) or
quartering (int4) the weight HBM traffic that decode-time GEMMs are bound by.

int8: per-output-channel symmetric scales (bnb load_in_8bit counterpart).
int4: K-groupwise symmetric scales (group=128 rows per scale, the accuracy
mechanism bnb's nf4 gets from 64-element blocks; model/builder.py:35-44) with
in-kernel nibble unpack (shift/sign-extend on the VPU).

Kernels: grid over (M blocks, N blocks, K blocks), K innermost with an fp32
VMEM accumulator; weight tiles are DMA'd to VMEM, widened in-register, and
matmul'd on the MXU.
"""

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _under_multidevice_mesh() -> bool:
    """True when tracing under a >1-device mesh (jax.set_mesh): Mosaic
    kernels cannot be auto-partitioned by GSPMD there, and unlike attention
    (batch/head-parallel) a weight-stationary matmul kernel would need
    sharding-aware K/N blocking — the XLA dequant matmul partitions freely
    instead (the convert fuses into the dot's operand read on TPU)."""
    mesh = jax.sharding.get_abstract_mesh()
    return (not mesh.empty) and mesh.size > 1


def quantize_int8(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[K, N] float -> (int8 values [K, N], fp32 scales [N]) symmetric
    per-output-channel."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=0)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_int8(q: jnp.ndarray, scale: jnp.ndarray,
                    dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def _q_matmul_kernel(x_ref, w_ref, scale_ref, o_ref, acc_ref, *, k_blocks):
    """One (m, n, k) grid cell; K iterates innermost so the fp32 VMEM
    accumulator stays resident per output tile. K-blocking keeps the tiles
    inside scoped VMEM at LLM widths (K=14336 whole-K tiles measured 21.6 MB
    > the 16 MB limit at 8B prefill shapes)."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0]                        # [bm, bk]
    w = w_ref[0].astype(x.dtype)        # [bk, bn] int8 -> compute dtype
    acc_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )

    @pl.when(kb == k_blocks - 1)
    def _write():
        o_ref[0] = (acc_ref[...] * scale_ref[0]).astype(o_ref.dtype)


def _round_up(v, m):
    return (v + m - 1) // m * m


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
                block_m: int = 256, block_n: int = 512) -> jnp.ndarray:
    """x [M, K] (bf16/f32) @ dequant(w_q [K, N], scale [N]) -> [M, N] x.dtype.

    Falls back to XLA dequant+matmul off TPU.
    """
    m, k = x.shape
    _, n = w_q.shape
    if jax.devices()[0].platform != "tpu" or _under_multidevice_mesh():
        return (x @ dequantize_int8(w_q, scale, x.dtype)).astype(x.dtype)

    m_pad = _round_up(m, block_m)
    n_pad = _round_up(n, block_n)
    block_k = _pick_block_k(k, 128)
    k_pad = _round_up(k, block_k)
    k_blocks = k_pad // block_k
    xp = jnp.pad(x, ((0, m_pad - m), (0, k_pad - k)))[None]
    wp = jnp.pad(w_q, ((0, k_pad - k), (0, n_pad - n)))[None]
    sp = jnp.pad(scale.astype(jnp.float32), (0, n_pad - n))[None, None]

    import functools

    grid = (m_pad // block_m, n_pad // block_n, k_blocks)
    out = pl.pallas_call(
        functools.partial(_q_matmul_kernel, k_blocks=k_blocks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_m, block_k), lambda i, j, kb: (0, i, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, block_n), lambda i, j, kb: (0, kb, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_n), lambda i, j, kb: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_m, block_n),
                               lambda i, j, kb: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m_pad, n_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k_pad,
            bytes_accessed=xp.size * xp.dtype.itemsize + wp.size + n_pad * 4,
            transcendentals=0,
        ),
    )(xp, wp, sp)
    return out[0, :m, :n]


# ---------------------------------------------------------------------------
# int4 (nibble-packed, K-groupwise scales)
# ---------------------------------------------------------------------------

INT4_GROUP = 128  # unpacked K rows per scale (bnb nf4 uses 64-elem blocks)


def int4_group(k: int, group: int = INT4_GROUP) -> int:
    """Effective scale-group for a K dim: the default when it divides K
    (every production decoder width), else one group spanning K."""
    return group if k % group == 0 else k


def quantize_int4(w: jnp.ndarray, group: int = INT4_GROUP
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[K, N] float -> (packed int8 [K//2, N], fp32 scales [K//group, N]).

    Symmetric K-groupwise quantization to [-8, 7]; consecutive K rows (2r,
    2r+1) share byte r as (low, high) nibbles."""
    k, n = w.shape
    group = int4_group(k, group)
    assert k % 2 == 0 and k % group == 0, (k, group)
    w32 = w.astype(jnp.float32).reshape(k // group, group, n)
    absmax = jnp.max(jnp.abs(w32), axis=1)
    scale = jnp.where(absmax > 0, absmax / 7.0, 1.0)
    q = jnp.clip(jnp.round(w32 / scale[:, None, :]), -8, 7)
    q = q.astype(jnp.int8).reshape(k, n)
    low, high = q[0::2], q[1::2]
    packed = (low & jnp.int8(0xF)) | (high << 4)
    return packed, scale


def dequantize_int4(packed: jnp.ndarray, scale: jnp.ndarray,
                    dtype=jnp.bfloat16) -> jnp.ndarray:
    """Inverse of quantize_int4 -> [K, N] dtype."""
    k2, n = packed.shape
    w32 = packed.astype(jnp.int32)
    low = (w32 << 28) >> 28      # sign-extended low nibble
    high = (w32 << 24) >> 28     # sign-extended high nibble
    q = jnp.stack([low, high], axis=1).reshape(2 * k2, n)
    g = scale.shape[0]
    deq = q.reshape(g, -1, n).astype(jnp.float32) * scale[:, None, :]
    return deq.reshape(2 * k2, n).astype(dtype)


def _pick_block_k(k: int, group: int, cap: int = 2560) -> int:
    """Largest k-block <= cap that DIVIDES k (and is 256/group aligned):
    a dividing block means jnp.pad of the weight is a no-op the compiler
    elides. The r4 13B-int4 decode trace showed per-call weight pads
    (k=5120 -> k_pad=6144) burning ~300 ms of a 7.5 s run in pad fusions
    + copies. Blocks whose scale-row count tiles the (8, 128) layout are
    preferred (Mosaic block rule); otherwise the kernel dynamic-slices the
    full scale array (tiny). k=5120 -> 1024, k=13824 -> 2304."""
    for need_aligned_scales in (True, False):
        for bk in range(min(cap, k), 255, -256):
            if k % bk == 0 and bk % group == 0 and bk % 256 == 0:
                if not need_aligned_scales or (bk // group) % 8 == 0:
                    return bk
    return min(2048, _round_up(k, 2 * group))


def _q4_matmul_kernel_v2(x_ref, w_ref, scale_ref, o_ref, acc_ref, *,
                         k_blocks, gpb):
    """(m, n, k) grid cell of the int4 matmul, v2 (r4): the packed byte tile
    is reinterpreted as int4 via ``pltpu.bitcast`` — Mosaic's int4->bf16
    convert lands the nibbles back in the ORIGINAL K-row order (verified:
    byte r's (low, high) -> rows (2r, 2r+1)), so dequant is ONE convert and
    ONE groupwise mul per element, in bf16 lanes, and the matmul is a single
    full-K dot. The v1 kernel spent ~9 int32 VPU ops per packed byte on
    shift-based sign extension and ran decode at ~11% of the weight-HBM
    roofline (13.0 tok/s at 13B int4, docs/PERF_NOTES.md r4).

    ``gpb``: scale groups per k-block. When the caller couldn't give the
    scale a (8, 128)-tiling block (gpb % 8 != 0), scale_ref holds ALL scale
    rows and this block's rows are dynamic-sliced here — an unaligned
    sublane slice, but on an [K/group, bn] fp32 tile measured in KB."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0]                                    # [bm, bk]
    w4 = pltpu.bitcast(w_ref[0], jnp.int4)          # [bk, bn], original order
    w = w4.astype(x.dtype)
    bk, bn = w.shape
    s_all = scale_ref[0]
    # rows beyond gpb are 8-alignment padding (static slice drops them)
    scale = s_all[:gpb].astype(x.dtype)             # [gpb, bn]
    w = (w.reshape(gpb, bk // gpb, bn) * scale[:, None, :]).reshape(bk, bn)
    acc_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(kb == k_blocks - 1)
    def _write():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _q4_matmul_kernel_v3(x_ref, w_ref, scale_ref, o_ref, acc_ref, *,
                         k_blocks, gpb, dequant="convert"):
    """v3 (r4): groupwise scaling applied to PARTIAL SUMS, not weights.

    The r4 decode-chunk profile showed the int4 GEMVs at ~2.7x their weight
    DMA time — VPU-bound on dequant (v2 does one convert + one mul per
    weight element). Since y = sum_g scale[g] * (x_g @ w4_g) column-wise,
    the groupwise mul moves to the [bm, bn] partial results (bm=8 at decode:
    ~64x fewer muls); the weight side keeps only the unavoidable int4->bf16
    convert. One dot per scale group, statically unrolled (Mosaic dot is
    2-D; gpb is 8/20 at production K-blocks).

    ``dequant`` selects how the int4 tile becomes bf16 (the residual VPU
    cost after v3; r4 left it unmeasured):
      - "convert":  Mosaic's direct int4->bf16 convert (the v3 default)
      - "via_int8": int4->int8->bf16 two-step (probes whether the narrow
        direct convert is the slow path)
      - "magic":    bitwise bf16 construction — (q+8) | 0x4300 reinterpreted
        as bf16 is exactly 136+q, so w = bitcast(...) - 136 needs no
        int->float convert at all (the llama.cpp/W4A16 trick)
    """
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0]                                    # [bm, bk]
    w4 = pltpu.bitcast(w_ref[0], jnp.int4)          # [bk, bn], original order
    if dequant == "magic":
        # Mosaic vector integer add/or need i16/i32 lanes (i8 addi fails to
        # lower on v5e); (q+8)|0x4300 fits int16 and bitcasts to bf16 136+q
        i16 = w4.astype(jnp.int16) + jnp.int16(8)
        w = pltpu.bitcast(i16 | jnp.int16(0x4300), jnp.bfloat16)
        w = (w - jnp.bfloat16(136.0)).astype(x.dtype)
    elif dequant == "via_int8":
        w = w4.astype(jnp.int8).astype(x.dtype)
    else:
        w = w4.astype(x.dtype)
    bk, bn = w.shape
    group = bk // gpb
    s_all = scale_ref[0]                            # [gpb(_pad), bn] fp32
    acc = acc_ref[...]
    for g in range(gpb):
        part = jax.lax.dot_general(
            x[:, g * group:(g + 1) * group], w[g * group:(g + 1) * group],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc = acc + part * s_all[g][None, :]
    acc_ref[...] = acc

    @pl.when(kb == k_blocks - 1)
    def _write():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _q4_matmul_kernel(xe_ref, xo_ref, w_ref, scale_ref, o_ref, acc_ref, *,
                      k_blocks):
    """(m, n, k) grid cell of the int4 matmul; K innermost with an fp32 VMEM
    accumulator. The weight tile arrives nibble-packed [bk/2, bn]; nibbles are
    sign-extended on the VPU and scaled (bf16) groupwise before two MXU
    matmuls against the pre-split even/odd activation rows — splitting x
    outside the kernel avoids a stride-2 lane slice Mosaic handles poorly."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xe = xe_ref[0]                            # [bm, bk/2] rows 0,2,4,..
    xo = xo_ref[0]                            # [bm, bk/2] rows 1,3,5,..
    w8 = w_ref[0].astype(jnp.int32)           # [bk/2, bn]
    bk2, bn = w8.shape
    cdt = xe.dtype
    scale = scale_ref[0].astype(cdt)          # [groups_in_block, bn]
    g = scale.shape[0]
    low = ((w8 << 28) >> 28).astype(cdt)
    high = ((w8 << 24) >> 28).astype(cdt)
    # both nibbles of packed row r belong to unpacked group (2r)//group
    lowd = (low.reshape(g, bk2 // g, bn) * scale[:, None, :]).reshape(bk2, bn)
    highd = (high.reshape(g, bk2 // g, bn) * scale[:, None, :]).reshape(bk2, bn)
    acc_ref[...] += jax.lax.dot_general(
        xe, lowd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot_general(
        xo, highd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(kb == k_blocks - 1)
    def _write():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def int4_matmul(x: jnp.ndarray, w_q4: jnp.ndarray, scale: jnp.ndarray,
                block_m: int = 256, block_n: int = 512,
                group: int = INT4_GROUP) -> jnp.ndarray:
    """x [M, K] @ dequant(w_q4 [K//2, N] packed, scale [K//group, N]) ->
    [M, N] x.dtype. Falls back to XLA dequant+matmul off TPU."""
    m, k = x.shape
    k2, n = w_q4.shape
    group = int4_group(k, group)
    assert k == 2 * k2 and k % group == 0, (k, k2, group)
    block_k = _pick_block_k(k, group)
    # Pallas-path alignment contract: block_k must be lane-aligned when
    # halved and hold >= 1 whole scale group. Unaligned K (possible only via
    # the group=K fallback of int4_group) takes the XLA dequant matmul.
    aligned = (block_k % 256 == 0) and (block_k % group == 0) \
        and (block_k // group >= 1)
    if (jax.devices()[0].platform != "tpu" or not aligned
            or _under_multidevice_mesh()):
        return (x @ dequantize_int4(w_q4, scale, x.dtype)).astype(x.dtype)
    if os.environ.get("CAMBRIAN_INT4_V1") == "1":
        return _int4_matmul_v1(x, w_q4, scale, block_m, block_n, group,
                               block_k)

    m_pad = _round_up(m, block_m)
    n_pad = _round_up(n, block_n)
    k_pad = _round_up(k, block_k)
    k_blocks = k_pad // block_k
    xp = jnp.pad(x, ((0, m_pad - m), (0, k_pad - k)))[None]
    wp = jnp.pad(w_q4, ((0, (k_pad - k) // 2), (0, n_pad - n)))[None]
    sp = jnp.pad(scale.astype(jnp.float32),
                 ((0, (k_pad - k) // group), (0, n_pad - n)),
                 constant_values=1.0)[None]

    grid = (m_pad // block_m, n_pad // block_n, k_blocks)
    gpb = block_k // group  # scale rows per k block
    gpb_pad = gpb if (gpb % 8 == 0 or k_blocks == 1) else _round_up(gpb, 8)
    if gpb_pad != gpb:
        # gpb rows don't tile (8, 128): pad each k-block's scale rows to 8
        # (fp32 KBs, loop-invariant -> hoisted out of decode loops)
        sb = sp.reshape(k_blocks, gpb, n_pad)
        sb = jnp.pad(sb, ((0, 0), (0, gpb_pad - gpb), (0, 0)),
                     constant_values=1.0)
        sp = sb.reshape(1, k_blocks * gpb_pad, n_pad)
    scale_spec = pl.BlockSpec((1, gpb_pad, block_n),
                              lambda i, j, kb: (0, kb, j),
                              memory_space=pltpu.VMEM)
    # v3 (partial-sum scaling) is the default: 41.5 vs 33.8 tok/s at 13B-int4
    # serving (docs/PERF_NOTES.md r4). CAMBRIAN_INT4_V2=1 keeps v2 for A/B;
    # CAMBRIAN_INT4_DEQUANT=convert|magic|via_int8 selects the v3 dequant
    # variant. r5 on-chip A/B at 13B int4 serving: via_int8 41.8 tok/s >
    # convert 40.9 > magic 30.3 (the bitwise bf16 trick needs an i16 widen
    # on v5e, which costs more than the convert it removes) — via_int8 is
    # the default.
    kern = (_q4_matmul_kernel_v2
            if os.environ.get("CAMBRIAN_INT4_V2", "0") == "1"
            else functools.partial(
                _q4_matmul_kernel_v3,
                dequant=os.environ.get("CAMBRIAN_INT4_DEQUANT", "via_int8")))
    out = pl.pallas_call(
        functools.partial(kern, k_blocks=k_blocks, gpb=gpb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_m, block_k),
                         lambda i, j, kb: (0, i, kb), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k // 2, block_n),
                         lambda i, j, kb: (0, kb, j), memory_space=pltpu.VMEM),
            scale_spec,
        ],
        out_specs=pl.BlockSpec((1, block_m, block_n),
                               lambda i, j, kb: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m_pad, n_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k_pad,
            bytes_accessed=xp.size * xp.dtype.itemsize + wp.size
            + sp.size * 4,
            transcendentals=0,
        ),
    )(xp, wp, sp)
    return out[0, :m, :n]


def _int4_matmul_v1(x, w_q4, scale, block_m, block_n, group, block_k):
    """v1 even/odd-split kernel, kept for A/B (CAMBRIAN_INT4_V1=1): measured
    13.0 tok/s at 13B-int4 decode vs v2's bitcast path (docs/PERF_NOTES.md)."""
    m, k = x.shape
    k2, n = w_q4.shape
    m_pad = _round_up(m, block_m)
    n_pad = _round_up(n, block_n)
    k_pad = _round_up(k, block_k)
    k_blocks = k_pad // block_k
    xp = jnp.pad(x, ((0, m_pad - m), (0, k_pad - k)))
    xe = xp[:, 0::2][None]
    xo = xp[:, 1::2][None]
    wp = jnp.pad(w_q4, ((0, (k_pad - k) // 2), (0, n_pad - n)))[None]
    sp = jnp.pad(scale.astype(jnp.float32),
                 ((0, (k_pad - k) // group), (0, n_pad - n)),
                 constant_values=1.0)[None]

    grid = (m_pad // block_m, n_pad // block_n, k_blocks)
    gpb = block_k // group  # scale rows per k block
    out = pl.pallas_call(
        functools.partial(_q4_matmul_kernel, k_blocks=k_blocks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_m, block_k // 2),
                         lambda i, j, kb: (0, i, kb), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_m, block_k // 2),
                         lambda i, j, kb: (0, i, kb), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k // 2, block_n),
                         lambda i, j, kb: (0, kb, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpb, block_n),
                         lambda i, j, kb: (0, kb, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_m, block_n),
                               lambda i, j, kb: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m_pad, n_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * m_pad * n_pad * (k_pad // 2),
            bytes_accessed=(xe.size + xo.size) * xp.dtype.itemsize
            + wp.size + sp.size * 4,
            transcendentals=0,
        ),
    )(xe, xo, wp, sp)
    return out[0, :m, :n]


class QuantDense4(nn.Module):
    """Dense over nibble-packed int4 weights with K-groupwise fp32 scales —
    the ``load_4bit`` serving path (reference bitsandbytes nf4,
    model/builder.py:35-44). Params: ``kernel_q4`` int8 [K//2, N],
    ``scale`` fp32 [K//group, N], optional ``bias``."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    group: int = INT4_GROUP

    @nn.compact
    def __call__(self, x):
        k = x.shape[-1]
        group = int4_group(k, self.group)
        kernel_q4 = self.param("kernel_q4", nn.initializers.zeros,
                               (k // 2, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (k // group, self.features), jnp.float32)
        shape = x.shape
        x2 = x.reshape(-1, k)
        if x2.dtype not in (jnp.bfloat16, jnp.float32):
            x2 = x2.astype(self.dtype)
        y = int4_matmul(x2, kernel_q4, scale,
                        block_m=_pick_block_m(x2.shape[0]), group=self.group)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y.reshape(*shape[:-1], self.features)


def quantize_params(params, targets=("q_proj", "k_proj", "v_proj", "o_proj",
                                     "gate_proj", "up_proj", "down_proj",
                                     "lm_head")):
    """Quantize targeted 2-D kernels in a params tree -> (tree with int8
    kernels, {path: scales}). For load_8bit-style memory-bound serving."""
    scales = {}

    def maybe_quant(path, leaf):
        ps = "/".join(getattr(k, "key", str(k)) for k in path)
        if leaf.ndim == 2 and ps.endswith("kernel") and any(t in ps for t in targets):
            q, s = quantize_int8(leaf)
            scales[ps] = s
            return q
        return leaf

    qtree = jax.tree_util.tree_map_with_path(maybe_quant, params)
    return qtree, scales


def _pick_block_m(m: int) -> int:
    # decode steps have tiny M; don't pad 4 rows to a 256-row tile
    return min(256, max(8, _round_up(m, 8)))


class QuantDense(nn.Module):
    """Dense layer over int8 weights with per-output-channel fp32 scales.

    Drop-in for nn.Dense when ``config.quantize == "int8"`` (the load_8bit
    serving path; reference loads bitsandbytes int8 linears,
    model/builder.py:35-44). Params: ``kernel_q`` int8 [K, N], ``scale`` fp32
    [N], optional ``bias``. ``ops.quant.quantize_dense_tree`` converts a
    bf16/fp32 checkpoint tree in place.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        k = x.shape[-1]
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (k, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        shape = x.shape
        x2 = x.reshape(-1, k)
        if x2.dtype not in (jnp.bfloat16, jnp.float32):
            x2 = x2.astype(self.dtype)
        y = int8_matmul(x2, kernel_q, scale, block_m=_pick_block_m(x2.shape[0]))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y.reshape(*shape[:-1], self.features)


# bnb's load_in_8bit skips lm_head by default (llm_int8_skip_modules);
# embed/lm_head stay full precision here too.
DECODER_QUANT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj",
                         "gate_proj", "up_proj", "down_proj")


def quantize_dense_tree(params, targets=DECODER_QUANT_TARGETS,
                        mode: str = "int8"):
    """Convert matching ``{...: {"kernel": w}}`` subtrees of a params tree to
    the QuantDense layout (``{"kernel_q": int8, "scale": fp32}``, or
    ``{"kernel_q4", "scale"}`` for ``mode="int4"``); bias kept. Returns a new
    tree; non-matching leaves are untouched."""
    assert mode in ("int8", "int4"), mode

    def walk(tree, path):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for name, sub in tree.items():
            if (
                isinstance(sub, dict) and "kernel" in sub
                and getattr(sub["kernel"], "ndim", 0) == 2
                and any(t == name for t in targets)
            ):
                w = jnp.asarray(sub["kernel"])
                if mode == "int4":
                    q, s = quantize_int4(w)
                    new = {"kernel_q4": q, "scale": s}
                else:
                    q, s = quantize_int8(w)
                    new = {"kernel_q": q, "scale": s}
                if "bias" in sub:
                    new["bias"] = jnp.asarray(sub["bias"], jnp.float32)
                out[name] = new
            else:
                out[name] = walk(sub, path + (name,))
        return out

    return walk(params, ())

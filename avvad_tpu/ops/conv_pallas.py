"""Fused int8 ResNet BasicBlock kernels (Pallas TPU).

Why this exists: the serving profile (BENCH_NOTES.md, round 2) showed the
int8 video tower at ~50% of the v5e's int8 MXU peak with the measured
blocker being conv-output materialization — XLA does not fuse the
dequant/BN/relu/requant epilogue into its int8 convs, so every conv pays
an int32 write + read + int8 write of the full activation (+70% on the
stage-1 probe). These kernels compute a whole BasicBlock (two 3x3 convs,
BN-affine epilogues, the residual add, and the output requantization)
with every intermediate held in VMEM: the only HBM traffic per block is
the int8 input read and the int8 output write.

Replaces (capability-wise): the conv stack of torchvision's ResNet-18
BasicBlocks used by the reference's video tower
(/root/reference/packages/models/Video_Net.py:18,35-37).

Layout — the design that sidesteps Mosaic's small-spatial-dim traps
(documented negative result in ops/stem_pallas.py): activations are kept
as (P, C, N) "pixel planes" — the spatial position P = H*W on the
leading (untiled) dimension, channels on sublanes, frames on lanes. The
tower's spatial extents are tiny (17x17 .. 3x3) while the frame batch is
huge, so:
- every matmul is (Cout, 3Cin) x (3Cin, TN): full 128-lane occupancy
  from the frame dim, channel counts are hardware-aligned, and no tensor
  ever has a 17/34-element sublane/lane dim;
- a 3x3 conv tap row (dy) is a *contiguous* 3-plane slice of the padded
  input — x[(h+dy)*Wp + w : +3] — so the three dx taps pack into one
  K=3Cin contraction via a free leading-dim reshape;
- spatial padding is materialized as zero planes (P = (H+2)*(W+2)), so
  there is no edge masking anywhere in the kernel.

The epilogues are folded per-channel affines (same trick as
ops/stem_pallas.py): inference BatchNorm is A*x + B; folding the conv
dequant scale (x_scale * w_scale_c) and the static output quantization
scale into (A, B) makes each epilogue q = clip(round(max(A*acc + B, 0)))
— two (Cout,) vectors per conv, computed in XLA at trace time.
Numerics: the same f32 math as the XLA int8 path reassociated, so
isolated quantization-boundary values can flip one LSB (the documented
int8-trunk noise class, quality-gated in QUALITY.md).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one weight-quantizer definition with the XLA int8 tower (ops/qparams.py)
from .qparams import weight_qparams as _wq


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


def pack_conv3(w_hwio: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) -> (3, Cout, 3*Cin): one (Cout, 3Cin) contraction
    matrix per tap row dy, with the K rows ordered dx-major (dx*Cin + c)
    to match the contiguous 3-plane input slice."""
    _, _, cin, cout = w_hwio.shape
    return w_hwio.reshape(3, 3 * cin, cout).transpose(0, 2, 1)


def pack_conv1(w_hwio: jax.Array) -> jax.Array:
    """(1, 1, Cin, Cout) -> (Cout, Cin) (downsample shortcuts)."""
    return w_hwio[0, 0].T


def _conv_out(size: int, stride: int) -> int:
    return (size + 2 - 3) // stride + 1


def _block_kernel(H: int, W: int, stride: int, has_down: bool,
                  x_ref, w1_ref, a1_ref, b1_ref, w2_ref, a2_ref, b2_ref,
                  *rest):
    """Whole BasicBlock: conv1+bn1+relu+requant -> conv2+bn2 + residual
    -> relu -> requant. Refs:
      x_ref  (Hp*Wp, Cin, TN) int8, zero-padded border planes
      w1_ref (3, Cout, 3*Cin) int8;  a1/b1 (Cout, 1) f32 folded epilogue
      w2_ref (3, Cout, 3*Cout) int8; a2/b2 (Cout, 1) f32 folded epilogue
      [wd_ref (Cout, Cin) int8; ad/bd (Cout, 1) f32]   when has_down
      [rs_ref (1, 1) f32 in SMEM]                      when identity
      o_ref  (Hop*Wop, Cout, TN) int8, padded (borders zeroed here)
      y1_ref (Hop*Wop, Cout, TN) int8 scratch, padded
    """
    if has_down:
        wd_ref, ad_ref, bd_ref, o_ref, y1_ref = rest
    else:
        rs_ref, o_ref, y1_ref = rest
    Wp = W + 2
    Ho, Wo = _conv_out(H, stride), _conv_out(W, stride)
    Wop = Wo + 2
    cin = x_ref.shape[1]
    cout = o_ref.shape[1]
    tn = x_ref.shape[2]

    # zero the padded borders of scratch and output once per program
    y1_ref[...] = jnp.zeros_like(y1_ref)
    o_ref[...] = jnp.zeros_like(o_ref)

    # Pixel loops are rolled (fori_loop). Measured on v5e: unrolling them
    # (static plane indices) gains ~11% on layer3 shapes but keeps every
    # pixel's (Cout, TN) accumulator live, overflowing the 16 MB scoped
    # VMEM at layer4 (512-channel) shapes; the rolled loop fits
    # everywhere. See the negative-result section in BENCH_NOTES.md.
    def conv1_px(i, _):
        h = i // Wo
        w = i % Wo
        p0 = (h * stride) * Wp + (w * stride)
        acc = jnp.zeros((cout, tn), jnp.int32)
        for dy in range(3):
            xs = x_ref[pl.ds(p0 + dy * Wp, 3)].reshape(3 * cin, tn)
            acc += jax.lax.dot_general(
                w1_ref[dy], xs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * a1_ref[:] + b1_ref[:]
        q = jnp.clip(jnp.round(jnp.maximum(y, 0.0)), 0.0, 127.0)
        y1_ref[pl.ds((h + 1) * Wop + (w + 1), 1)] = q.astype(jnp.int8)[None]
        return 0

    jax.lax.fori_loop(0, Ho * Wo, conv1_px, 0)

    def conv2_px(i, _):
        h = i // Wo
        w = i % Wo
        p0 = h * Wop + w
        acc = jnp.zeros((cout, tn), jnp.int32)
        for dy in range(3):
            ys = y1_ref[pl.ds(p0 + dy * Wop, 3)].reshape(3 * cout, tn)
            acc += jax.lax.dot_general(
                w2_ref[dy], ys, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        y2 = acc.astype(jnp.float32) * a2_ref[:] + b2_ref[:]
        if has_down:
            xc = x_ref[(h * stride + 1) * Wp + (w * stride + 1)]
            accd = jax.lax.dot_general(
                wd_ref[:], xc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            res = accd.astype(jnp.float32) * ad_ref[:] + bd_ref[:]
        else:
            xc = x_ref[(h + 1) * Wp + (w + 1)]
            res = xc.astype(jnp.float32) * rs_ref[0, 0]
        q = jnp.clip(jnp.round(jnp.maximum(y2 + res, 0.0)), 0.0, 127.0)
        o_ref[pl.ds((h + 1) * Wop + (w + 1), 1)] = q.astype(jnp.int8)[None]
        return 0

    jax.lax.fori_loop(0, Ho * Wo, conv2_px, 0)


def basic_block_int8(
    xp: jax.Array,
    w1: jax.Array, a1: jax.Array, b1: jax.Array,
    w2: jax.Array, a2: jax.Array, b2: jax.Array,
    wd: Optional[jax.Array] = None,
    ad: Optional[jax.Array] = None, bd: Optional[jax.Array] = None,
    res_scale: Optional[jax.Array] = None,
    *, H: int, W: int, stride: int = 1, tn: int = 128,
) -> jax.Array:
    """One fused BasicBlock over padded pixel planes.

    xp: (Hp*Wp, Cin, N) int8, zero border planes; N % tn == 0.
    w1/w2: pack_conv3 outputs; a*/b* folded (Cout,) epilogue vectors.
    Identity residual: res_scale = x_scale / out_scale (scalar).
    Downsample residual: wd = pack_conv1, ad/bd folded vectors.
    Returns (Hop*Wop, Cout, N) int8, padded, ready for the next block.
    """
    has_down = wd is not None
    p, cin, n = xp.shape
    if n % tn:
        raise ValueError(f"N={n} not a multiple of tn={tn}")
    if tn % 128 and not _interpret():
        # Mosaic requires lane-dim block sizes divisible by 128
        raise ValueError(f"tn={tn} must be a multiple of 128")
    if p != (H + 2) * (W + 2):
        raise ValueError(f"expected {(H + 2) * (W + 2)} planes, got {p}")
    cout = w1.shape[1]
    ho, wo = _conv_out(H, stride), _conv_out(W, stride)
    po = (ho + 2) * (wo + 2)

    col = lambda v: v.reshape(-1, 1).astype(jnp.float32)  # noqa: E731
    vspec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * (len(shape) - 1) + (i,),
        memory_space=pltpu.VMEM)
    wspec = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    args = [xp, w1, col(a1), col(b1), w2, col(a2), col(b2)]
    in_specs = [vspec((p, cin, tn)), wspec(w1), wspec(col(a1)),
                wspec(col(b1)), wspec(w2), wspec(col(a2)), wspec(col(b2))]
    if has_down:
        args += [wd, col(ad), col(bd)]
        in_specs += [wspec(wd), wspec(col(ad)), wspec(col(bd))]
    else:
        rs = jnp.asarray(res_scale, jnp.float32).reshape(1, 1)
        args.append(rs)
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))

    kernel = functools.partial(_block_kernel, H, W, stride, has_down)
    return pl.pallas_call(
        kernel,
        grid=(n // tn,),
        in_specs=in_specs,
        out_specs=vspec((po, cout, tn)),
        out_shape=jax.ShapeDtypeStruct((po, cout, n), jnp.int8),
        scratch_shapes=[pltpu.VMEM((po, cout, tn), jnp.int8)],
        interpret=_interpret(),
    )(*args)


# -- epilogue folding ---------------------------------------------------------


def _bn_affine(bn_params: dict, bn_stats: dict, eps: float):
    inv = jax.lax.rsqrt(bn_stats["var"] + eps)
    a = bn_params["scale"] * inv
    return a, bn_params["bias"] - bn_stats["mean"] * a


def fold_block(x_scale, params: dict, stats: dict, q1_scale, qout_scale,
               eps: float = 1e-5) -> dict:
    """Fold one BasicBlock's float params into the kernel's packed arrays.

    params/stats: the block's Flax subtrees (conv1/conv2[/downsample_conv]
    with HWIO 'kernel'; bn1/bn2[/downsample_bn] with scale/bias[/mean/var]).
    q1_scale / qout_scale: the calibrated static activation scales (the
    `quant` collection's amax / 127). All in f32 at trace time.
    """
    w1_q, w1_s = _wq(params["conv1"]["kernel"])
    w2_q, w2_s = _wq(params["conv2"]["kernel"])
    a1, b1 = _bn_affine(params["bn1"], stats["bn1"], eps)
    a2, b2 = _bn_affine(params["bn2"], stats["bn2"], eps)
    spec = {
        "w1": pack_conv3(w1_q),
        "a1": a1 * (x_scale * w1_s) / q1_scale,
        "b1": b1 / q1_scale,
        "w2": pack_conv3(w2_q),
        "a2": a2 * (q1_scale * w2_s) / qout_scale,
        "b2": b2 / qout_scale,
        "out_scale": qout_scale,
    }
    if "downsample_conv" in params:
        wd_q, wd_s = _wq(params["downsample_conv"]["kernel"])
        ad, bd = _bn_affine(params["downsample_bn"],
                            stats["downsample_bn"], eps)
        spec["wd"] = pack_conv1(wd_q)
        spec["ad"] = ad * (x_scale * wd_s) / qout_scale
        spec["bd"] = bd / qout_scale
    else:
        spec["res_scale"] = x_scale / qout_scale
    return spec


# -- trunk driver -------------------------------------------------------------

_TRUNK_GEOM = (  # (H_in, stride) per block, torchvision ResNet-18 at 67x67
    (17, 1), (17, 1),   # layer1: 64
    (17, 2), (9, 1),    # layer2: 128
    (9, 2), (5, 1),     # layer3: 256
    (5, 2), (3, 1),     # layer4: 512
)


def nhwc_to_planes(x_q: jax.Array) -> jax.Array:
    """(N, H, W, C) int8 -> padded (Hp*Wp, C, N) pixel planes."""
    n, h, w, c = x_q.shape
    xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return xp.transpose(1, 2, 3, 0).reshape((h + 2) * (w + 2), c, n)


def trunk_features_int8(x_q: jax.Array, blocks: list, *,
                        tn: int = 128) -> jax.Array:
    """Run the 8 fused BasicBlocks + global average pool.

    x_q: (N, 17, 17, 64) int8 — the quantized, max-pooled stem output.
    blocks: per block a dict with keys w1,a1,b1,w2,a2,b2 and either
      res_scale (identity) or wd,ad,bd (downsample), plus out_scale on
      the LAST block (for the final dequant).
    Returns (N, 512) f32 pooled features.
    """
    n = x_q.shape[0]
    pad = (-n) % tn
    if pad:
        x_q = jnp.pad(x_q, ((0, pad), (0, 0), (0, 0), (0, 0)))
    x = nhwc_to_planes(x_q)
    for spec, (h, stride) in zip(blocks, _TRUNK_GEOM):
        x = basic_block_int8(
            x, spec["w1"], spec["a1"], spec["b1"],
            spec["w2"], spec["a2"], spec["b2"],
            wd=spec.get("wd"), ad=spec.get("ad"), bd=spec.get("bd"),
            res_scale=spec.get("res_scale"),
            H=h, W=h, stride=stride, tn=tn)
    # x: (25, 512, Np) padded 5x5 planes; interior 3x3 = global avg pool
    interior = np.array([(r + 1) * 5 + (c + 1)
                         for r in range(3) for c in range(3)])
    s = jnp.sum(x[interior].astype(jnp.int32), axis=0)  # (512, Np)
    feats = s.astype(jnp.float32) * (blocks[-1]["out_scale"] / 9.0)
    return feats.T[:n]  # (N, 512)

"""ResNet-18 feature trunk (Flax, NHWC).

The reference's video tower is torchvision's resnet18 minus the final FC
(/root/reference/packages/models/Video_Net.py:18,35-37; AV_Net.py:25-30).
This is a from-scratch Flax implementation pinned to the same topology so
checkpoints are interchangeable: 7x7/2 stem + 3x3/2 maxpool, four stages of
two BasicBlocks with channel widths (64, 128, 256, 512) and strides
(1, 2, 2, 2), 1x1-conv downsample shortcuts, global average pool -> 512.

TPU notes: NHWC layout (channels on the lane dimension), BatchNorm with
running statistics in the `batch_stats` collection, optional bfloat16
compute with float32 params/stats.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


# shared with ops.conv_pallas: both int8 trunk paths must quantize the
# same float checkpoint to the same ints — see ops/qparams.py
from ..ops.qparams import weight_qparams as _weight_qparams


def _conv_i8(x_q: jax.Array, w_q: jax.Array, strides, padding) -> jax.Array:
    """int8 x int8 -> int32 MXU conv (2x the bf16 rate on v5e). Zero padding
    is exact: symmetric quantization maps 0.0 to 0."""
    return jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _act_quant(mod: nn.Module, x: jax.Array, name: str, mode: str):
    """Quantize an activation tensor to (int8, scalar scale).

    mode="dynamic": per-tensor max-abs computed on the fly. Costs an extra
    full read of the f32 tensor (the reduce) and forces the f32 buffer to
    materialize — this is why dynamic W8A8 barely beat bf16 in round 1.
    mode="calibrate": like dynamic, but also records the running max into
    the mutable `quant` collection (apply with mutable=["quant"]).
    mode="static": uses the calibrated scale — the whole quantize chain is
    elementwise with a constant scale, so XLA fuses it into the producer's
    epilogue and the activation materializes in HBM as int8 (4x less
    activation bandwidth than f32, no extra passes)."""
    if mode == "dynamic":
        amax = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8)
    else:
        var = mod.variable("quant", name,
                           lambda: jnp.zeros((), jnp.float32))
        if mode == "calibrate":
            batch_max = jnp.max(jnp.abs(x))
            if not mod.is_initializing():
                var.value = jnp.maximum(var.value, batch_max)
            amax = jnp.maximum(batch_max, 1e-8)
        elif mode == "static":
            amax = jnp.maximum(var.value, 1e-8)
        else:
            raise ValueError(f"unknown quant mode: {mode!r}")
    scale = amax / 127.0
    x_q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return x_q, scale


def _max_pool_i8(x_q: jax.Array, window=(3, 3), strides=(2, 2),
                 padding=((1, 1), (1, 1))) -> jax.Array:
    """Max pool on int8 (max commutes with the monotone quantization map,
    so pooling the quantized stem is exact vs quantizing the pooled stem).
    flax.nn.max_pool inits with -inf, which is float-only."""
    return jax.lax.reduce_window(
        x_q, jnp.int8(-128), jax.lax.max,
        window_dimensions=(1,) + window + (1,),
        window_strides=(1,) + strides + (1,),
        padding=((0, 0),) + tuple(padding) + ((0, 0),),
    )


class _QConvInt8(nn.Module):
    """W8A8 conv on pre-quantized input: (x_q int8, x_scale) -> f32 output.
    Same param name/shape as nn.Conv (kernel, HWIO, no bias), so the param
    tree — and therefore checkpoints and the torch importer — are identical
    to the float path."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: object = ((1, 1), (1, 1))

    @nn.compact
    def __call__(self, x_q: jax.Array, x_scale: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            self.kernel_size + (x_q.shape[-1], self.features))
        w_q, w_scale = _weight_qparams(kernel)
        y = _conv_i8(x_q, w_q, self.strides, tuple(self.padding))
        return y.astype(jnp.float32) * (x_scale * w_scale)


class _ConvKernel(nn.Module):
    """Param-holder twin of _QConvInt8/nn.Conv for the Pallas trunk: same
    param name ("kernel") and HWIO shape, so the param tree — and
    therefore checkpoints — are identical to the XLA block paths."""

    shape: tuple

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 self.shape)


class _BNParams(nn.Module):
    """Param-holder twin of nn.BatchNorm (inference): same param names
    (scale/bias) and batch_stats names (mean/var), read for folding
    instead of being applied."""

    features: int

    def setup(self):
        f = self.features
        self.scale = self.param("scale", nn.initializers.ones, (f,))
        self.bias = self.param("bias", nn.initializers.zeros, (f,))
        self.mean = self.variable("batch_stats", "mean",
                                  lambda: jnp.zeros((f,), jnp.float32))
        self.var = self.variable("batch_stats", "var",
                                 lambda: jnp.ones((f,), jnp.float32))


class BasicBlockPallas(nn.Module):
    """Checkpoint-compatible twin of BasicBlock's static-int8 path that
    folds its params for the fused Pallas block kernel
    (ops/conv_pallas.py) instead of running XLA convs. Declares the same
    param / batch_stats / quant variable tree as BasicBlock, so a model
    calibrated with the XLA path restores directly."""

    features: int
    in_features: int
    stride: int = 1
    norm_eps: float = 1e-5

    def setup(self):
        f, c = self.features, self.in_features
        self.conv1 = _ConvKernel((3, 3, c, f))
        self.bn1 = _BNParams(f)
        self.conv2 = _ConvKernel((3, 3, f, f))
        self.bn2 = _BNParams(f)
        if self.stride != 1 or c != f:
            self.downsample_conv = _ConvKernel((1, 1, c, f))
            self.downsample_bn = _BNParams(f)
        self.q1 = self.variable("quant", "q1",
                                lambda: jnp.zeros((), jnp.float32))
        self.q_out = self.variable("quant", "q_out",
                                   lambda: jnp.zeros((), jnp.float32))

    def folded(self, x_scale):
        """-> (kernel spec dict, out_scale). Scales replicate _act_quant's
        static mode: amax = max(calibrated, 1e-8), scale = amax / 127."""
        from ..ops.conv_pallas import fold_block

        bn = lambda m: ({"scale": m.scale, "bias": m.bias},  # noqa: E731
                        {"mean": m.mean.value, "var": m.var.value})
        params = {"conv1": {"kernel": self.conv1.kernel},
                  "conv2": {"kernel": self.conv2.kernel}}
        stats = {}
        params["bn1"], stats["bn1"] = bn(self.bn1)
        params["bn2"], stats["bn2"] = bn(self.bn2)
        if self.stride != 1 or self.in_features != self.features:
            params["downsample_conv"] = {"kernel": self.downsample_conv.kernel}
            params["downsample_bn"], stats["downsample_bn"] = \
                bn(self.downsample_bn)
        q1_s = jnp.maximum(self.q1.value, 1e-8) / 127.0
        qo_s = jnp.maximum(self.q_out.value, 1e-8) / 127.0
        spec = fold_block(x_scale, params, stats, q1_s, qo_s,
                          eps=self.norm_eps)
        return spec, qo_s


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/1x1-downsample shortcut.

    When `quant_int8` is set the block is int8-resident: it takes and
    returns `(x_q int8, x_scale)` so inter-block activation buffers live in
    HBM as int8 — the convs run on the MXU's int8 path and the residual is
    reconstructed from the quantized input (one cheap dequant that fuses
    into the add). Float path is unchanged."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    norm_eps: float = 1e-5
    quant_int8: bool = False
    quant_mode: str = "dynamic"  # dynamic | calibrate | static

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=self.norm_eps, dtype=jnp.float32)

        if self.quant_int8:
            x_q, x_scale = x
            y = _QConvInt8(self.features, (3, 3),
                           strides=(self.stride, self.stride),
                           name="conv1")(x_q, x_scale)
            y = norm(name="bn1")(y)
            y = nn.relu(y)
            y_q, y_scale = _act_quant(self, y, "q1", self.quant_mode)
            y = _QConvInt8(self.features, (3, 3), name="conv2")(y_q, y_scale)
            y = norm(name="bn2")(y)

            if self.stride != 1 or x_q.shape[-1] != self.features:
                residual = _QConvInt8(self.features, (1, 1),
                                      strides=(self.stride, self.stride),
                                      padding=((0, 0), (0, 0)),
                                      name="downsample_conv")(x_q, x_scale)
                residual = norm(name="downsample_bn")(residual)
            else:
                residual = x_q.astype(jnp.float32) * x_scale

            out = nn.relu(y + residual)
            return _act_quant(self, out, "q_out", self.quant_mode)

        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        residual = x
        y = conv(self.features, (3, 3), strides=(self.stride, self.stride),
                 padding=[(1, 1), (1, 1)], name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = norm(name="bn2")(y)

        if residual.shape != y.shape:
            residual = conv(self.features, (1, 1),
                            strides=(self.stride, self.stride),
                            name="downsample_conv")(residual)
            residual = norm(name="downsample_bn")(residual)

        return nn.relu(y + residual)


def _stem_space_to_depth(x: jax.Array, w: jax.Array, dtype) -> jax.Array:
    """The 7x7/s2/p3 stem conv, reparameterized as space-to-depth(2) + a
    4x4/s1 VALID conv (the MLPerf ResNet TPU trick) — mathematically exact.

    The stride-2 7x7 walk decomposes by input-pixel parity: with the input
    zero-padded to the conv's reach and grouped into 2x2 blocks, each output
    equals a 4x4 stride-1 conv over the (h/2, w/2, 4*C) parity-grouped
    input against the 7x7 kernel scattered (zero-padded to 8x8) into the
    same (tap, parity) layout. Dense stride-1 convs map far better onto the
    MXU than strided walks over tiny-channel inputs.
    """
    n, h, wd, c = x.shape
    # pad: 3 (conv pad) + enough on bottom/right to reach 2*(out-1)+7 and
    # land on an even size
    out_h = (h + 2 * 3 - 7) // 2 + 1
    out_w = (wd + 2 * 3 - 7) // 2 + 1
    ph = 2 * (out_h - 1) + 8 - h - 3  # bottom pad so padded size = 2*out+6, even
    pw = 2 * (out_w - 1) + 8 - wd - 3
    xp = jnp.pad(x, ((0, 0), (3, ph), (3, pw), (0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]
    x2 = xp.reshape(n, hp // 2, 2, wp // 2, 2, c)
    x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // 2, wp // 2, 4 * c)

    w8 = jnp.zeros((8, 8, c, w.shape[-1]), dtype=w.dtype).at[:7, :7].set(w)
    w4 = w8.reshape(4, 2, 4, 2, c, w.shape[-1])
    w4 = w4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, w.shape[-1])

    out = jax.lax.conv_general_dilated(
        x2.astype(dtype), w4.astype(dtype), window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out[:, :out_h, :out_w]


class _StemS2D(nn.Module):
    """Drop-in for the stem nn.Conv: same param name ("kernel") and shape
    (7, 7, C, 64), applied via the space-to-depth reparameterization."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, x.shape[-1], 64)
        )
        return _stem_space_to_depth(x, kernel, self.dtype)


class _StemInt8(nn.Module):
    """int8 stem conv on a pre-quantized input: (x_q int8, x_scale) -> f32.

    Round 2 kept the stem float on the theory that the 7x7x1 contraction
    underfills the MXU and the input is tiny — but the stem probe
    (BENCH_NOTES.md tower ablation) shows the chain is traffic-bound on its
    FLOAT conv output, not compute-bound, while round 3 measured that XLA
    fuses dequant/BN/relu/requant epilogues into int8 convs well enough to
    keep stage activations int8-resident. Quantizing the input (lip frames
    are 8-bit pixels by construction, processing/video.py min-max maps them
    to [0,255]) lets the stem conv run int8->int32 with the same fused
    epilogue structure as the stages. Param stays the torchvision-shaped
    (7,7,3,64) "kernel" (summed over the input-channel axis when `gray`,
    exactly as _StemGray), so checkpoints are unaffected."""

    gray: bool = True

    @nn.compact
    def __call__(self, x_q: jax.Array, x_scale: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 3, 64)
        )
        k = jnp.sum(kernel, axis=2, keepdims=True) if self.gray else kernel
        w_q, w_scale = _weight_qparams(k)
        y = _conv_i8(x_q, w_q, (2, 2), ((3, 3), (3, 3)))
        return y.astype(jnp.float32) * (x_scale * w_scale)


class _StemGray(nn.Module):
    """Stem conv for channel-replicated inputs: (N, H, W, 1) with the
    (7,7,3,64) kernel summed over its input-channel axis (exact).

    Stays float even in the quantized trunk: the 7x7x1 contraction (K=49)
    underfills the MXU either way, the raw-pixel input is tiny next to the
    stage activations, and a float stem spares the input a quantization.
    (`ResNet18.stem_int8` opts into the quantized stem instead — see
    _StemInt8.)"""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 3, 64)
        )
        k1 = jnp.sum(kernel, axis=2, keepdims=True)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), k1.astype(self.dtype), window_strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ResNet18(nn.Module):
    """Input (N, H, W, 3) -> (N, 512) pooled features.

    `stem_s2d` switches the stem to the space-to-depth reparameterization
    (exact; the stored parameter stays the torchvision-shaped 7x7 kernel,
    so checkpoints are unaffected)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)
    dtype: jnp.dtype = jnp.float32
    norm_eps: float = 1e-5
    stem_s2d: bool = False
    gray_input: bool = False
    quant_int8: bool = False  # W8A8 convs in the four stages (inference only)
    quant_mode: str = "dynamic"  # dynamic | calibrate | static
    stages_pallas: bool = False  # fused Pallas block kernels (static int8)
    stem_int8: bool = False  # W8A8 stem conv too (requires quant_int8)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.quant_int8 and self.stem_int8:
            if self.stem_s2d:
                raise ValueError("stem_int8 and stem_s2d are exclusive")
            # Quantize from the raw f32 input (not the bf16 cast: pixel
            # values reach ~255 where the bf16 LSB is already ~1.0, and
            # stacking that rounding under the quantization would double
            # the input noise for no bandwidth win — the int8 wire is
            # narrower than bf16 anyway). Zero padding stays exact
            # (symmetric quantization maps 0.0 -> 0).
            x_q, x_s = _act_quant(self, x.astype(jnp.float32), "q_in",
                                  self.quant_mode)
            x = _StemInt8(gray=self.gray_input, name="conv1")(x_q, x_s)
        else:
            x = self._stem_float(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=self.norm_eps, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        if self.quant_int8:
            # Quantize the stem BEFORE the max pool (exact: max commutes
            # with the monotone quantization map). The stem activation at
            # (N, 34, 34, 64) is the framework's largest buffer — writing
            # it as int8 is 4x less HBM and lifts the serving batch OOM
            # ceiling by the same factor.
            x_q, x_scale = _act_quant(self, x, "q_stem", self.quant_mode)
            x = (_max_pool_i8(x_q), x_scale)
        else:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        return self._stages(x, train)

    def _stem_float(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        if self.gray_input:
            # For channel-replicated grayscale inputs, conv1(repeat(x, 3))
            # == conv(x_1ch, sum_c W) exactly — collapse the stem to one
            # input channel and skip materializing the RGB repeat (3x less
            # stem input bandwidth). Param stays the (7,7,3,64) torchvision
            # kernel for checkpoint compatibility.
            x = _StemGray(dtype=self.dtype, name="conv1")(x)
        elif self.stem_s2d:
            x = _StemS2D(dtype=self.dtype, name="conv1")(x)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
        return x

    def _stages(self, x, train: bool):
        if self.quant_int8 and self.stages_pallas:
            # Fused whole-BasicBlock Pallas kernels: the four stages run
            # from one int8 input read to one int8 output write per block
            # (ops/conv_pallas.py), eliminating the int32 conv-output HBM
            # round-trips that cap the XLA int8 trunk (BENCH_NOTES.md
            # stage-1 probe). Requires calibrated static scales.
            if self.quant_mode != "static":
                raise ValueError("stages_pallas requires quant_mode='static'")
            if train:
                raise ValueError("stages_pallas is inference-only")
            x_q, x_scale = x
            if (x_q.shape[1:] != (17, 17, 64)
                    or tuple(self.stage_sizes) != (2, 2, 2, 2)
                    or tuple(self.widths) != (64, 128, 256, 512)):
                raise ValueError(
                    "stages_pallas kernels are specialized to the standard "
                    "ResNet-18 trunk at 67x67 inputs (17x17x64 stem output); "
                    f"got {x_q.shape[1:]} / {self.stage_sizes} / {self.widths}")
            specs = []
            scale, cin = x_scale, self.widths[0]
            for stage, (n_blocks, width) in enumerate(
                    zip(self.stage_sizes, self.widths)):
                for block in range(n_blocks):
                    stride = 2 if (stage > 0 and block == 0) else 1
                    blk = BasicBlockPallas(
                        width, in_features=cin, stride=stride,
                        norm_eps=self.norm_eps,
                        name=f"layer{stage + 1}_{block}")
                    spec, scale = blk.folded(scale)
                    specs.append(spec)
                    cin = width
            if self.is_initializing():
                return jnp.zeros((x_q.shape[0], self.widths[-1]), jnp.float32)
            from ..ops.conv_pallas import trunk_features_int8

            return trunk_features_int8(x_q, specs)

        for stage, (n_blocks, width) in enumerate(zip(self.stage_sizes, self.widths)):
            for block in range(n_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = BasicBlock(width, stride=stride, dtype=self.dtype,
                               norm_eps=self.norm_eps,
                               quant_int8=self.quant_int8,
                               quant_mode=self.quant_mode,
                               name=f"layer{stage + 1}_{block}")(x, train=train)

        if self.quant_int8:
            x = x[0].astype(jnp.float32) * x[1]
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return x.astype(jnp.float32)

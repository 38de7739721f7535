"""The three VAD model families (Flax linen).

Capability parity with the reference heads, TPU layouts throughout:
- AudioVAD: (B,T,513) log-power frames -> 2xLSTM(1024) -> Dense(y_dim)
  logits per frame (sigmoid applied by callers), mirroring DeepVAD_audio
  (/root/reference/packages/models/Audio_Net.py:11-60).
- VideoVAD: (B,T,67,67) lip crops -> 3-channel repeat -> ResNet-18 over the
  flattened (B*T) frame batch -> (B,T,512) -> 2xLSTM(1024) -> Dense, with
  the `return_last` last-valid-step mode, mirroring DeepVAD_video
  (/root/reference/packages/models/Video_Net.py:12-117).
- AVVAD: video tower ("features" trunk, freezable) + audio passthrough,
  fused by concat (1025-d) or MCB(513,512->1024)+signed-sqrt+global-L2+
  BatchNorm, -> 2xLSTM(1024) -> Dense, mirroring DeepVAD_AV
  (/root/reference/packages/models/AV_Net.py:12-141).

Note the BatchNorm after MCB normalizes each channel over ALL (batch x
time) positions including padded frames — the reference's permute->
BatchNorm1d composition does exactly that (AV_Net.py:119-121); replicated
here for parity rather than corrected.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .lstm import LSTMStack, select_last
from .mcb import CompactBilinearPooling, global_l2_normalize, signed_sqrt
from .resnet import ResNet18


class AudioVAD(nn.Module):
    """setup-style (submodules are attributes) so streaming serving can
    apply the LSTM head with carried state (see avvad_tpu.serve)."""

    y_dim: int = 1
    lstm_hidden_size: int = 1024
    lstm_layers: int = 2
    dtype: jnp.dtype = jnp.float32
    use_pallas_lstm: bool = False
    lstm_state_quant: str = "none"  # Pallas inference: none | bf16 | int8
    dropout_rate: float = 0.0  # the reference defines Dropout(0.5) but
    # never enables it (Audio_Net.py:36,58); here it is a working option

    def setup(self):
        self.lstm_audio = LSTMStack(self.lstm_hidden_size, self.lstm_layers,
                                    state_quant=self.lstm_state_quant,
                                    dtype=self.dtype,
                                    use_pallas=self.use_pallas_lstm)
        self.dropout = nn.Dropout(self.dropout_rate)
        self.vad_audio = nn.Dense(self.y_dim)

    def __call__(self, audio: jax.Array, lengths: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        x = self.lstm_audio(audio)
        x = self.dropout(x, deterministic=not train or self.dropout_rate == 0.0)
        return self.vad_audio(x)

    def streaming_head(self, feats: jax.Array, carries):
        """One streaming block: (logits, new_carries)."""
        out, new_carries = self.lstm_audio(feats, carries=carries,
                                           return_carries=True)
        return self.vad_audio(out), new_carries


class RawAudioVAD(nn.Module):
    """Raw-waveform audio VAD: WaveNet encoder frontend -> LSTM -> Dense.

    The paper's raw-waveform branch, which the reference kept plumbed but
    commented out (Audio_Net.py:26-29,44 wires wavenet_autoencoder before
    the LSTM; the *WavLabeledFrames datasets exist for it). Here it is a
    first-class model: the encoder's adaptive pool re-times the waveform to
    the label frame rate (`out_frames` = the batch's padded frame count).
    """

    y_dim: int = 1
    lstm_hidden_size: int = 1024
    lstm_layers: int = 2
    out_frames: int = 128
    wavenet_kwargs: Optional[dict] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, waveform: jax.Array,
                 lengths: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        from .wavenet import WaveNetEncoder

        kw = dict(quantization_channels=1, residual_channels=32,
                  dilation_channels=32, bottleneck_width=64,
                  filter_width=3,
                  dilations=(1, 2, 4, 8, 16, 32, 64, 128, 256, 512))
        kw.update(self.wavenet_kwargs or {})
        enc = WaveNetEncoder(pool_kernel_size=self.out_frames,
                             dtype=self.dtype, name="wavenet_en", **kw)
        x = enc(waveform[..., None])  # (B, out_frames, bottleneck)
        x = LSTMStack(self.lstm_hidden_size, self.lstm_layers,
                      dtype=self.dtype, name="lstm_audio")(x)
        return nn.Dense(self.y_dim, name="vad_audio")(x)


class _VideoTower(nn.Module):
    """Grayscale (B,T,H,W) -> (B,T,512) ResNet features.

    The frame batch is flattened to (B*T, H, W, 3) so the convs see one
    large MXU-friendly batch (the hot loop of the whole framework).
    `remat=True` rematerializes the trunk in the backward pass, trading
    FLOPs for activation memory so bigger (B*T) frame batches fit HBM.

    `chunk`: inference-only activation-memory bound. When the flattened
    frame batch exceeds `chunk`, the trunk runs as a lax.scan over
    `chunk`-frame slices (params/batch_stats/quant broadcast, so the
    variable tree — and therefore checkpoints — are identical to the
    single-pass trunk, and compile time stays O(1) in the chunk count).
    Peak trunk activation memory is then set by `chunk`, not by B*T,
    which lifts the serving-batch OOM ceiling; per-frame MXU efficiency
    is preserved for chunks of a few thousand frames. Frames are
    row-independent through the trunk, so the float trunk is exact
    (~1e-6); the int8 trunk matches modulo occasional +-1-LSB rounding
    flips on quantization-boundary values (shape-dependent fusion order
    perturbs pre-quant activations by ~2e-7), bounded well inside the
    int8-vs-f32 noise floor. Ignored in training (BatchNorm batch stats
    must see the whole frame batch) and for non-static int8 modes
    (calibrate mutates the broadcast `quant` collection; dynamic's
    per-tensor scales would silently become per-chunk)."""

    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    gray_stem: bool = True  # exact: conv1(repeat(x,3)) == conv(x, sum_c W)
    quant_int8: bool = False  # W8A8 trunk convs (inference only)
    quant_mode: str = "dynamic"  # dynamic | calibrate | static
    stages_pallas: bool = False  # fused Pallas block kernels (static int8)
    stem_int8: bool = False  # W8A8 stem conv too (see resnet._StemInt8)
    chunk: int = 0  # frames per trunk pass; 0 = single pass
    chunk_unroll: bool = False  # python-loop chunks instead of lax.scan

    @nn.compact
    def __call__(self, video: jax.Array, train: bool = False) -> jax.Array:
        b, t, h, w = video.shape
        frames = video.reshape(b * t, h, w, 1)
        if not self.gray_stem:
            frames = jnp.repeat(frames, 3, axis=-1)  # replicate to RGB
        trunk_cls = nn.remat(ResNet18, static_argnums=(2,)) if self.remat \
            else ResNet18
        trunk = trunk_cls(dtype=self.dtype, gray_input=self.gray_stem,
                          quant_int8=self.quant_int8,
                          quant_mode=self.quant_mode,
                          stages_pallas=self.stages_pallas,
                          stem_int8=self.stem_int8,
                          name="features")
        n = b * t
        # int8 chunking only with STATIC scales: "calibrate" mutates the
        # quant collection (which the scan broadcasts), and "dynamic"
        # computes per-tensor max-abs scales that would silently become
        # per-CHUNK under the scan — a frame's quantization would depend
        # on which other frames share its chunk, voiding the documented
        # bounded-noise equivalence to the single-pass trunk.
        chunkable = (self.chunk and n > self.chunk and not train
                     and not (self.quant_int8 and self.quant_mode != "static"))
        if chunkable:
            c = self.chunk
            k = -(-n // c)  # ceil; pad rows are dropped after the scan
            fp = jnp.pad(frames, ((0, k * c - n),) + ((0, 0),) * 3)
            fp = fp.reshape((k, c) + fp.shape[1:])
            if self.chunk_unroll:
                # Unrolled chunks: the lax.scan above is loop-carried, so
                # XLA strictly serializes the trunk at chunk boundaries
                # (measured -18% at B=96, BENCH_NOTES). A python loop
                # emits k INDEPENDENT trunk subgraphs instead — the
                # scheduler may overlap them while (memory permitting)
                # still bounding live activations per chunk. Compile time
                # is O(k): only sensible for a handful of chunks.
                feats = jnp.concatenate(
                    [trunk(fp[i], False) for i in range(k)], axis=0)[:n]
            else:
                scan = nn.scan(
                    lambda mod, carry, x: (carry, mod(x, False)),
                    variable_broadcast=["params", "batch_stats", "quant"],
                    split_rngs={"params": False},
                    in_axes=0, out_axes=0)
                _, feats = scan(trunk, None, fp)
                feats = feats.reshape(k * c, -1)[:n]
        else:
            feats = trunk(frames, train)
        return feats.reshape(b, t, -1)


class VideoVAD(nn.Module):
    y_dim: int = 1
    lstm_hidden_size: int = 1024
    lstm_layers: int = 2
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    use_pallas_lstm: bool = False
    lstm_state_quant: str = "none"  # Pallas inference: none | bf16 | int8
    tower_int8: bool = False  # W8A8 trunk convs (inference only)
    tower_quant_mode: str = "dynamic"  # dynamic | calibrate | static
    tower_pallas: bool = False  # fused Pallas block kernels (static int8)
    tower_stem_int8: bool = False  # W8A8 stem conv too (resnet._StemInt8)
    tower_chunk: int = 0  # frames per trunk pass (see _VideoTower.chunk)
    tower_chunk_unroll: bool = False  # unrolled chunks (see _VideoTower)
    dropout_rate: float = 0.0  # defined-but-disabled in the reference

    def setup(self):
        # setup-style (attribute name == variable-tree key, identical to
        # the previous nn.compact names) so streaming serving can drive
        # tower + LSTM head with carried state, like AVVAD
        self.tower = _VideoTower(dtype=self.dtype, remat=self.remat,
                                 quant_int8=self.tower_int8,
                                 quant_mode=self.tower_quant_mode,
                                 stages_pallas=self.tower_pallas,
                                 stem_int8=self.tower_stem_int8,
                                 chunk=self.tower_chunk,
                                 chunk_unroll=self.tower_chunk_unroll)
        self.lstm_video = LSTMStack(self.lstm_hidden_size, self.lstm_layers,
                                    state_quant=self.lstm_state_quant,
                                    dtype=self.dtype,
                                    use_pallas=self.use_pallas_lstm)
        self.dropout = nn.Dropout(self.dropout_rate)
        self.vad_video = nn.Dense(self.y_dim)

    def __call__(self, video: jax.Array, lengths: Optional[jax.Array] = None,
                 train: bool = False, return_last: bool = False,
                 video_frame_indices: Optional[jax.Array] = None) -> jax.Array:
        """`video_frame_indices`: see AVVAD.__call__ — run the tower on
        unique source-rate frames and gather onto the label timeline."""
        x = self.tower(video, train=train)
        if video_frame_indices is not None:
            x = jnp.take(x, video_frame_indices, axis=1)
        x = self.lstm_video(x)
        if return_last:
            if lengths is None:
                raise ValueError("return_last requires lengths")
            x = select_last(x, lengths)
        x = self.dropout(x, deterministic=not train or self.dropout_rate == 0.0)
        return self.vad_video(x)

    def streaming_head(self, video: jax.Array, carries,
                       video_frame_indices: Optional[jax.Array] = None):
        """One streaming block: raw lip frames (N, Tc, 67, 67) ->
        (logits, new_carries). The tower is frame-local, so video-only
        streaming state is just the LSTM carries.

        `video_frame_indices` ((N, Tc) int32, per-stream): `video` holds
        unique camera-rate frames (N, S, 67, 67) and tower features are
        gathered onto the label timeline — see AVVAD.streaming_head."""
        x = self.tower(video, train=False)
        if video_frame_indices is not None:
            x = jnp.take_along_axis(
                x, video_frame_indices[:, :, None], axis=1)
        out, new_carries = self.lstm_video(x, carries=carries,
                                           return_carries=True)
        return self.vad_video(out), new_carries


class AVVAD(nn.Module):
    """Flagship audio-visual model (setup-style so streaming serving can
    drive the fusion + LSTM head with carried state)."""

    y_dim: int = 1
    lstm_hidden_size: int = 1024
    lstm_layers: int = 2
    use_mcb: bool = True
    mcb_output_size: int = 1024
    num_audio_features: int = 513
    num_video_features: int = 512
    eps: float = 1e-8
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    use_pallas_lstm: bool = False
    lstm_state_quant: str = "none"  # Pallas inference: none | bf16 | int8
    tower_int8: bool = False  # W8A8 trunk convs (inference only)
    tower_quant_mode: str = "dynamic"  # dynamic | calibrate | static
    tower_pallas: bool = False  # fused Pallas block kernels (static int8)
    tower_stem_int8: bool = False  # W8A8 stem conv too (resnet._StemInt8)
    tower_chunk: int = 0  # frames per trunk pass (see _VideoTower.chunk)
    tower_chunk_unroll: bool = False  # unrolled chunks (see _VideoTower)
    # MCB matmul precision. HIGHEST = 6-pass fp32 (parity default); DEFAULT
    # truncates inputs to bf16 — measured quality-neutral for serving (probs
    # shift < 1e-3; see BENCH_NOTES.md) at ~6x the MXU rate.
    mcb_precision: jax.lax.Precision = jax.lax.Precision.HIGHEST
    # Serving: store sketches pre-folded into the DFT bases so the constant
    # fold matmuls run once on the host, not in every step. Convert loaded
    # checkpoints with mcb.fold_sketch_collection (identical math).
    mcb_folded_vars: bool = False
    dropout_rate: float = 0.0  # reference Dropout(0.05), never enabled

    def setup(self):
        self.tower = _VideoTower(dtype=self.dtype, remat=self.remat,
                                 quant_int8=self.tower_int8,
                                 quant_mode=self.tower_quant_mode,
                                 stages_pallas=self.tower_pallas,
                                 stem_int8=self.tower_stem_int8,
                                 chunk=self.tower_chunk,
                                 chunk_unroll=self.tower_chunk_unroll)
        if self.use_mcb:
            self.mcb = CompactBilinearPooling(
                self.num_audio_features, self.num_video_features,
                self.mcb_output_size, precision=self.mcb_precision,
                folded_vars=self.mcb_folded_vars)
            # use_fast_variance=False: the default E[x^2]-E[x]^2 formula can
            # come out slightly NEGATIVE for near-constant channels, and
            # this BN runs with the reference's tiny eps (1e-8, vs the
            # trunk's 1e-5), so sqrt(var+eps) would NaN. The two-pass
            # E[(x-mean)^2] is non-negative by construction.
            self.mcb_bn = nn.BatchNorm(momentum=0.9, epsilon=self.eps,
                                       axis=-1, use_fast_variance=False)
        self.lstm_merged = LSTMStack(self.lstm_hidden_size, self.lstm_layers,
                                     state_quant=self.lstm_state_quant,
                                     dtype=self.dtype,
                                     use_pallas=self.use_pallas_lstm)
        self.dropout = nn.Dropout(self.dropout_rate)
        self.vad_merged = nn.Dense(self.y_dim)

    def _fuse(self, audio: jax.Array, v: jax.Array, train: bool,
              per_sample_norm: bool = False) -> jax.Array:
        if self.use_mcb:
            y = self.mcb(audio, v)
            y = signed_sqrt(y, self.eps)
            # per_sample_norm: L2 over each batch row only, so independent
            # streams batched through one step do not couple (matches a
            # solo run, where the "whole tensor" is that one stream)
            y = global_l2_normalize(
                y, axes=tuple(range(1, y.ndim)) if per_sample_norm else None)
            # BatchNorm over every (batch, time) position per channel
            return self.mcb_bn(y, use_running_average=not train)
        return jnp.concatenate([audio, v], axis=-1)

    def __call__(self, audio: jax.Array, video: jax.Array,
                 lengths: Optional[jax.Array] = None,
                 train: bool = False,
                 video_frame_indices: Optional[jax.Array] = None) -> jax.Array:
        """With `video_frame_indices` ((T,) int, one entry per audio frame),
        `video` holds UNIQUE source-rate frames (e.g. the camera's 30 fps,
        (B, T_src, H, W)) and tower features are gathered onto the audio
        timeline afterwards. The 62.5 fps timeline is produced from 30 fps
        by frame DUPLICATION (the ffmpeg fps-filter schedule,
        processing.video.fps_resample_indices), so the offline pipeline's
        pre-upsampled video makes the tower recompute every duplicate
        (~2.08x the unique frames); computing on unique frames + gathering
        is bit-identical and cuts tower FLOPs ~52%."""
        v = self.tower(video, train=train)
        if video_frame_indices is not None:
            v = jnp.take(v, video_frame_indices, axis=1)
        y = self._fuse(audio, v, train)
        y = self.lstm_merged(y)
        y = self.dropout(y, deterministic=not train or self.dropout_rate == 0.0)
        return self.vad_merged(y)

    def streaming_head(self, audio_feats: jax.Array, video: jax.Array,
                       carries, per_stream_norm: bool = False,
                       video_frame_indices: Optional[jax.Array] = None):
        """One streaming block: normalized audio features (N, Tc, 513) +
        raw video frames (N, Tc, 67, 67) -> (logits, new_carries).

        With `video_frame_indices` ((N, Tc) int32, per-stream), `video`
        holds UNIQUE camera-rate source frames (N, S, 67, 67) and tower
        features are gathered per stream onto the audio timeline — the
        streaming counterpart of __call__'s unique-frame serving layout
        (each stream carries its own resample phase, hence per-row
        indices; processing.video.fps_block_schedule).

        Streaming caveat: the MCB path's global L2 norm is computed per
        block rather than per utterance (inherent to causality, like the
        running-peak audio normalization). `per_stream_norm`: compute that
        norm per batch row — required when N > 1 rows are independent
        streams (MultiStreamAVVAD), so no cross-stream coupling."""
        v = self.tower(video, train=False)
        if video_frame_indices is not None:
            v = jnp.take_along_axis(
                v, video_frame_indices[:, :, None], axis=1)
        y = self._fuse(audio_feats, v, train=False,
                       per_sample_norm=per_stream_norm)
        out, new_carries = self.lstm_merged(y, carries=carries,
                                            return_carries=True)
        return self.vad_merged(out), new_carries


def video_trunk_filter(path: tuple, _value) -> bool:
    """Trainability filter: False for the frozen ResNet trunk params.

    The reference freezes every parameter under the 'features' module after
    loading the pretrained video net (train_AV_net.py:241-245)."""
    return "features" not in path

"""Whole-model logit parity against the ACTUAL reference torch models.

VERDICT r1 item 2: per-module oracles pin pieces, but nothing ever ran the
reference's own nn.Modules end-to-end against ours. Here the reference
classes (/root/reference/packages/models/{Audio_Net,Video_Net,AV_Net}.py)
are instantiated on torch-cpu with random weights (torchvision is absent,
so a from-scratch torch ResNet-18 oracle stands in for
`models.resnet18`; torch>=1.8 lacks torch.rfft, so legacy FFT shims are
installed — see tests/torch_oracles.py), their state dicts migrated with
avvad_tpu.utils.torch_import, and logits compared frame-for-frame.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from torch_oracles import (  # noqa: E402
    add_reference_to_path,
    install_fake_torchvision,
    install_legacy_torch_shims,
    randomize_batchnorms,
    state_dict_numpy,
)

add_reference_to_path()
install_fake_torchvision()


def _fixture_log_power_batch(fixture_dir, n_utt=2, max_t=80):
    """Real subset log-power features, padded to a batch (B, T, 513)."""
    import os

    from avvad_tpu.processing import read_wav, stft
    from avvad_tpu.processing.audio_io import peak_normalize

    clean = os.path.join(fixture_dir, "processed/ntcd_timit/Clean/train/01M")
    wavs = sorted(w for w in os.listdir(clean) if w.endswith(".wav"))[:n_utt]
    feats = []
    for w in wavs:
        x, fs = read_wav(os.path.join(clean, w))
        S = stft(peak_normalize(x))
        f = np.log(np.abs(S).T ** 2 + 1e-8)[:max_t]
        feats.append(f.astype(np.float32))
    lengths = np.array([f.shape[0] for f in feats], dtype=np.int64)
    T = int(lengths.max())
    batch = np.zeros((len(feats), T, 513), dtype=np.float32)
    for i, f in enumerate(feats):
        batch[i, : f.shape[0]] = f
    # standardize like the train pipeline (train_AV_net.py:286-291)
    batch = (batch - batch.mean()) / (batch.std() + 1e-8)
    return batch, lengths


def _assert_valid_frames_close(ours, ref, lengths, atol):
    for b, L in enumerate(lengths):
        np.testing.assert_allclose(ours[b, :L], ref[b, :L], atol=atol,
                                   err_msg=f"sequence {b} (len {L})")


def test_audio_vad_end_to_end_logits(ref_subset):
    """DeepVAD_audio (torch, random init) vs migrated AudioVAD on real
    subset log-power inputs: logits agree frame-for-frame."""
    from packages.models.Audio_Net import DeepVAD_audio

    from avvad_tpu.models import AudioVAD
    from avvad_tpu.utils import import_reference_audio_vad

    torch.manual_seed(0)
    ref = DeepVAD_audio(lstm_layers=2, lstm_hidden_size=1024, y_dim=1)
    ref.eval()

    x, lengths = _fixture_log_power_batch(ref_subset)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x),
                      torch.from_numpy(lengths)).numpy()

    model = AudioVAD(y_dim=1, lstm_hidden_size=1024, lstm_layers=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)))
    variables = import_reference_audio_vad(state_dict_numpy(ref), variables)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))

    assert ours.shape == ref_out.shape
    _assert_valid_frames_close(ours, ref_out, lengths, atol=1e-5)


def test_mcb_module_parity(monkeypatch):
    """The reference CompactBilinearPooling (count sketch + rFFT conv,
    via legacy-FFT shims) vs our sketch-matmul + real-DFT formulation,
    with the reference's own h/s buffers migrated."""
    install_legacy_torch_shims(monkeypatch)
    from packages.models.compact_bilinear_pooling import (
        CompactBilinearPooling as RefMCB,
    )

    from avvad_tpu.models.mcb import (
        CompactBilinearPooling,
        sketch_matrix_from_hs,
    )

    torch.manual_seed(1)
    d1, d2, out = 513, 512, 1024
    ref = RefMCB(d1, d2, out)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 7, d1)).astype(np.float32)
    y = rng.normal(size=(3, 7, d2)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(y)).numpy()

    m = CompactBilinearPooling(d1, d2, out)
    sketch = {
        "sketch1": jnp.asarray(sketch_matrix_from_hs(
            ref.sketch1.h.numpy(), ref.sketch1.s.numpy(), out)),
        "sketch2": jnp.asarray(sketch_matrix_from_hs(
            ref.sketch2.h.numpy(), ref.sketch2.s.numpy(), out)),
    }
    ours = np.asarray(m.apply({"sketch": sketch}, jnp.asarray(x),
                              jnp.asarray(y)))
    np.testing.assert_allclose(ours, ref_out, atol=2e-3, rtol=1e-4)


def test_video_vad_end_to_end_logits():
    """DeepVAD_video (torch, fake-torchvision ResNet-18 oracle, randomized
    BN stats) vs migrated VideoVAD: logits agree frame-for-frame."""
    from packages.models.Video_Net import DeepVAD_video

    from avvad_tpu.models import VideoVAD
    from avvad_tpu.utils import import_reference_video_vad

    torch.manual_seed(2)
    rng = np.random.default_rng(2)
    ref = DeepVAD_video(lstm_layers=2, lstm_hidden_size=128, y_dim=1)
    randomize_batchnorms(ref, rng)
    ref.eval()

    b, t = 2, 6
    video = rng.normal(size=(b, t, 67, 67)).astype(np.float32)
    lengths = np.array([t, t - 2], dtype=np.int64)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(video),
                      torch.from_numpy(lengths)).numpy()

    model = VideoVAD(y_dim=1, lstm_hidden_size=128, lstm_layers=2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 2, 67, 67)))
    variables = import_reference_video_vad(state_dict_numpy(ref), variables)
    ours = np.asarray(model.apply(variables, jnp.asarray(video),
                                  train=False))
    assert ours.shape == ref_out.shape
    _assert_valid_frames_close(ours, ref_out, lengths, atol=5e-4)

    # return_last mode (method3 last-valid-step extraction)
    with torch.no_grad():
        ref_last = ref(torch.from_numpy(video), torch.from_numpy(lengths),
                       return_last=True).numpy()
    ours_last = np.asarray(model.apply(
        variables, jnp.asarray(video), lengths=jnp.asarray(lengths),
        return_last=True))
    np.testing.assert_allclose(ours_last, ref_last, atol=5e-4)


@pytest.mark.parametrize("use_mcb", [False, True])
def test_av_vad_end_to_end_logits(monkeypatch, use_mcb, ref_subset):
    """The flagship: DeepVAD_AV (torch; ResNet-18 oracle + legacy-FFT
    shims; randomized BN stats) vs migrated AVVAD, both fusion modes,
    on real subset log-power audio."""
    install_legacy_torch_shims(monkeypatch)
    from packages.models.AV_Net import DeepVAD_AV

    from avvad_tpu.models import AVVAD
    from avvad_tpu.utils import import_reference_avvad

    torch.manual_seed(3)
    rng = np.random.default_rng(3)
    ref = DeepVAD_AV(lstm_layers=2, lstm_hidden_size=128, y_dim=1,
                     use_mcb=use_mcb)
    randomize_batchnorms(ref, rng)
    ref.eval()

    audio, lengths = _fixture_log_power_batch(ref_subset, n_utt=2,
                                              max_t=6)
    b, t = audio.shape[:2]
    video = rng.normal(size=(b, t, 67, 67)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(audio), torch.from_numpy(video),
                      torch.from_numpy(lengths)).numpy()

    model = AVVAD(y_dim=1, lstm_hidden_size=128, lstm_layers=2,
                  use_mcb=use_mcb)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 513)),
                           jnp.zeros((1, 2, 67, 67)))
    variables = import_reference_avvad(state_dict_numpy(ref), model,
                                       variables)
    ours = np.asarray(model.apply(variables, jnp.asarray(audio),
                                  jnp.asarray(video), train=False))
    assert ours.shape == ref_out.shape
    _assert_valid_frames_close(ours, ref_out, lengths, atol=1e-3)

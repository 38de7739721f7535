#!/usr/bin/env python
"""Generate the committed torch golden fixtures (one-time, needs torch).

For each reference model family (DeepVAD_audio / DeepVAD_video /
DeepVAD_AV x {concat, MCB} — /root/reference/packages/models/), this:
1. instantiates the ACTUAL reference nn.Module (with the torchvision /
   legacy-FFT shims from tests/torch_oracles.py),
2. overwrites every float tensor with the deterministic synthesis from
   tests/golden_fixture_lib.py (so tests can rebuild the identical
   weights without torch),
3. computes reference logits on fixed inputs (real subset log-power
   audio where the family consumes audio),
4. writes tests/fixtures/torch_golden_<family>.npz holding the
   (key, shape, dtype) manifest, integer buffers verbatim (MCB sketch
   h/s, num_batches_tracked), the inputs, and the logits.

tests/test_torch_golden_fixture.py then replays parity torch-free.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np
import torch

from golden_fixture_lib import save_fixture, synth_state_dict
from torch_oracles import add_reference_to_path, install_fake_torchvision

add_reference_to_path()
install_fake_torchvision()

FIXDIR = os.path.join(REPO, "tests", "fixtures")


def _manifest_and_stored(module):
    manifest, stored = [], {}
    for key, t in module.state_dict().items():
        arr = t.detach().cpu().numpy()
        manifest.append([key, list(arr.shape), str(arr.dtype)])
        if arr.dtype.kind in "iu":
            stored[key] = arr
    return manifest, stored


def _load_synth(module, manifest, seed, stored):
    state = synth_state_dict(manifest, seed, stored)
    module.load_state_dict({k: torch.from_numpy(np.asarray(v))
                            for k, v in state.items()})
    module.eval()


def _fixture_audio(n_utt=2, max_t=80):
    from avvad_tpu.processing import read_wav, stft
    from avvad_tpu.processing.audio_io import peak_normalize

    clean = "/root/reference/data/subset/processed/ntcd_timit/Clean/train/01M"
    wavs = sorted(w for w in os.listdir(clean) if w.endswith(".wav"))[:n_utt]
    feats = []
    for w in wavs:
        x, fs = read_wav(os.path.join(clean, w))
        S = stft(peak_normalize(x))
        feats.append(np.log(np.abs(S).T ** 2 + 1e-8)[:max_t]
                     .astype(np.float32))
    lengths = np.array([f.shape[0] for f in feats], dtype=np.int64)
    batch = np.zeros((len(feats), int(lengths.max()), 513), np.float32)
    for i, f in enumerate(feats):
        batch[i, : f.shape[0]] = f
    batch = (batch - batch.mean()) / (batch.std() + 1e-8)
    return batch, lengths


def main():
    os.makedirs(FIXDIR, exist_ok=True)
    from duel_reference import install_legacy_fft

    install_legacy_fft()  # script-friendly torch.rfft/irfft/addcmul shims
    from packages.models.Audio_Net import DeepVAD_audio
    from packages.models.AV_Net import DeepVAD_AV
    from packages.models.Video_Net import DeepVAD_video

    audio, lengths = _fixture_audio()
    rng = np.random.default_rng(99)

    # --- audio ---
    ref = DeepVAD_audio(lstm_layers=2, lstm_hidden_size=128, y_dim=1)
    manifest, stored = _manifest_and_stored(ref)
    _load_synth(ref, manifest, 101, stored)
    with torch.no_grad():
        logits = ref(torch.from_numpy(audio),
                     torch.from_numpy(lengths)).numpy()
    save_fixture(os.path.join(FIXDIR, "torch_golden_audio.npz"),
                 manifest, 101, stored,
                 {"audio": audio, "lengths": lengths, "logits": logits})
    print("audio:", logits.shape, float(np.abs(logits).max()))

    # --- video ---
    ref = DeepVAD_video(lstm_layers=2, lstm_hidden_size=128, y_dim=1)
    manifest, stored = _manifest_and_stored(ref)
    _load_synth(ref, manifest, 102, stored)
    b, t = 2, 6
    video = rng.normal(size=(b, t, 67, 67)).astype(np.float32)
    vlengths = np.array([t, t - 2], dtype=np.int64)
    with torch.no_grad():
        logits = ref(torch.from_numpy(video),
                     torch.from_numpy(vlengths)).numpy()
        last = ref(torch.from_numpy(video), torch.from_numpy(vlengths),
                   return_last=True).numpy()
    save_fixture(os.path.join(FIXDIR, "torch_golden_video.npz"),
                 manifest, 102, stored,
                 {"video": video, "lengths": vlengths, "logits": logits,
                  "logits_last": last})
    print("video:", logits.shape, float(np.abs(logits).max()))

    # --- AV (both fusion modes) ---
    a6, l6 = _fixture_audio(n_utt=2, max_t=6)
    for use_mcb, name, seed in ((False, "av_concat", 103),
                                (True, "av_mcb", 104)):
        ref = DeepVAD_AV(lstm_layers=2, lstm_hidden_size=128, y_dim=1,
                         use_mcb=use_mcb, eps=1e-8)
        manifest, stored = _manifest_and_stored(ref)
        _load_synth(ref, manifest, seed, stored)
        video = rng.normal(size=(a6.shape[0], a6.shape[1], 67, 67)) \
            .astype(np.float32)
        with torch.no_grad():
            logits = ref(torch.from_numpy(a6), torch.from_numpy(video),
                         torch.from_numpy(l6)).numpy()
        save_fixture(os.path.join(FIXDIR, f"torch_golden_{name}.npz"),
                     manifest, seed, stored,
                     {"audio": a6, "video": video, "lengths": l6,
                      "logits": logits,
                      "use_mcb": np.int64(int(use_mcb))})
        print(f"{name}:", logits.shape, float(np.abs(logits).max()))

    sizes = {f: os.path.getsize(os.path.join(FIXDIR, f)) // 1024
             for f in sorted(os.listdir(FIXDIR)) if f.startswith("torch_")}
    print(json.dumps(sizes))


if __name__ == "__main__":
    main()

"""Reference-model parity as a pure-data golden test (no torch needed).

tests/test_torch_reference_parity.py instantiates the actual reference
nn.Modules, which requires torch at test time. These tests replay the
same whole-model logit comparison from committed fixtures
(tests/fixtures/torch_golden_*.npz, generated once by
scripts/make_torch_golden.py from the real reference modules): the
float weights are re-synthesized deterministically by
golden_fixture_lib.synth_state_dict — identical to what was loaded into
torch at generation time — migrated through avvad_tpu.utils.torch_import,
and the Flax logits are pinned against the recorded torch logits.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golden_fixture_lib import load_fixture

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "fixtures")


def _fixture(name):
    path = os.path.join(FIXDIR, f"torch_golden_{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"{path} not generated")
    return load_fixture(path)


def _assert_valid_frames_close(ours, ref, lengths, atol):
    for b, L in enumerate(lengths):
        np.testing.assert_allclose(ours[b, :L], ref[b, :L], atol=atol,
                                   err_msg=f"sequence {b} (len {L})")


def test_audio_golden():
    from avvad_tpu.models import AudioVAD
    from avvad_tpu.utils import import_reference_audio_vad

    state, arr = _fixture("audio")
    model = AudioVAD(y_dim=1, lstm_hidden_size=128, lstm_layers=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)))
    variables = import_reference_audio_vad(state, variables)
    ours = np.asarray(model.apply(variables, jnp.asarray(arr["audio"])))
    assert ours.shape == arr["logits"].shape
    _assert_valid_frames_close(ours, arr["logits"], arr["lengths"],
                               atol=1e-5)


def test_video_golden():
    from avvad_tpu.models import VideoVAD
    from avvad_tpu.utils import import_reference_video_vad

    state, arr = _fixture("video")
    model = VideoVAD(y_dim=1, lstm_hidden_size=128, lstm_layers=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 67, 67)))
    variables = import_reference_video_vad(state, variables)
    ours = np.asarray(model.apply(variables, jnp.asarray(arr["video"]),
                                  train=False))
    assert ours.shape == arr["logits"].shape
    _assert_valid_frames_close(ours, arr["logits"], arr["lengths"],
                               atol=5e-4)
    ours_last = np.asarray(model.apply(
        variables, jnp.asarray(arr["video"]),
        lengths=jnp.asarray(arr["lengths"]), return_last=True))
    np.testing.assert_allclose(ours_last, arr["logits_last"], atol=5e-4)


@pytest.mark.parametrize("name", ["av_concat", "av_mcb"])
def test_av_golden(name):
    from avvad_tpu.models import AVVAD
    from avvad_tpu.utils import import_reference_avvad

    state, arr = _fixture(name)
    model = AVVAD(y_dim=1, lstm_hidden_size=128, lstm_layers=2,
                  use_mcb=bool(arr["use_mcb"]))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 513)),
                           jnp.zeros((1, 2, 67, 67)))
    variables = import_reference_avvad(state, model, variables)
    ours = np.asarray(model.apply(variables, jnp.asarray(arr["audio"]),
                                  jnp.asarray(arr["video"]), train=False))
    assert ours.shape == arr["logits"].shape
    _assert_valid_frames_close(ours, arr["logits"], arr["lengths"],
                               atol=1e-3)

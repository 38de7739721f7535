"""Evaluation stack tests: predict->write->score round trip, stats math."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avvad_tpu.data import AudioSequenceSource
from avvad_tpu.evaluate import (
    compute_stats,
    energy_ratios,
    evaluate_split,
    mean_confidence_interval,
    prediction_paths,
    score_split,
)
from avvad_tpu.models import AudioVAD
from avvad_tpu.train import create_train_state


@pytest.fixture(scope="module")
def root(ref_subset):
    return os.path.join(ref_subset, "processed/")


def test_mean_confidence_interval_matches_reference_formula():
    import scipy.stats

    data = [0.5, 0.7, 0.9, 0.6]
    m, h = mean_confidence_interval(data, 0.95)
    a = np.array(data)
    se = scipy.stats.sem(a)
    h_ref = se * scipy.stats.t.ppf(0.975, len(a) - 1)
    assert m == round(float(np.mean(a)), 3)
    assert h == round(float(h_ref), 3)


def test_energy_ratios_on_known_mixture():
    rng = np.random.default_rng(0)
    s = rng.normal(size=1000)
    n = rng.normal(size=1000)
    # s_hat = clean + small noise: SI-SDR should be strongly positive
    si_sdr, si_sir, si_sar = energy_ratios(s + 0.01 * n, s, n)
    assert si_sdr > 20
    assert si_sir > 20
    # perfect reconstruction of target component: SAR large
    assert si_sar > 20


def test_compute_stats_grouping(tmp_path, capsys):
    rows = [[0.9, 0.8], [0.7, 0.6], [0.5, 0.4], [0.3, 0.2]]
    stats = compute_stats(
        ("accuracy", "f1"), rows, model_data_dir=str(tmp_path),
        all_snr_db=np.asarray([-5.0, -5.0, 0.0, 0.0]),
        all_noise_types=["Babble", "Cafe", "Babble", "Cafe"],
        all_speakers=["a", "a", "b", "b"],
    )
    out = capsys.readouterr().out
    assert "METRIC" in out and "Noise type = Babble" in out
    assert stats["overall"]["accuracy"]["avg"] == 0.6
    assert stats["by_snr_db"]["-5.0"]["accuracy"]["avg"] == pytest.approx(0.8)
    assert stats["by_noise_type"]["Babble"]["f1"]["avg"] == pytest.approx(0.6)
    assert os.path.exists(tmp_path / "stats.json")


def test_predict_score_roundtrip(root, tmp_path):
    """Full L4 flow on the subset test split: classify -> write .npy ->
    per-utterance metrics -> grouped stats."""
    src = AudioSequenceSource(root, "test", "subset", "vad_labels", upsampled=False)
    assert len(src) == 3

    model = AudioVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=1)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (jnp.zeros((1, 32, 513)),))
    classif_dir = str(tmp_path / "classif") + os.sep

    report = evaluate_split(state, src, "audio", classif_dir, batch_size=2,
                            bucket=64, verbose=False)
    assert report["n_utterances"] == 3
    assert report["rt_factor"] > 0

    # every utterance got hard+soft files with the right length
    for i in range(len(src)):
        hard, soft = prediction_paths(classif_dir, src.rel_path(i))
        assert os.path.exists(hard) and os.path.exists(soft)
        y_hard = np.load(hard)
        assert y_hard.shape[0] == src[i]["length"]
        assert set(np.unique(y_hard)).issubset({0, 1})

    stats = score_split(src, root, classif_dir, verbose=False)
    assert "overall" in stats and "by_noise_type" in stats
    assert 0.0 <= stats["overall"]["accuracy"]["avg"] <= 1.0


def test_planned_bucket_shapes_match_iteration(root):
    """The pre-warm shape plan (header-only length probes) is exactly the
    set of padded lengths the loader produces."""
    from avvad_tpu.data import DataLoader
    from avvad_tpu.evaluate import planned_bucket_shapes

    src = AudioSequenceSource(root, "test", "subset", "vad_labels", upsampled=False)
    loader = DataLoader(src, batch_size=2, shuffle=False, bucket=64,
                        bucket_ladder=True, pad_batch_to_full=True,
                        sort_pool_factor=4)
    shapes = planned_bucket_shapes(loader)
    assert shapes  # subset test split is non-empty
    seen = {b.max_frames for b in loader}
    assert seen == set(shapes)


@pytest.mark.slow
def test_prewarm_output_parity(root, tmp_path):
    """prewarm=True AOT-compiles exactly the planned bucket shapes and
    writes bit-identical predictions to the lazy-jit path."""
    from avvad_tpu.data import DataLoader
    from avvad_tpu.evaluate import planned_bucket_shapes, prewarm_predict
    from avvad_tpu.train.steps import make_predict_step

    src = AudioSequenceSource(root, "test", "subset", "vad_labels", upsampled=False)
    model = AudioVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=1)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (jnp.zeros((1, 32, 513)),))

    loader = DataLoader(src, batch_size=2, shuffle=False, bucket=64,
                        bucket_ladder=True, pad_batch_to_full=True,
                        sort_pool_factor=4)
    shapes = planned_bucket_shapes(loader)
    predict = make_predict_step("audio")
    compiled = prewarm_predict(predict, state, loader, None)
    assert set(compiled) == {(2, t) for t in shapes}
    # a compiled executable agrees with the jit path on a real batch
    batch = next(iter(loader))
    got = compiled[(batch.batch_size, batch.max_frames)](state, batch, None)
    want = predict(state, batch, None)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    cold_dir = str(tmp_path / "cold") + os.sep
    warm_dir = str(tmp_path / "warm") + os.sep
    evaluate_split(state, src, "audio", cold_dir, batch_size=2, bucket=64,
                   verbose=False)
    report = evaluate_split(state, src, "audio", warm_dir, batch_size=2,
                            bucket=64, prewarm=True, verbose=False)
    assert report["prewarmed_shapes"] == len(shapes)
    assert report["prewarm_s"] > 0
    for i in range(len(src)):
        _, soft_cold = prediction_paths(cold_dir, src.rel_path(i))
        _, soft_warm = prediction_paths(warm_dir, src.rel_path(i))
        np.testing.assert_array_equal(np.load(soft_cold), np.load(soft_warm))


def test_visualization_figures(root, tmp_path):
    from avvad_tpu.processing import read_wav, stft
    from avvad_tpu.processing.audio_io import peak_normalize
    from avvad_tpu.visualization import (
        amplitude_to_db,
        display_multiple_signals,
        display_wav_spectro_mask,
    )

    wav = os.path.join(root, "ntcd_timit/Clean/test/34M/sa1.wav")
    x, fs = read_wav(wav)
    x = peak_normalize(x)
    s = stft(x, fs=fs)
    mask = (np.abs(s) > np.abs(s).mean()).astype(np.float32)

    db = amplitude_to_db(np.abs(s))
    assert db.max() == 0.0 and db.min() >= -80.0

    fig = display_wav_spectro_mask(x, s, mask, fs=fs)
    out = tmp_path / "fig.png"
    fig.savefig(out)
    assert out.stat().st_size > 10_000

    fig2 = display_multiple_signals([[x, s, mask], [x, s, None]], fs=fs,
                                    last_only_label=True)
    out2 = tmp_path / "fig2.png"
    fig2.savefig(out2)
    assert out2.stat().st_size > 10_000

    import matplotlib.pyplot as plt

    plt.close("all")


def test_roc_auc_known_values():
    from avvad_tpu.evaluate import roc_auc

    y = np.array([0, 0, 1, 1])
    assert roc_auc(y, np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert roc_auc(y, np.array([0.9, 0.8, 0.2, 0.1])) == 0.0
    assert roc_auc(y, np.array([0.5, 0.5, 0.5, 0.5])) == 0.5
    # vs sklearn-style hand check with ties
    scores = np.array([0.3, 0.5, 0.5, 0.7])
    assert abs(roc_auc(y, scores) - 0.875) < 1e-9
    assert np.isnan(roc_auc(np.zeros(4), scores))


def test_evaluate_split_with_mesh(root, tmp_path):
    """Mesh-sharded evaluation writes the same predictions as single-device."""
    from avvad_tpu.parallel import make_mesh

    src = AudioSequenceSource(root, "test", "subset", "vad_labels", upsampled=False)
    model = AudioVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=1)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (jnp.zeros((1, 32, 513)),))

    single_dir = str(tmp_path / "single") + os.sep
    evaluate_split(state, src, "audio", single_dir, batch_size=8,
                   bucket=64, verbose=False)

    mesh = make_mesh(n_data=8, n_model=1)
    mesh_dir = str(tmp_path / "mesh") + os.sep
    evaluate_split(state, src, "audio", mesh_dir, batch_size=8,
                   bucket=64, verbose=False, mesh=mesh)

    for i in range(len(src)):
        _, soft_s = prediction_paths(single_dir, src.rel_path(i))
        _, soft_m = prediction_paths(mesh_dir, src.rel_path(i))
        np.testing.assert_allclose(np.load(soft_m), np.load(soft_s),
                                   atol=1e-5)


def test_display_multiple_spectro(root, tmp_path):
    from avvad_tpu.processing import read_wav, stft
    from avvad_tpu.visualization import display_multiple_spectro

    x, fs = read_wav(os.path.join(root, "ntcd_timit/Clean/test/34M/sa2.wav"))
    psd = np.abs(stft(x, fs=fs)) ** 2
    fig = display_multiple_spectro([[x, psd], [None, psd]], fs=fs)
    out = tmp_path / "spectro.png"
    fig.savefig(out)
    assert out.stat().st_size > 10_000
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_score_split_parallel_matches_serial(root, tmp_path):
    src = AudioSequenceSource(root, "test", "subset", "vad_labels", upsampled=False)
    model = AudioVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=1)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (jnp.zeros((1, 32, 513)),))
    d = str(tmp_path / "p") + os.sep
    evaluate_split(state, src, "audio", d, batch_size=2, bucket=64,
                   verbose=False)
    serial = score_split(src, root, d, verbose=False, save_stats=False)
    parallel = score_split(src, root, d, verbose=False, save_stats=False,
                           max_workers=4)
    assert serial["overall"] == parallel["overall"]


def test_score_video_split(root, tmp_path):
    """matlab_raw-keyed scoring (reconstruct.py layout) with speaker groups."""
    from avvad_tpu.data import VideoSequenceSource
    from avvad_tpu.evaluate import score_video_split
    from avvad_tpu.evaluate.predict import write_predictions

    src = VideoSequenceSource(root, "validation", "vad_labels", upsampled=True)
    d = str(tmp_path / "vp") + os.sep
    rng = np.random.default_rng(0)
    for i in range(len(src)):
        t = src[i]["length"]
        write_predictions(d, src.rel_path(i), rng.random(t).astype(np.float32))
    stats = score_video_split(src, root, d, verbose=False)
    assert "by_speaker" in stats and "08F" in stats["by_speaker"]
    assert 0.0 <= stats["overall"]["accuracy"]["avg"] <= 1.0


@pytest.mark.slow
def test_calibrate_quant_scales_and_static_eval(root, tmp_path):
    """int8 serving flow on real fixture data: calibrate activation scales
    on the train split, then evaluate the test split with the static
    int8-resident tower (models/quantize.py; evaluate.py --tower-int8
    --tower-quant-mode static)."""
    from avvad_tpu.data import AudioVisualSource
    from avvad_tpu.evaluate import calibrate_quant_scales
    from avvad_tpu.models import AVVAD

    kw = dict(y_dim=1, lstm_hidden_size=16, lstm_layers=1, use_mcb=False)
    model = AVVAD(**kw, tower_int8=True, tower_quant_mode="static")
    example = (jnp.zeros((1, 8, 513)), jnp.zeros((1, 8, 67, 67)))
    state = create_train_state(model, jax.random.PRNGKey(0), example)
    assert state.quant is not None  # init creates the collection

    cal_src = AudioVisualSource(root, "train", "subset", "vad_labels",
                                upsampled=False, video_variant="upsampled")
    state = calibrate_quant_scales(state, model, cal_src, "av", n_utts=1,
                                   batch_size=1, bucket=64)
    scales = np.asarray(jax.tree_util.tree_leaves(state.quant))
    assert (scales > 0).all()  # every quant point saw data

    src = AudioVisualSource(root, "test", "subset", "vad_labels",
                            upsampled=False, video_variant="upsampled")
    classif_dir = str(tmp_path / "classif_q") + os.sep
    report = evaluate_split(state, src, "av", classif_dir, batch_size=1,
                            bucket=64, verbose=False)
    assert report["n_utterances"] == len(src)
    for i in range(len(src)):
        _, soft = prediction_paths(classif_dir, src.rel_path(i))
        y = np.load(soft)
        assert np.isfinite(y).all() and (0 <= y).all() and (y <= 1).all()


def test_bucket_ladder_predictions_identical(root, tmp_path):
    """The geometric bucket ladder only changes trailing padding, and
    eval-mode forwards are trailing-pad-invariant (causal LSTM scan,
    per-frame heads) — so predictions must match linear bucketing."""
    src = AudioSequenceSource(root, "test", "subset", "vad_labels",
                              upsampled=False)
    model = AudioVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=1)
    state = create_train_state(model, jax.random.PRNGKey(1),
                               (jnp.zeros((1, 32, 513)),))

    dirs = {}
    for name, ladder in (("linear", False), ("ladder", True)):
        d = str(tmp_path / name) + os.sep
        evaluate_split(state, src, "audio", d, batch_size=2, bucket=32,
                       bucket_ladder=ladder, verbose=False)
        dirs[name] = d

    for i in range(len(src)):
        for which in (0, 1):  # hard, soft
            a = np.load(prediction_paths(dirs["linear"], src.rel_path(i))[which])
            b = np.load(prediction_paths(dirs["ladder"], src.rel_path(i))[which])
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)

"""Typed config system: defaults match the reference constants; YAML I/O."""

import pytest

from avvad_tpu.config import (
    Config,
    LabelConfig,
    STFTConfig,
    from_yaml,
    load_yaml,
    save_yaml,
    to_yaml,
)


def test_reference_defaults():
    cfg = Config()
    # canonical constants from train_AV_net.py:37-84
    assert cfg.stft.fs == 16000
    assert cfg.stft.wlen_sec == 64e-3
    assert cfg.stft.hop_percent == 0.25
    assert cfg.stft.center is False
    assert cfg.stft.nfft == 1024 and cfg.stft.hopsamp == 256
    assert cfg.model.lstm_layers == 2 and cfg.model.lstm_hidden_size == 1024
    assert cfg.model.use_mcb is True
    assert cfg.train.batch_size == 16 and cfg.train.learning_rate == 1e-4
    assert cfg.label.vad_threshold == 1.70 and cfg.label.ibm_threshold == 50
    assert LabelConfig("ibm_labels").y_dim == 513


def test_invalid_wlen_raises():
    with pytest.raises(ValueError):
        STFTConfig(wlen_sec=0.0001).nfft  # non-integer window length


def test_yaml_roundtrip(tmp_path):
    cfg = Config().replace(
        stft=STFTConfig(hop_percent=0.5208),
        label=LabelConfig(kind="ibm_labels"),
    )
    text = to_yaml(cfg)
    back = from_yaml(text)
    assert back == cfg

    p = tmp_path / "cfg.yaml"
    save_yaml(cfg, str(p))
    assert load_yaml(str(p)) == cfg


def test_partial_yaml_uses_defaults():
    cfg = from_yaml("train:\n  batch_size: 4\n")
    assert cfg.train.batch_size == 4
    assert cfg.train.learning_rate == 1e-4  # default preserved
    assert cfg.stft.nfft == 1024

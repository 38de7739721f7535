"""Catalog parity: our NTCD-TIMIT / WSJ0 path resolution vs the reference's,
executed side by side on the reference's subset tree.

The reference catalog is pure glob/os logic, so it can be imported and run
directly as the oracle.
"""

import importlib.util
import os
import sys

import pytest


def _load_ref_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_ntcd():
    return _load_ref_module(
        "ref_ntcd", "/root/reference/packages/dataset/ntcd_timit.py"
    )


@pytest.fixture(scope="module")
def ref_wsj(ref_subset):
    return _load_ref_module(
        "ref_wsj", "/root/reference/packages/dataset/csr1_wjs0.py"
    )


SPLITS = ["train", "validation", "test"]


def test_video_list_parity(ref_subset, ref_ntcd):
    from avvad_tpu.datasets import video_list

    root = os.path.join(ref_subset, "raw/")
    for split in SPLITS:
        assert video_list(root, split) == ref_ntcd.video_list(root, split)


def test_speech_list_parity(ref_subset, ref_ntcd):
    from avvad_tpu.datasets import speech_list

    root = os.path.join(ref_subset, "raw/")
    for split in SPLITS:
        assert speech_list(root, split) == ref_ntcd.speech_list(root, split)


def test_kaldi_list_parity(ref_subset, ref_ntcd):
    from avvad_tpu.datasets import kaldi_list

    root = os.path.join(ref_subset, "raw/")
    for split in SPLITS:
        assert kaldi_list(root, split) == ref_ntcd.kaldi_list(root, split)


def test_proc_video_audio_pair_parity(ref_subset, ref_ntcd):
    from avvad_tpu.datasets import proc_video_audio_pair_dict

    root = os.path.join(ref_subset, "processed/")
    for split in SPLITS:
        for kwargs in [dict(upsampled=True), dict(dct=True), dict(norm_video=True)]:
            ours = proc_video_audio_pair_dict(root, split, **kwargs)
            ref = ref_ntcd.proc_video_audio_pair_dict(root, split, **kwargs)
            assert ours == tuple(ref) or list(ours) == list(ref)


def test_noisy_speech_dict_parity(ref_subset, ref_ntcd):
    from avvad_tpu.datasets import noisy_speech_dict

    root = os.path.join(ref_subset, "raw/")
    for split in SPLITS:
        for size in ["subset", "complete"]:
            assert noisy_speech_dict(root, split, size) == ref_ntcd.noisy_speech_dict(
                root, split, size
            )


def test_noisy_clean_pair_dict_parity(ref_subset, ref_ntcd):
    from avvad_tpu.datasets import noisy_clean_pair_dict

    root = os.path.join(ref_subset, "raw/")
    for split in SPLITS:
        for size in ["subset", "complete"]:
            assert noisy_clean_pair_dict(root, split, size) == ref_ntcd.noisy_clean_pair_dict(
                root, split, size
            )


def test_proc_noisy_clean_pair_dict_parity(ref_subset, ref_ntcd):
    from avvad_tpu.datasets import proc_noisy_clean_pair_dict

    root = os.path.join(ref_subset, "processed/")
    for split in SPLITS:
        for size in ["subset", "complete"]:
            for up in [False, True]:
                ours = proc_noisy_clean_pair_dict(root, split, size, "vad_labels", up)
                ref = ref_ntcd.proc_noisy_clean_pair_dict(root, split, size, "vad_labels", up)
                assert ours == ref, (split, size, up)


def test_subset_pairs_exist_on_disk(ref_subset):
    """The resolved training pairs must point at real files."""
    from avvad_tpu.datasets import proc_noisy_clean_pair_dict

    root = os.path.join(ref_subset, "processed/")
    pairs = proc_noisy_clean_pair_dict(root, "train", "subset", "vad_labels", False)
    assert len(pairs) == 3
    for noisy, label in pairs.items():
        assert os.path.exists(os.path.join(root, noisy)), noisy
        assert os.path.exists(os.path.join(root, label)), label


def test_wsj0_speech_list_parity(ref_subset, ref_wsj):
    from avvad_tpu.datasets import csr1_wjs0

    root = os.path.join(ref_subset, "raw/")
    for split in SPLITS:
        assert csr1_wjs0.speech_list(root, split) == ref_wsj.speech_list(root, split)


def test_wsj0_pickle_roundtrip(tmp_path):
    from avvad_tpu.datasets import csr1_wjs0

    data = {"a": [1, 2, 3]}
    csr1_wjs0.write_dataset(data, str(tmp_path) + os.sep, "train", "unit")
    back = csr1_wjs0.read_dataset(str(tmp_path) + os.sep, "train", "unit")
    assert back == data

"""CLI wiring smoke tests: every script parses --help without import errors."""

import os
import subprocess
import sys

import pytest

SCRIPTS = [
    "scripts/train.py",
    "scripts/evaluate.py",
    "scripts/run_metrics.py",
    "scripts/create_train_files.py",
    "scripts/reconstruct.py",
    "scripts/import_checkpoint.py",
    "scripts/export_serving.py",
    "scripts/stream_demo.py",
    "scripts/visualization_audio.py",
    "scripts/visualization_video.py",
    "scripts/visualization_video_upsampling.py",
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("script", SCRIPTS)
def test_help(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, script), "--help"],
        capture_output=True, text=True, env=env, timeout=120, cwd=REPO,
    )
    assert r.returncode == 0, f"{script}: {r.stderr[-500:]}"
    assert "usage" in r.stdout.lower()

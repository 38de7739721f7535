"""The bench regression gate: BENCH_HISTORY.json comparison + write-back.

Guards the round-4 perf gate (VERDICT r3 weak-#1): a winner >5% slower
than the recorded best-known ms/step must surface a regression field in
the bench JSON line, and history write-back must keep the best-known
monotone (only improvements move it).
"""

import json

import bench


def _seed(tmp_path, monkeypatch, best_ms=40.0):
    path = tmp_path / "BENCH_HISTORY.json"
    path.write_text(json.dumps({
        "inference": {"b4_t8_int80": {"best_ms_per_step": best_ms,
                                      "best_config": "seed"}},
    }))
    monkeypatch.setattr(bench, "_HISTORY_PATH", str(path))
    return path


def test_gate_flags_regression(tmp_path, monkeypatch):
    _seed(tmp_path, monkeypatch, best_ms=40.0)
    # 50 ms vs best 40 ms -> 1.25x, well past the 5% tolerance
    extra = bench._gate_and_record("inference", "b4_t8_int80", "shipped",
                                   0.050, [0.050, 0.051])
    assert extra["regression_vs_best"] == 1.25
    assert extra["best_known_ms"] == 40.0


def test_gate_passes_within_tolerance(tmp_path, monkeypatch):
    _seed(tmp_path, monkeypatch, best_ms=40.0)
    # 41 ms vs best 40 ms -> 2.5% slower: inside the 5% noise band
    extra = bench._gate_and_record("inference", "b4_t8_int80", "shipped",
                                   0.041, [0.041])
    assert extra == {}


def test_gate_unknown_key_no_history(tmp_path, monkeypatch):
    _seed(tmp_path, monkeypatch)
    assert bench._gate_and_record("inference", "b99_t99_int80", "shipped",
                                  0.050, [0.050]) == {}
    assert bench._gate_and_record("train", "b16_t512_frozen1", "av",
                                  0.050, [0.050]) == {}


def test_write_back_monotone_best(tmp_path, monkeypatch):
    path = _seed(tmp_path, monkeypatch, best_ms=40.0)
    monkeypatch.setenv("AVVAD_BENCH_WRITE_HISTORY", "1")
    # slower run: recorded under "last" but best stays
    bench._gate_and_record("inference", "b4_t8_int80", "cand_a",
                           0.048, [0.048, 0.049],
                           candidates={"cand_a": [0.048, 0.049]})
    hist = json.loads(path.read_text())
    entry = hist["inference"]["b4_t8_int80"]
    assert entry["best_ms_per_step"] == 40.0
    assert entry["best_config"] == "seed"
    assert entry["last"]["winner"] == "cand_a"
    assert entry["last"]["rep_ms"] == [48.0, 49.0]
    assert entry["candidates_ms"]["cand_a"]["min_ms"] == 48.0
    # faster run: best moves
    bench._gate_and_record("inference", "b4_t8_int80", "cand_b",
                           0.039, [0.039])
    hist = json.loads(path.read_text())
    entry = hist["inference"]["b4_t8_int80"]
    assert entry["best_ms_per_step"] == 39.0
    assert entry["best_config"] == "cand_b"
    # fresh mode/key created on demand
    bench._gate_and_record("train", "b16_t512_frozen1", "av_train_step",
                           0.100, [0.100, 0.102, 0.101])
    hist = json.loads(path.read_text())
    t = hist["train"]["b16_t512_frozen1"]
    assert t["best_ms_per_step"] == 100.0
    assert t["last"]["mean_ms"] == 101.0
    assert t["last"]["spread_ms"] == 2.0

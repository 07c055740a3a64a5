"""Native WFDB reader, batched preprocess pipeline, sampler, analysis tools."""

import json
import os

import numpy as np
import pytest

from ecg_byte_tpu.data import wfdb_io
from ecg_byte_tpu.data.preprocess import (
    PreprocessArgs,
    compute_global_stats,
    process_and_save_split,
    setup_ecg_qa,
)
from ecg_byte_tpu.tokenizer import native
from ecg_byte_tpu.tokenizer.analysis import analyze_token_distribution, track_encoding


def _write_wfdb16(tmp_path, name, adc, fs=500, gain=200.0, baseline=0):
    """Write a format-16 multiplexed record; adc: (n, n_sig) int16."""
    n, n_sig = adc.shape
    with open(tmp_path / f"{name}.hea", "w") as f:
        f.write(f"{name} {n_sig} {fs} {n}\n")
        for i in range(n_sig):
            f.write(f"{name}.dat 16 {gain}({baseline})/mV 16 0 0 0 0 lead{i}\n")
    adc.astype("<i2").tofile(tmp_path / f"{name}.dat")


def test_wfdb_fmt16_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    adc = rng.integers(-2000, 2000, size=(500, 12)).astype(np.int16)
    _write_wfdb16(tmp_path, "rec1", adc, gain=200.0, baseline=10)
    sig, fields = wfdb_io.rdsamp(str(tmp_path / "rec1"))
    assert sig.shape == (500, 12)
    assert fields["fs"] == 500
    np.testing.assert_allclose(sig, (adc - 10) / 200.0)


def test_wfdb_fmt212(tmp_path):
    # format 212: 12-bit packed; craft 2 signals, 4 samples
    samples = np.array([[100, -200], [300, 5], [-1000, 2047], [-2048, 0]], np.int32)
    flat = samples.reshape(-1)
    raw = bytearray()
    for i in range(0, len(flat), 2):
        s0, s1 = int(flat[i]) & 0xFFF, int(flat[i + 1]) & 0xFFF
        raw.append(s0 & 0xFF)
        raw.append(((s1 >> 8) << 4) | (s0 >> 8))
        raw.append(s1 & 0xFF)
    with open(tmp_path / "r212.hea", "w") as f:
        f.write("r212 2 360 4\n")
        f.write("r212.dat 212 200/mV 12 0 0 0 0 sig0\n")
        f.write("r212.dat 212 200/mV 12 0 0 0 0 sig1\n")
    with open(tmp_path / "r212.dat", "wb") as f:
        f.write(bytes(raw))
    sig, _ = wfdb_io.rdsamp(str(tmp_path / "r212"))
    np.testing.assert_allclose(sig, samples / 200.0)


@pytest.fixture(scope="module")
def mimic_like(tmp_path_factory):
    """Fake MIMIC layout: WFDB records + conversation instances."""
    root = tmp_path_factory.mktemp("mimicroot")
    os.makedirs(root / "mimic", exist_ok=True)
    rng = np.random.default_rng(1)
    instances = []
    for i in range(5):
        adc = (np.cumsum(rng.normal(size=(5000, 12)), 0) * 10).astype(np.int16)
        if i == 3:  # one corrupt record (wrong length) to test skip path
            adc = adc[:100]
        _write_wfdb16(root / "mimic", f"rec{i}", adc)
        instances.append({
            "ecg": f"rec{i}",
            "conversations": [
                {"value": f"<ecg>\nWhat does ECG {i} show?"},
                {"value": f"Record {i} is normal."},
            ],
        })
    return root, instances


def test_batched_preprocess_and_save(mimic_like, tmp_path):
    root, instances = mimic_like
    args = PreprocessArgs(data="mimic", seg_len=1250,
                          data_root=str(root), batch_size=2)
    stats = compute_global_stats(instances, args, sample_size=5000)
    assert stats["skipped_instances"] == 1  # the corrupt record
    assert stats["percentile_1"] < stats["percentile_99"]
    assert np.isfinite(stats["global_min"]) and np.isfinite(stats["global_max"])

    process_and_save_split(instances, "train", args)
    out = root / "mimic_1250" / "ecg" / "train"
    files = sorted(os.listdir(out))
    # 4 valid records x 2 segments each (2500 samples @250Hz / 1250)
    assert len(files) == 8
    seg = np.load(out / "ecg_0_0.npy")
    assert seg.shape == (12, 1250)
    text = json.load(open(root / "mimic_1250" / "text" / "train" / "text_0_0.json"))
    assert "What does ECG" in text[0]["value"]


def test_setup_ecg_qa(tmp_path):
    items = [
        {"question_type": "single-verify", "question": "q1", "answer": "yes"},
        {"question_type": "comparison", "question": "q2", "answer": "no"},
        {"question_type": "single-query", "question": "q3", "answer": "x"},
    ]
    p = tmp_path / "qa.json"
    json.dump(items, open(p, "w"))
    out = setup_ecg_qa([str(p)])
    assert len(out) == 2
    assert all(i["question_type"].startswith("single-") for i in out)


def test_sampler_features_and_stratified(tmp_path):
    from ecg_byte_tpu.data.sampler import (
        analyze_morphologies,
        extract_features,
        stratified_sampling,
    )

    rng = np.random.default_rng(2)
    for i in range(12):
        kind = i % 2
        base = np.sin(np.linspace(0, 20 + 30 * kind, 500))
        sig = (base[None] * (1 + kind) + 0.05 * rng.normal(size=(12, 500)))
        np.save(tmp_path / f"ecg_{i}_0.npy", sig.astype(np.float32))
    feats = extract_features(np.load(tmp_path / "ecg_0_0.npy"))
    assert feats.ndim == 1 and np.all(np.isfinite(feats))
    paths, clusters, n = analyze_morphologies(str(tmp_path), max_clusters=4)
    assert len(paths) == 12
    sampled = stratified_sampling(paths, clusters, n_samples=6)
    assert len(sampled) == 6
    assert len(set(sampled)) == 6


def test_analysis_token_tools(tmp_path):
    rng = np.random.default_rng(3)
    sigs = []
    for i in range(4):
        s = (np.cumsum(rng.normal(size=(12, 60)), -1) * 0.05).astype(np.float32)
        np.save(tmp_path / f"ecg_{i}_0.npy", s)
        sigs.append(s)
    stats = np.stack(sigs)
    percentiles = {
        "percentile_1": float(np.percentile(stats, 1)),
        "percentile_99": float(np.percentile(stats, 99)),
    }
    from ecg_byte_tpu.tokenizer.analysis import quantize_file

    corpus = "".join(
        quantize_file(str(tmp_path / f"ecg_{i}_0.npy"), percentiles) for i in range(4)
    )
    _, merges = native.train(corpus.encode(), 50)
    paths = [str(tmp_path / f"ecg_{i}_0.npy") for i in range(4)]
    counts, lengths = analyze_token_distribution(paths, merges, percentiles)
    assert len(lengths) == 4
    assert sum(counts.values()) == sum(lengths)

    text = quantize_file(paths[0], percentiles)
    ids, segmap = track_encoding(text, merges)
    assert len(ids) == len(segmap)
    # spans tile the text exactly
    assert segmap[0][0] == 0 and segmap[-1][1] == len(text)
    for (s1, e1), (s2, e2) in zip(segmap, segmap[1:]):
        assert e1 == s2


# ---------------------------------------------------------------------------
# PTB-XL label aggregation: all six tasks (preprocess_utils.py:519-662)


def _scp_fixture():
    import pandas as pd

    agg_df = pd.DataFrame(
        {
            "diagnostic": [1.0, 1.0, 1.0, np.nan, np.nan, np.nan],
            "form": [np.nan, np.nan, np.nan, 1.0, np.nan, 1.0],
            "rhythm": [np.nan, np.nan, np.nan, np.nan, 1.0, np.nan],
            "diagnostic_class": ["NORM", "MI", "STTC", np.nan, np.nan, np.nan],
            "diagnostic_subclass": ["NORM", "IMI", np.nan, np.nan, np.nan, np.nan],
        },
        index=["NORM", "IMI", "NDT", "PVC", "SR", "ABQRS"],
    )
    scp_codes = [
        {"NORM": 100.0, "SR": 0.0},
        {"IMI": 80.0, "ABQRS": 0.0, "SR": 0.0},
        {"NDT": 100.0, "PVC": 0.0},
        {"XYZ": 50.0},  # unknown code: never aggregates
    ]
    return agg_df, scp_codes


@pytest.mark.parametrize(
    "task,expected",
    [
        ("all", [{"NORM", "SR"}, {"IMI", "ABQRS", "SR"}, {"NDT", "PVC"}, {"XYZ"}]),
        ("diagnostic", [{"NORM"}, {"IMI"}, {"NDT"}, set()]),
        ("subdiagnostic", [{"NORM"}, {"IMI"}, set(), set()]),
        ("superdiagnostic", [{"NORM"}, {"MI"}, {"STTC"}, set()]),
        ("form", [set(), {"ABQRS"}, {"PVC"}, set()]),
        ("rhythm", [{"SR"}, {"SR"}, set(), set()]),
    ],
)
def test_ptb_label_aggregation_tasks(task, expected):
    from ecg_byte_tpu.data.preprocess import compute_label_aggregations

    agg_df, scp_codes = _scp_fixture()
    got = compute_label_aggregations(scp_codes, agg_df, task)
    assert [set(row) for row in got] == expected


def test_ptb_select_labeled_filters_empty_rows_and_binarizes():
    from ecg_byte_tpu.data.preprocess import (
        compute_label_aggregations,
        select_labeled,
    )

    agg_df, scp_codes = _scp_fixture()
    agg = compute_label_aggregations(scp_codes, agg_df, "superdiagnostic")
    keep, kept, y, mlb = select_labeled(agg, "superdiagnostic", min_samples=0)
    np.testing.assert_array_equal(keep, [True, True, True, False])
    assert list(mlb.classes_) == ["MI", "NORM", "STTC"]
    np.testing.assert_array_equal(y, [[0, 1, 0], [1, 0, 0], [0, 0, 1]])


def test_ptb_select_labeled_min_samples():
    from ecg_byte_tpu.data.preprocess import (
        compute_label_aggregations,
        select_labeled,
    )

    agg_df, scp_codes = _scp_fixture()
    # form labels each appear once -> min_samples=1 drops them all
    agg = compute_label_aggregations(scp_codes, agg_df, "form")
    keep, _, _, _ = select_labeled(agg, "form", min_samples=1)
    assert not keep.any()
    # rhythm SR appears twice -> survives min_samples=1
    agg = compute_label_aggregations(scp_codes, agg_df, "rhythm")
    keep, _, y, mlb = select_labeled(agg, "rhythm", min_samples=1)
    np.testing.assert_array_equal(keep, [True, True, False, False])
    assert list(mlb.classes_) == ["SR"]


def test_ptb_unknown_task_raises():
    from ecg_byte_tpu.data.preprocess import compute_label_aggregations

    agg_df, scp_codes = _scp_fixture()
    with pytest.raises(ValueError):
        compute_label_aggregations(scp_codes, agg_df, "bogus")


def test_wfdb_fmt80_and_fmt32(tmp_path):
    """8-bit offset-128 and 32-bit little-endian sample formats."""
    rng = np.random.default_rng(4)
    # fmt 80
    adc8 = rng.integers(-128, 128, size=(40, 3)).astype(np.int32)
    with open(tmp_path / "r80.hea", "w") as f:
        f.write("r80 3 250 40\n")
        for i in range(3):
            f.write(f"r80.dat 80 100/mV 8 0 0 0 0 s{i}\n")
    (adc8 + 128).astype(np.uint8).tofile(tmp_path / "r80.dat")
    sig, fields = wfdb_io.rdsamp(str(tmp_path / "r80"))
    assert fields["fs"] == 250
    np.testing.assert_allclose(sig, adc8 / 100.0)
    # fmt 32
    adc32 = rng.integers(-(2**20), 2**20, size=(16, 2)).astype(np.int32)
    with open(tmp_path / "r32.hea", "w") as f:
        f.write("r32 2 500 16\n")
        for i in range(2):
            f.write(f"r32.dat 32 1000(5)/uV 32 0 0 0 0 c{i}\n")
    adc32.astype("<i4").tofile(tmp_path / "r32.dat")
    sig, _ = wfdb_io.rdsamp(str(tmp_path / "r32"))
    np.testing.assert_allclose(sig, (adc32 - 5) / 1000.0)


def test_wfdb_unsupported_format_raises(tmp_path):
    with open(tmp_path / "rx.hea", "w") as f:
        f.write("rx 1 500 4\n")
        f.write("rx.dat 24 200/mV 24 0 0 0 0 s0\n")
    with open(tmp_path / "rx.dat", "wb") as f:
        f.write(b"\x00" * 12)
    with pytest.raises(NotImplementedError):
        wfdb_io.rdsamp(str(tmp_path / "rx"))

"""Dataset ingestion: MIMIC / ECG-QA / PTB-XL preprocessing, device-batched.

Counterpart of utils/preprocess_utils.py.  The reference fans per-record
scipy/pywt work across process pools (:177-179,:233-236,:487-499); here
records are read by the native WFDB reader, stacked, and pushed through ONE
jitted batch program (ops/dsp.preprocess_records: filter chain -> wavelet
denoise -> cubic resample on the MXU), so throughput scales with batch
size instead of host cores.

Artifact layout, split naming, stats dict keys, skip semantics, and the
PTB-XL label aggregation/selection rules match the reference so downstream
consumers (datasets, tokenizer corpus build) see identical trees.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ecg_byte_tpu.data import wfdb_io

_MIMIC_LIKE = ("mimic", "ecg_qa_mimic")  # need lead reorder (preprocess_utils.py:140-142)


@dataclasses.dataclass
class PreprocessArgs:
    """Knobs of the reference preprocess argparse namespace."""

    data: str = "mimic"
    seg_len: int = 2500
    data_root: str = "./data"
    batch_size: int = 64


# ---------------------------------------------------------------------------
# Record loading


def _record_path(instance: Dict, args: PreprocessArgs) -> str:
    """Resolve the WFDB record path (preprocess_utils.py:115-124),
    anchored at ``args.data_root`` instead of a hard-coded ``./data``."""
    if args.data == "mimic":
        return os.path.join(args.data_root, "mimic", instance["ecg"])
    if args.data == "ecg_qa_ptb":
        rel = instance["ecg_path"][0].lstrip("./").lstrip("../")
        return os.path.join(args.data_root, rel)
    if args.data == "ecg_qa_mimic":
        p = instance["ecg_path"][0]
        rel = p[p.find("/data") + len("/data") :].lstrip("/")
        return os.path.join(args.data_root, rel)
    raise ValueError(f"unknown data kind {args.data!r}")


def _conversation(instance: Dict, args: PreprocessArgs):
    if args.data == "mimic":
        return instance["conversations"]
    return [instance["question_type"], instance["question"], instance["answer"]]


def load_instance_signal(instance: Dict, args: PreprocessArgs):
    """Read + validate one record -> ((5000, 12) float array, conversation).

    Returns (None, None) on any failure, mirroring the skip semantics of
    ``process_instance`` (preprocess_utils.py:125-165): fs must be 500, 12
    leads, 5000 samples, no NaN/inf.
    """
    try:
        path = _record_path(instance, args)
        signals, fields = wfdb_io.rdsamp(path)
        assert fields["fs"] == 500
        assert signals.shape[1] == 12
        assert signals.shape[0] == 5000
        if np.any(np.isnan(signals)) or np.any(np.isinf(signals)):
            print(f"Warning: NaN values detected in {path}. Skipping this instance.")
            return None, None
        return signals, _conversation(instance, args)
    except Exception as e:
        print(f"Error processing instance: {e}. Skipping this instance.")
        return None, None


# ---------------------------------------------------------------------------
# Device-batched pipeline


def preprocess_signal_batch(
    signals: np.ndarray, args: PreprocessArgs, fs: float = 500.0
) -> np.ndarray:
    """(B, time, 12) raw -> (B, n_seg, 12, seg_len) preprocessed segments.

    One XLA program per (shape, seg_len): reorder (MIMIC family) -> notch +
    band + baseline filtfilt -> wavelet denoise -> cubic resample to 250 Hz
    -> fixed windows (ops/dsp.py; math matches preprocess_utils.py:43-113).
    """
    from ecg_byte_tpu.ops import dsp

    x = np.transpose(np.asarray(signals, np.float32), (0, 2, 1))  # (B, 12, T)
    do_reorder = args.data in _MIMIC_LIKE
    y = dsp.preprocess_records(x, fs=fs, target_fs=250.0, do_reorder=do_reorder)
    segs = dsp.segment_ecg(y, args.seg_len)  # (B, n_seg, 12, seg_len)
    return np.asarray(segs)


def iter_preprocessed(
    instances: Sequence[Dict], args: PreprocessArgs,
    stats: Optional[Dict[str, int]] = None,
) -> Iterator[Tuple[int, np.ndarray, object]]:
    """Yield (original_index, (n_seg, 12, seg_len) segments, conversation)
    per valid instance.  Pass a mutable ``stats`` dict to observe the skip
    count: ``stats["skipped"]`` is updated incrementally, so it is correct
    even for partially consumed or concurrent iterations (a function
    attribute would go stale across interleaved calls)."""
    batch_idx: List[int] = []
    batch_sig: List[np.ndarray] = []
    batch_conv: List[object] = []
    if stats is None:
        stats = {}
    stats["skipped"] = 0

    def flush():
        if not batch_idx:
            return
        segs = preprocess_signal_batch(np.stack(batch_sig), args)
        for i, conv, seg in zip(batch_idx, batch_conv, segs):
            if np.any(np.isnan(seg)) or np.any(np.isinf(seg)):
                seg = np.nan_to_num(seg, nan=0.0, posinf=0.0, neginf=0.0)
            yield i, seg, conv
        batch_idx.clear()
        batch_sig.clear()
        batch_conv.clear()

    for i, instance in enumerate(instances):
        sig, conv = load_instance_signal(instance, args)
        if sig is None:
            stats["skipped"] += 1
            continue
        batch_idx.append(i)
        batch_sig.append(sig)
        batch_conv.append(conv)
        if len(batch_idx) >= args.batch_size:
            yield from flush()
    yield from flush()


def compute_global_stats(
    instances: Sequence[Dict], args: PreprocessArgs, sample_size: int = 100000
) -> Dict[str, float]:
    """Global min/max + sampled 1st/99th percentiles over preprocessed
    segments (preprocess_utils.py:168-213)."""
    global_min, global_max = np.inf, -np.inf
    samples: List[np.ndarray] = []
    collected = 0
    n_valid = 0
    rng = np.random.default_rng(0)

    skip_stats: Dict[str, int] = {}
    gen = iter_preprocessed(instances, args, stats=skip_stats)
    for _idx, segs, _conv in gen:
        n_valid += 1
        for seg in segs:
            global_min = min(global_min, float(np.min(seg)))
            global_max = max(global_max, float(np.max(seg)))
            if collected < sample_size:
                take = min(sample_size - collected, seg.size)
                pick = rng.choice(seg.size, take, replace=False)
                samples.append(np.asarray(seg).reshape(-1)[pick])
                collected += take
    skipped = skip_stats.get("skipped", 0)
    flat = np.concatenate(samples) if samples else np.zeros(1)
    stats = {
        "global_min": float(global_min) if n_valid else 0.0,
        "global_max": float(global_max) if n_valid else 0.0,
        "percentile_1": float(np.percentile(flat, 1)),
        "percentile_99": float(np.percentile(flat, 99)),
        "skipped_instances": skipped,
    }
    print(f"Total instances skipped due to NaN values: {skipped}")
    return stats


def process_and_save_split(
    instances: Sequence[Dict], split_name: str, args: PreprocessArgs
) -> None:
    """Write ``ecg_{i}_{j}.npy`` (12, seg_len) + ``text_{i}_{j}.json`` per
    segment into the reference tree (preprocess_utils.py:215-253)."""
    root = os.path.join(args.data_root, f"{args.data}_{args.seg_len}")
    os.makedirs(os.path.join(root, "ecg", split_name), exist_ok=True)
    os.makedirs(os.path.join(root, "text", split_name), exist_ok=True)

    skip_stats: Dict[str, int] = {}
    for idx, segs, conv in iter_preprocessed(instances, args, stats=skip_stats):
        for j in range(segs.shape[0]):
            np.save(
                os.path.join(root, "ecg", split_name, f"ecg_{idx}_{j}.npy"),
                segs[j],
            )
            with open(
                os.path.join(root, "text", split_name, f"text_{idx}_{j}.json"), "w"
            ) as f:
                json.dump(conv, f)
    print(
        f"Total instances skipped in {split_name} split: "
        f"{skip_stats.get('skipped', 0)}"
    )


# ---------------------------------------------------------------------------
# ECG-QA templates


def setup_ecg_qa(glob_paths: Sequence[str]) -> List[Dict]:
    """Keep single-verify/choose/query items (preprocess_utils.py:796-803)."""
    data: List[Dict] = []
    for fname in sorted(glob_paths):
        with open(fname) as f:
            loaded = json.load(f)
        data.extend(
            item
            for item in loaded
            if item["question_type"]
            in ("single-verify", "single-choose", "single-query")
        )
    return data


# ---------------------------------------------------------------------------
# PTB-XL label tasks (preprocess_utils.py:519-662)

_PTB_TASKS = ("all", "diagnostic", "subdiagnostic", "superdiagnostic", "form", "rhythm")


def compute_label_aggregations(scp_codes, agg_df, task: str) -> List[List[str]]:
    """Aggregate each record's SCP-code dict into task labels.

    ``scp_codes``: sequence of {code: likelihood} dicts (one per record);
    ``agg_df``: the scp_statements.csv table indexed by code.  Returns one
    label list per record (unordered sets in the reference; sorted here
    for determinism).
    """
    if task not in _PTB_TASKS:
        raise ValueError(f"unknown PTB-XL task {task!r}; options: {_PTB_TASKS}")

    if task == "all":
        return [sorted(set(d.keys())) for d in scp_codes]

    if task in ("diagnostic", "subdiagnostic", "superdiagnostic"):
        diag_df = agg_df[agg_df.diagnostic == 1.0]
        col = {
            "diagnostic": None,
            "subdiagnostic": "diagnostic_subclass",
            "superdiagnostic": "diagnostic_class",
        }[task]

        def agg(d):
            out = set()
            for key in d:
                if key in diag_df.index:
                    if col is None:
                        out.add(key)
                    else:
                        c = diag_df.loc[key][col]
                        if str(c) != "nan":
                            out.add(c)
            return sorted(out)

        return [agg(d) for d in scp_codes]

    flag_df = agg_df[getattr(agg_df, task) == 1.0]

    def agg_flag(d):
        return sorted({key for key in d if key in flag_df.index and str(key) != "nan"})

    return [agg_flag(d) for d in scp_codes]


def select_labeled(
    agg: List[List[str]],
    task: str,
    min_samples: int = 0,
    output_folder: Optional[str] = None,
):
    """Rare-label filter + row selection + multi-hot binarization
    (preprocess_utils.py:595-662).

    Labels with corpus count <= ``min_samples`` are dropped (all tasks
    except 'diagnostic', which the reference never filters), then rows
    left with no labels are excluded.  Returns
    ``(keep_mask, kept_label_lists, y_multihot, mlb)`` and pickles the
    fitted ``MultiLabelBinarizer`` as ``mlb.pkl`` when ``output_folder``
    is given (:659-660).
    """
    from sklearn.preprocessing import MultiLabelBinarizer

    rows = [list(r) for r in agg]
    if task != "diagnostic":
        counts: Dict[str, int] = {}
        for r in rows:
            for label in r:
                counts[label] = counts.get(label, 0) + 1
        keep_labels = {label for label, c in counts.items() if c > min_samples}
        rows = [sorted(set(r) & keep_labels) for r in rows]

    keep = np.array([len(r) > 0 for r in rows])
    kept = [r for r in rows if r]
    mlb = MultiLabelBinarizer()
    if kept:
        y = mlb.fit_transform(kept)
    else:
        mlb.fit([[]])
        y = np.zeros((0, 0), dtype=np.int64)
    if output_folder is not None:
        os.makedirs(output_folder, exist_ok=True)
        with open(os.path.join(output_folder, "mlb.pkl"), "wb") as f:
            pickle.dump(mlb, f)
    return keep, kept, y, mlb


def translate_reports(texts, model_dir: Optional[str] = None):
    """German->English report translation (preprocess_utils.py:664-713).

    Runs the Helsinki-NLP opus-mt-de-en seq2seq when a local checkpoint is
    available (``model_dir`` or $ECG_BYTE_TRANSLATION_MODEL); otherwise
    returns the inputs unchanged with a warning (zero-egress environments
    cannot download the model).
    """
    texts = np.asarray(texts, dtype=object)
    model_dir = model_dir or os.environ.get("ECG_BYTE_TRANSLATION_MODEL")
    if not model_dir or not os.path.isdir(model_dir):
        print(
            "translate_reports: no local opus-mt-de-en checkpoint; "
            "keeping original report text (set $ECG_BYTE_TRANSLATION_MODEL)"
        )
        return texts

    # torch-free path: the JAX Marian port (models/marian.py) + native
    # sentencepiece segmentation (tokenizer/sp_model.py); greedy decode in
    # one jitted program per batch (batch 32 / max_length 128, matching
    # the reference's generate call)
    from ecg_byte_tpu.models.marian import greedy_generate, load_hf_marian
    from ecg_byte_tpu.tokenizer.sp_model import MarianSpTokenizer

    tokenizer = MarianSpTokenizer(model_dir)
    params, config = load_hf_marian(model_dir)
    valid_mask = np.array([bool(t and str(t).strip()) for t in texts])
    valid = [str(t) for t in texts[valid_mask]]
    translations: List[str] = []
    for i in range(0, len(valid), 32):
        enc = tokenizer(valid[i : i + 32], truncation=True, max_length=512)
        ids, mask = enc["input_ids"], enc["attention_mask"]
        # bucket the source width so XLA compiles a handful of shapes
        # instead of one per batch
        width = max(64, -(-ids.shape[1] // 64) * 64)
        pad = width - ids.shape[1]
        if pad:
            ids = np.pad(ids, ((0, 0), (0, pad)),
                         constant_values=tokenizer.pad_token_id)
            mask = np.pad(mask, ((0, 0), (0, pad)))
        out = greedy_generate(params, config, ids, mask, max_length=128)
        translations.extend(
            tokenizer.batch_decode(np.asarray(out), skip_special_tokens=True)
        )
    result = np.empty_like(texts)
    result[valid_mask] = translations
    result[~valid_mask] = ""
    return result


def preprocess_ptb(
    ptb_folder: str,
    args: PreprocessArgs,
    task: str = "superdiagnostic",
    translation_model: Optional[str] = None,
) -> None:
    """Full PTB-XL pipeline (preprocess_utils.py:736-792): load 500 Hz
    records, device-batched filter/denoise/resample, label aggregation +
    selection, strat_fold 1-7/8/9-10 splits, report translation,
    segmentation, reference-layout save (``ecg_{i}_{i}`` naming quirk
    preserved, :776)."""
    import pandas as pd
    import ast

    db = pd.read_csv(os.path.join(ptb_folder, "ptbxl_database.csv"),
                     index_col="ecg_id")
    db.scp_codes = db.scp_codes.apply(ast.literal_eval)
    agg_df = pd.read_csv(os.path.join(ptb_folder, "scp_statements.csv"), index_col=0)

    # the reference caches FILTERED records time-major (N, 2500, 12) as
    # raw500.npy (preprocess_utils.py:509-516: rdsamp -> filter/denoise/
    # resample -> pickle); keep that format so caches interoperate
    cache = os.path.join(ptb_folder, "raw500.npy")
    if os.path.exists(cache):
        filtered = np.load(cache, allow_pickle=True)
    else:
        sigs = []
        for fname in db.filename_hr:
            sig, _fields = wfdb_io.rdsamp(os.path.join(ptb_folder, fname))
            sigs.append(sig.astype(np.float32))
        raw = np.stack(sigs)  # (N, 5000, 12)
        from ecg_byte_tpu.ops import dsp

        chunks = []
        for start in range(0, len(raw), args.batch_size):
            x = np.transpose(raw[start : start + args.batch_size], (0, 2, 1))
            y = dsp.preprocess_records(x, fs=500.0, target_fs=250.0)
            chunks.append(np.transpose(np.asarray(y), (0, 2, 1)))
        filtered = np.concatenate(chunks)  # (N, 2500, 12)
        with open(cache, "wb") as f:
            pickle.dump(filtered, f, protocol=4)

    # (N, time, 12) -> (N, n_seg, 12, seg_len)
    from ecg_byte_tpu.ops import dsp as _dsp

    data = np.asarray(
        _dsp.segment_ecg(np.transpose(filtered, (0, 2, 1)), args.seg_len)
    )

    agg = compute_label_aggregations(list(db.scp_codes), agg_df, task)
    out_root = os.path.join(args.data_root, f"{args.data}_{args.seg_len}")
    keep, _kept, y, _mlb = select_labeled(
        agg, task, min_samples=0, output_folder=out_root
    )
    data = data[keep]
    folds = db.strat_fold.values[keep]
    reports = np.asarray(db.report.values[keep], dtype=object)

    for split_name, mask in (
        ("train", folds < 8),
        ("val", folds == 8),
        ("test", folds > 8),
    ):
        split_data = data[mask]
        split_reports = translate_reports(reports[mask], translation_model)
        os.makedirs(os.path.join(out_root, "ecg", split_name), exist_ok=True)
        os.makedirs(os.path.join(out_root, "text", split_name), exist_ok=True)
        count = 0
        for segs, report in zip(split_data, split_reports):
            for seg in segs:
                np.save(
                    os.path.join(
                        out_root, "ecg", split_name, f"ecg_{count}_{count}.npy"
                    ),
                    seg,
                )
                with open(
                    os.path.join(
                        out_root, "text", split_name, f"text_{count}_{count}.json"
                    ),
                    "w",
                ) as f:
                    json.dump(str(report), f)
                count += 1
        print(f"{split_name}: {count} segments saved")

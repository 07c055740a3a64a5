"""Epoch runners: trainer / validater.

Mirrors ecg_byte/runners/train.py semantics: per-epoch shuffling via
``set_epoch`` (:10), None-batch skip (:17-19), per-step exception swallowing
(:59-61), mid-epoch checkpoints every 50k steps unless ``--toy`` (:35-53),
``--dev`` capping at 10 steps (:55-58), and average-loss dicts.  The
forward/backward/clip/optimizer work happens inside the jitted sharded step
(train/step.py) instead of eager torch calls.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np
from tqdm import tqdm

from ecg_byte_tpu.train.checkpoint import save_checkpoint


def model_batch(raw: Dict) -> Dict:
    """Adapt a dataset batch to the train-step input contract."""
    return {
        "input_ids": np.asarray(raw["tokenized_signal"], np.int32),
        "attn_mask": np.asarray(raw["attn_mask"], np.int32),
        "labels": np.asarray(raw["quantized_signal_ids_input"], np.int32),
        "position_ids": np.asarray(raw["position_ids"], np.int32),
    }


def trainer(
    state,
    step_fn: Callable,
    dataloader,
    rng,
    *,
    epoch: int,
    directory_path: Optional[str] = None,
    dev: bool = False,
    toy: bool = False,
    log_fn: Optional[Callable] = None,
    desc: str = "Training",
    log_every: int = 32,
):
    """Run one training epoch.

    The per-step loss stays ON DEVICE: a host ``float(loss)`` every step
    would force a device->host round-trip that serializes dispatch (a major
    MFU drain through a slow host link).  Losses accumulate as a device
    scalar; the host syncs once per ``log_every`` window (logging the window
    average — same information the reference's per-step wandb line carries,
    without the per-step stall) and once at epoch end.
    """
    dataloader.set_epoch(epoch)
    n_batches, dev_count = 0, 0
    total_loss = 0.0                   # host float, updated once per window
    window_sum, window_n = None, 0     # device scalar accumulator
    for step, batch in enumerate(tqdm(dataloader, desc=desc, leave=True)):
        if batch is None:
            print(f"Skipping invalid batch at step {step}")
            continue
        try:
            state, loss = step_fn(state, model_batch(batch), rng)
            window_sum = loss if window_sum is None else window_sum + loss
            window_n += 1
            n_batches += 1
            if window_n >= log_every:
                w = float(window_sum)  # the only device->host sync
                total_loss += w
                if log_fn is not None:
                    log_fn({"train_step_loss": w / window_n, "epoch": epoch,
                            "train_step": step, "window_size": window_n})
                window_sum, window_n = None, 0
            if ((step + 1) % 50000 == 0) and not toy and directory_path:
                save_checkpoint(
                    directory_path, f"best_train_model_{epoch}_{step}", state,
                    epoch=epoch,
                )
            if dev:
                dev_count += 1
                if dev_count == 10:
                    break
        except Exception as e:  # keep epochs alive past bad batches (:59-61)
            print(f"Error during training at step {step}: {e}")
            continue
    if window_sum is not None:
        try:
            total_loss += float(window_sum)
        except Exception as e:  # async dispatch errors surface at this sync
            print(f"Error syncing final loss window: {e}")
            n_batches -= window_n
    average_loss = total_loss / n_batches if n_batches > 0 else float("inf")
    return state, {"average_loss": average_loss}


def validater(
    state,
    eval_fn: Callable,
    dataloader,
    *,
    epoch: int,
    dev: bool = False,
    log_fn: Optional[Callable] = None,
    desc: str = "Validating",
    log_every: int = 32,
):
    n_batches, dev_count = 0, 0
    total_loss = 0.0
    window_sum, window_n = None, 0     # device scalar accumulator (see trainer)
    for step, batch in enumerate(tqdm(dataloader, desc=desc, leave=True)):
        if batch is None:
            print(f"Skipping invalid batch at step {step}")
            continue
        try:
            loss = eval_fn(state, model_batch(batch))
            window_sum = loss if window_sum is None else window_sum + loss
            window_n += 1
            n_batches += 1
            if window_n >= log_every:
                w = float(window_sum)
                total_loss += w
                if log_fn is not None:
                    log_fn({"val_step_loss": w / window_n, "epoch": epoch,
                            "val_step": step, "window_size": window_n})
                window_sum, window_n = None, 0
            if dev:
                dev_count += 1
                if dev_count == 10:
                    break
        except Exception as e:
            print(f"Error during validation at step {step}: {e}")
            continue
    if window_sum is not None:
        try:
            total_loss += float(window_sum)
        except Exception as e:
            print(f"Error syncing final loss window: {e}")
            n_batches -= window_n
    average_loss = total_loss / n_batches if n_batches > 0 else float("inf")
    return {"average_loss": average_loss}

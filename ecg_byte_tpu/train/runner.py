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
):
    dataloader.set_epoch(epoch)
    total_loss, n_batches, dev_count = 0.0, 0, 0
    for step, batch in enumerate(tqdm(dataloader, desc=desc, leave=True)):
        if batch is None:
            print(f"Skipping invalid batch at step {step}")
            continue
        try:
            state, loss = step_fn(state, model_batch(batch), rng)
            loss_val = float(loss)
            total_loss += loss_val
            n_batches += 1
            if log_fn is not None:
                log_fn({"train_step_loss": loss_val, "epoch": epoch, "train_step": step})
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
    average_loss = total_loss / n_batches if n_batches else float("inf")
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
):
    total_loss, n_batches, dev_count = 0.0, 0, 0
    for step, batch in enumerate(tqdm(dataloader, desc=desc, leave=True)):
        if batch is None:
            print(f"Skipping invalid batch at step {step}")
            continue
        try:
            loss_val = float(eval_fn(state, model_batch(batch)))
            total_loss += loss_val
            n_batches += 1
            if log_fn is not None:
                log_fn({"val_step_loss": loss_val, "epoch": epoch, "val_step": step})
            if dev:
                dev_count += 1
                if dev_count == 10:
                    break
        except Exception as e:
            print(f"Error during validation at step {step}: {e}")
            continue
    average_loss = total_loss / n_batches if n_batches else float("inf")
    return {"average_loss": average_loss}

"""End-to-end entry point: ECG-token LLM training and inference.

TPU-native counterpart of ecg_byte/main.py with the same flag surface and
artifact layout (runs/<seed>/<cfg>/best_model*, seed-result JSONs, loss
plot).  Distribution flags map to mesh axes instead of GPU ids: ``--dis``
uses every local device (data parallel by default; add ``--tp``/``--fsdp``
to reshape the mesh).

Examples:
  python -m ecg_byte_tpu.cli.main --model tiny-llama --dataset ptb_500 \
      --tokenizer_check tokenizer_3500 --percentiles .../stats.npy --peft --dev
  python -m ecg_byte_tpu.cli.main --inference --checkpoint <cfg-dir-name> ...
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from ecg_byte_tpu.cli.common import build_model, make_log_fn, make_run_dir, set_seed
from ecg_byte_tpu.data import DataConfig, DataLoader, ECGTokenDataset
from ecg_byte_tpu.infer import greedy_generate
from ecg_byte_tpu.infer.evaluate import tester
from ecg_byte_tpu.models import lora as lora_lib
from ecg_byte_tpu.models.quantized import quantize_lm_int8
from ecg_byte_tpu.parallel import make_mesh
from ecg_byte_tpu.tokenizer import load_vocab_and_merges
from ecg_byte_tpu.train import create_train_state, make_eval_step, make_train_step
from ecg_byte_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    save_crash_checkpoint,
    snapshot_state,
)
from ecg_byte_tpu.train.runner import trainer, validater
from ecg_byte_tpu.train.scheduler import make_optimizer
from ecg_byte_tpu.train.step import TrainState, shard_state
from ecg_byte_tpu.utils.file_utils import (
    align_signal_text_files,
    ensure_directory_exists,
    sample_N_percent_from_lists,
)
from ecg_byte_tpu.utils.metrics import early_stopping, run_statistical_analysis
from ecg_byte_tpu.utils.viz_utils import plot_train_val_loss


def get_args():
    parser = argparse.ArgumentParser(description=None)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--batch_size', type=int, default=128)
    parser.add_argument('--epochs', type=int, default=150)
    parser.add_argument('--device', type=str, default=None)
    parser.add_argument('--dataset', type=str, default='mimic_500')
    parser.add_argument('--model', type=str, default=None)
    parser.add_argument('--beta1', type=float, default=0.9)
    parser.add_argument('--beta2', type=float, default=0.99)
    parser.add_argument('--eps', type=float, default=1e-8)
    parser.add_argument('--warmup', type=int, default=500)
    parser.add_argument('--weight_decay', type=float, default=1e-2)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--patience', type=int, default=5)
    parser.add_argument('--dev', action='store_true')
    parser.add_argument('--inference', action='store_true')
    parser.add_argument('--checkpoint', type=str)
    parser.add_argument('--log', action='store_true')
    parser.add_argument('--dis', action='store_true')
    parser.add_argument('--tokenizer_check', type=str)
    parser.add_argument('--num_merges', type=int, default=1000)
    parser.add_argument('--pad_to_max', type=int, default=1000)
    parser.add_argument('--gpus', type=str, default='0')   # accepted, unused (mesh-based)
    parser.add_argument('--ports', type=str, default='12355')  # accepted, unused
    parser.add_argument('--toy', action='store_true')
    parser.add_argument('--peft', action='store_true', default=None)
    parser.add_argument('--percentiles', type=str, default=None)
    parser.add_argument('--interpret', action='store_true')
    # TPU-native additions
    parser.add_argument('--tp', type=int, default=1, help='tensor-parallel axis size')
    parser.add_argument('--fsdp', type=int, default=1, help='fsdp axis size')
    parser.add_argument('--hf_weights', type=str, default=None,
                        help='local HF model dir (config.json + safetensors)')
    parser.add_argument('--profile', type=str, default=None,
                        help='capture a jax.profiler trace of the first '
                             'training steps into this directory')
    parser.add_argument('--resume', type=str, default=None,
                        help='resume training from a checkpoint role in the '
                             'run dir (best_model | crash_model); restores '
                             'params, optimizer state, and epoch')
    parser.add_argument('--eval_batch_size', type=int, default=1,
                        help='inference decode batch: rows decode '
                             'independently (identical token streams to '
                             'batch 1) while the weight stream amortizes '
                             'across the batch')
    parser.add_argument('--data_root', type=str, default='./data')
    parser.add_argument('--int8_decode', action='store_true',
                        help='weight-only int8 serving copy for decode: '
                             '~half the streamed bytes per token '
                             '(beyond-reference mode; outputs are close '
                             'to but not bitwise-equal with bf16)')
    parser.add_argument('--no_merge_lora', action='store_true',
                        help='keep LoRA adapters attached at inference '
                             'instead of folding them into the base weights '
                             '(merged decode streams one weight set per '
                             'token; attached matches training-time math '
                             'bit-for-bit)')
    parser.add_argument('--remat', type=str, default='slim',
                        choices=['slim', 'dots', 'full', 'none'],
                        help='rematerialization policy for the train step: '
                             'slim (default — save everything except '
                             'cheap-to-replay elementwise tensors, see '
                             'TRAINPERF.md), dots (safe fallback), none '
                             '(save all; needs the most HBM), full '
                             '(lowest memory)')
    parser.add_argument('--online_encode', action='store_true',
                        help='per-item host BPE encode (reference '
                             'data_loader.py:74-76 semantics) instead of the '
                             'default device-batched token cache; token '
                             'streams are identical either way (tested), the '
                             'cache just removes the host encode from the '
                             'training input path')
    return parser.parse_args()


def _mesh_from_args(args):
    n = len(jax.devices())
    if not args.dis:
        return make_mesh(dp=1)
    tp, fsdp = args.tp, args.fsdp
    dp = max(1, n // (tp * fsdp))
    return make_mesh(dp=dp, fsdp=fsdp, tp=tp)


def _install_sigterm_handler():
    """Convert SIGTERM into an exception so the crash-checkpoint finally
    block runs (the reference's crash save only covers Python exceptions;
    preemptions/timeouts send SIGTERM)."""
    import signal

    def handler(signum, frame):
        raise KeyboardInterrupt("SIGTERM")

    try:
        signal.signal(signal.SIGTERM, handler)
    except ValueError:
        pass  # non-main thread


def main():
    args = get_args()
    _install_sigterm_handler()
    from ecg_byte_tpu.parallel.distributed import maybe_initialize

    maybe_initialize()  # multi-host slices; no-op on a single host
    if args.dev:
        args.epochs = 2
    set_seed(args.seed)

    vocab, merges = load_vocab_and_merges(
        os.path.join(args.data_root, f"{args.tokenizer_check}.pkl")
    )
    directory_path = make_run_dir(args)

    import time as _time

    _t0 = _time.perf_counter()
    params, config, tokenizer = build_model(
        args.model, vocab, hf_weights=args.hf_weights
    )
    print(f"Model {args.model}: vocab={config.vocab_size} "
          f"hidden={config.hidden_size} layers={config.num_layers} "
          f"(build {_time.perf_counter() - _t0:.1f}s)")
    _log_mem = os.environ.get("ECG_BYTE_LOG_MEMORY") == "1"
    if _log_mem:
        from ecg_byte_tpu.utils.profiling import log_live_bytes

        log_live_bytes("after model build + ECG-token resize")

    mesh = _mesh_from_args(args)
    peft = bool(args.peft)
    optimizer = make_optimizer(
        config.hidden_size, args.warmup,
        beta1=args.beta1, beta2=args.beta2, eps=args.eps,
        weight_decay=args.weight_decay,
    )
    state = create_train_state(
        config, optimizer, jax.random.PRNGKey(args.seed), peft=peft, params=params
    )
    if args.dis:
        state = shard_state(state, config, mesh, peft=peft, fsdp=args.fsdp > 1)
    n_train = lora_lib.count_params(state.trainable)
    print(f"Trainable parameters: {n_train}")
    if _log_mem:
        log_live_bytes("after train-state creation (params + opt state)")

    data_cfg = DataConfig(
        dataset=args.dataset, pad_to_max=args.pad_to_max,
        percentiles=args.percentiles, inference=args.inference,
    )
    pad_id = tokenizer.convert_tokens_to_ids(tokenizer.pad_token)

    if args.inference:
        test_signals, test_texts = align_signal_text_files(
            f"{args.data_root}/{args.dataset}/ecg/test",
            f"{args.data_root}/{args.dataset}/text/test",
        )
        if args.toy:
            test_signals, test_texts = sample_N_percent_from_lists(
                test_signals, test_texts, 0.25
            )
        print(len(test_signals), len(test_texts))
        test_data = ECGTokenDataset(
            test_signals, test_texts, vocab, merges, tokenizer=tokenizer, args=data_cfg
        )
        test_loader = DataLoader(
            test_data, batch_size=args.eval_batch_size, shuffle=False,
            pad_id=pad_id,
        )

        ckpt_dir = f"./runs/{args.seed}/{args.checkpoint}"
        eos_id = tokenizer.eos_token_id
        infer = {"params": state.full_params(), "lora": state.lora()}

        def generate_fn(batch):
            ids = np.asarray(batch["tokenized_signal"], np.int32)
            mask = np.asarray(batch["attn_mask"], np.int32)
            # bucket prompt lengths to multiples of 128: variable-length
            # prompts would otherwise recompile the decode program per sample
            bucket = -(-ids.shape[1] // 128) * 128
            pad = bucket - ids.shape[1]
            if pad:
                ids = np.concatenate(
                    [np.full((ids.shape[0], pad), pad_id, np.int32), ids], axis=1
                )
                mask = np.concatenate(
                    [np.zeros((mask.shape[0], pad), np.int32), mask], axis=1
                )
            out = greedy_generate(
                infer["params"], config, ids, mask,
                lora=infer["lora"], max_new_tokens=128,
                eos_token_id=eos_id, pad_token_id=pad_id,
                int8_kv=args.int8_decode,
            )

            def detok(row):
                toks = [int(t) for t in row]
                if eos_id in toks:
                    toks = toks[: toks.index(eos_id)]
                toks = [t for t in toks if t != pad_id]
                return tokenizer.decode(toks, skip_special_tokens=True)

            texts = [detok(row) for row in np.asarray(out)]
            return texts if args.eval_batch_size > 1 else texts[0]

        seeds = [0, 42, 123, 456, 789]
        all_seed_results = []
        for seed in seeds:
            print(f"Setting Seed to {seed}")
            set_seed(seed)
            loaded, _ = load_checkpoint(ckpt_dir, "best_model", state)
            state = loaded
            if state.lora() is not None and not args.no_merge_lora:
                # fold adapters into the base for serving: decode then
                # streams ONE weight set per token instead of base + 224
                # tiny adapter matmuls per step (PEFT merge-for-inference;
                # --no_merge_lora keeps the adapter-attached path, whose
                # token streams can differ on near-ties by bf16 rounding)
                infer["params"] = lora_lib.merge_lora(
                    state.full_params(), state.lora(), config
                )
                infer["lora"] = None
            else:
                infer["params"], infer["lora"] = state.full_params(), state.lora()
            if args.int8_decode:
                if infer["lora"] is not None:
                    raise SystemExit(
                        "--int8_decode requires merged adapters; drop "
                        "--no_merge_lora"
                    )
                # int8 serving copy: decode streams half the weight bytes
                # per token, and generate_fn also flips the KV cache to
                # int8 rows (models/quantized.py + init_kv_cache; opt-in,
                # outputs close-but-not-bitwise-equal to bf16)
                infer["params"] = quantize_lm_int8(infer["params"], config)
            if _log_mem and seed == seeds[0]:
                log_live_bytes("inference: after checkpoint load + "
                               "LoRA merge" + (" + int8" if args.int8_decode
                                               else ""))
            seed_results = tester(
                generate_fn, test_loader, dev=args.dev
            )
            all_seed_results.append(seed_results)
            with open(f"{ckpt_dir}/seed_{seed}_results_{args.dataset}.json", "w") as f:
                json.dump({"averages": seed_results["metrics"],
                           "metric_modes": seed_results["metric_modes"],
                           "qa_results": seed_results["qa_results"]}, f)
        stats_results = run_statistical_analysis(all_seed_results)
        with open(f"{ckpt_dir}/statistical_analysis_{args.dataset}.json", "w") as f:
            json.dump(stats_results, f)
        for metric, stats in stats_results.items():
            print(f"\n{metric}: mean {stats['mean']:.2f} std {stats['std']:.2f} "
                  f"95% CI [{stats['conf_interval'][0]:.2f}, {stats['conf_interval'][1]:.2f}]")
        print("Inference Complete")
        return

    # ---- training ----
    train_signals, train_texts = align_signal_text_files(
        f"{args.data_root}/{args.dataset}/ecg/train",
        f"{args.data_root}/{args.dataset}/text/train",
    )
    val_signals, val_texts = align_signal_text_files(
        f"{args.data_root}/{args.dataset}/ecg/val",
        f"{args.data_root}/{args.dataset}/text/val",
    )
    if args.toy:
        train_signals, train_texts = sample_N_percent_from_lists(
            train_signals, train_texts, 0.25
        )
        val_signals, val_texts = sample_N_percent_from_lists(val_signals, val_texts, 0.25)
    print(len(train_signals), len(val_signals))

    cache = not args.online_encode
    training_data = ECGTokenDataset(
        train_signals, train_texts, vocab, merges, tokenizer=tokenizer,
        args=data_cfg, cache_tokens=cache,
    )
    validation_data = ECGTokenDataset(
        val_signals, val_texts, vocab, merges, tokenizer=tokenizer,
        args=data_cfg, cache_tokens=cache,
    )
    training_loader = DataLoader(
        training_data, batch_size=args.batch_size, shuffle=True,
        seed=args.seed, pad_id=pad_id,
    )
    validation_loader = DataLoader(
        validation_data, batch_size=args.batch_size, shuffle=False, pad_id=pad_id
    )

    with mesh:
        remat = {'slim': 'slim', 'dots': 'dots', 'none': False, 'full': True}[args.remat]
        step_fn = make_train_step(
            config, optimizer, mesh if args.dis else None, remat=remat
        )
        eval_fn = make_eval_step(config, mesh if args.dis else None)
        log_fn = make_log_fn(args)
        ensure_directory_exists(directory_path)
        # rbg impl for the dropout stream: the hardware RngBitGenerator is
        # ~13% of step time cheaper than threefry at 4x1024 on v5e (mask
        # generation for LoRA dropout is otherwise VPU-bound); param init
        # above stays threefry so initializations are impl-stable
        rng = jax.random.key(args.seed, impl="rbg")

        start_epoch = 0
        if args.resume:
            state, last_epoch = load_checkpoint(directory_path, args.resume, state)
            start_epoch = last_epoch + 1
            print(f"Resumed {args.resume} at epoch {start_epoch} "
                  f"(step {int(state.step)})")

        if args.profile:
            jax.profiler.start_trace(args.profile)
        train_loss, val_loss = [], []

        def snapshot(s, limit_bytes=2 << 30):
            """Host copy of the MUTABLE state leaves for crash saving: the
            live device state is donated into the next step, so after an
            interrupt its buffers are deleted.  Under PEFT the frozen base
            is excluded (immutable, reconstructible from --hf_weights/init),
            so even the 1B flagship snapshot is a few hundred MB and always
            fits; the size bail only applies to full-finetune states."""
            return snapshot_state(s, limit_bytes=limit_bytes)

        # crash saves use the last epoch-boundary snapshot (the reference's
        # crash checkpoint is likewise the last epoch-end state dict)
        last_completed = snapshot(state)
        last_completed_epoch = start_epoch
        try:
            for epoch in range(start_epoch, args.epochs):
                state, train_dic = trainer(
                    state, step_fn, training_loader, rng, epoch=epoch,
                    directory_path=directory_path, dev=args.dev, toy=args.toy,
                    log_fn=log_fn, desc=f"Training {args.model}",
                )
                train_loss.append(train_dic["average_loss"])
                print(f"Training - Epoch: {epoch+1}\nTrain Loss: {train_dic['average_loss']}")
                if _log_mem and epoch == start_epoch:
                    log_live_bytes("after first training epoch")
                val_dic = validater(
                    state, eval_fn, validation_loader, epoch=epoch, dev=args.dev,
                    log_fn=log_fn, desc=f"Validating {args.model}",
                )
                val_loss.append(val_dic["average_loss"])
                print(f"Validating - Epoch: {epoch+1}\nVal Loss: {val_dic['average_loss']}")
                if log_fn:
                    log_fn({"train_epoch_loss": train_dic["average_loss"],
                            "val_epoch_loss": val_dic["average_loss"], "epoch": epoch})
                last_completed = snapshot(state)
                last_completed_epoch = epoch
                if early_stopping(val_loss, patience=args.patience, delta=0.01):
                    print("Validation loss has stopped decreasing. Early stopping...")
                    break
                if val_dic["average_loss"] <= min(val_loss):
                    save_checkpoint(directory_path, "best_model", state, epoch=epoch)
                    print(f"Best model saved at epoch: {epoch+1}")
                print("-----------------------------------------------------------")
        except (Exception, KeyboardInterrupt) as e:
            print(f"An error occurred: {e}")
            raise
        finally:
            # single crash save here covers exceptions, SIGTERM (converted
            # above), and normal exit — the reference's except+finally
            # double-save races shutdown
            if args.profile:
                jax.profiler.stop_trace()
                print(f"Profiler trace written to {args.profile}")
            # the live state's buffers are deleted after a mid-epoch
            # interrupt (they were donated into the jitted step); fall back
            # to the host-RAM epoch-boundary snapshot in that case
            source = save_crash_checkpoint(
                directory_path, state, last_completed,
                epoch=len(train_loss), fallback_epoch=last_completed_epoch,
            )
            if source == "snapshot":
                print("Live state was donated/deleted; crash checkpoint "
                      f"saved from the epoch-{last_completed_epoch} snapshot")
            elif source == "none":
                print("WARNING: no savable state for the crash checkpoint "
                      "(live buffers deleted and state too large to snapshot)")
            plot_train_val_loss(train_loss, val_loss, directory_path)
            print("Training Finished")


if __name__ == "__main__":
    main()

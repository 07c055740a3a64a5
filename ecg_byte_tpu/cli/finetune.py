"""Stage-2 finetuning CLI: frozen stage-1 backbone + LLM with LoRA.

TPU-native counterpart of ecg_byte/finetune.py: loads the stage-1
``best_model`` checkpoint into the frozen backbone (finetune.py:173-175),
adds the ``<signal>`` placeholder token (finetune.py:181), and trains the
projection/fusion head + LoRA adapters on the spliced-embedding LM loss
(models/fusion.py).  Inference decodes with the prompt consumed as spliced
embeddings.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
from tqdm import tqdm

from ecg_byte_tpu.cli.common import build_model, make_log_fn, set_seed
from ecg_byte_tpu.cli.dist import make_data_mesh, shard_batch
from ecg_byte_tpu.data.loader import DataLoader
from ecg_byte_tpu.data.two_stage import ECGCLIPFinetune, TwoStageConfig
from ecg_byte_tpu.infer.evaluate import tester
from ecg_byte_tpu.models import fusion as fus
from ecg_byte_tpu.models import lora as lora_lib
from ecg_byte_tpu.models import resnet1d, vision
from ecg_byte_tpu.tokenizer import load_vocab_and_merges
from ecg_byte_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from ecg_byte_tpu.train.scheduler import make_optimizer
from ecg_byte_tpu.utils.file_utils import (
    align_signal_text_files,
    ensure_directory_exists,
    sample_N_percent_from_lists,
)
from ecg_byte_tpu.utils.metrics import early_stopping, run_statistical_analysis


def get_args():
    parser = argparse.ArgumentParser(description=None)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--batch_size', type=int, default=64)
    parser.add_argument('--epochs', type=int, default=150)
    parser.add_argument('--dataset', type=str, default='mimic_500')
    parser.add_argument('--model', type=str, default=None,
                        choices=['clip_model', 'vit_model', 'clip_vit_model', 'resnet_model'])
    parser.add_argument('--llm', type=str, default='tiny-llama',
                        help='LLM preset or HF name (main CLI --model equivalent)')
    parser.add_argument('--beta1', type=float, default=0.9)
    parser.add_argument('--beta2', type=float, default=0.99)
    parser.add_argument('--eps', type=float, default=1e-8)
    parser.add_argument('--warmup', type=int, default=500)
    parser.add_argument('--weight_decay', type=float, default=1e-2)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--patience', type=int, default=5)
    parser.add_argument('--dev', action='store_true')
    parser.add_argument('--inference', action='store_true')
    parser.add_argument('--checkpoint', type=str,
                        help='stage-1 run dir name under runs/<seed>/ (train) '
                             'or stage-2 run dir (inference)')
    parser.add_argument('--first_check', type=str, default=None,
                        help='stage-1 checkpoint dir (reference --first_check)')
    parser.add_argument('--log', action='store_true')
    parser.add_argument('--dis', action='store_true')
    parser.add_argument('--int8_decode', action='store_true',
                        help='weight-only int8 serving copy of the merged '
                             'LLM for stage-2 inference (models/quantized.py)')
    parser.add_argument('--toy', action='store_true')
    parser.add_argument('--pad_to_max', type=int, default=1022)
    parser.add_argument('--num_merges', type=int, default=3500)
    parser.add_argument('--tokenizer_check', type=str, default=None)
    parser.add_argument('--percentiles', type=str, default=None)
    parser.add_argument('--hf_weights', type=str, default=None)
    parser.add_argument('--data_root', type=str, default='./data')
    parser.add_argument('--image_size', type=int, default=224)
    parser.add_argument('--tiny', action='store_true')
    return parser.parse_args()


def _backbone_setup(args, rng, probe_len: int):
    """Build frozen backbone trees + encoder kwargs for models/fusion.py."""
    if args.tiny:
        vcfg = vision.tiny_vision_config(
            image_size=args.image_size, patch_size=max(args.image_size // 4, 8)
        )
        ccfg = vision.ClipConfig(
            vision=vcfg,
            text=vision.ClipTextConfig(vocab_size=300, hidden_size=32,
                                       num_layers=2, num_heads=4,
                                       intermediate_size=64, max_length=77),
            projection_dim=24,
        )
        variant = "resnet18"
    else:
        vcfg = vision.VisionConfig(image_size=args.image_size)
        ccfg = vision.ClipConfig(
            vision=vision.VisionConfig(image_size=args.image_size, patch_size=32)
        )
        variant = "resnet101"
    ks = jax.random.split(rng, 3)
    encoders = {}
    dims = {}
    if args.model in ("clip_model", "clip_vit_model"):
        encoders["clip"] = (vision.init_clip(ks[0], ccfg), ccfg)
        dims["clip_dim"] = ccfg.projection_dim
    if args.model in ("vit_model", "clip_vit_model"):
        encoders["vit"] = (vision.init_vit(ks[1], vcfg), vcfg)
        dims["vit_dim"] = vcfg.hidden_size
    if args.model == "resnet_model":
        rp, rs, meta = resnet1d.init_resnet(ks[2], variant)
        encoders["resnet"] = (rp, rs, meta)
        dims["resnet_channels"] = meta["out_channels"]
    return encoders, dims, (vcfg, ccfg)


def _load_stage1(args, encoders):
    """Overlay stage-1 trained weights onto the backbone trees."""
    if not args.first_check:
        print("No stage-1 checkpoint given; using fresh backbone weights")
        return encoders
    ckpt_dir = f"./runs/{args.seed}/{args.first_check}"
    kind = args.model.replace("_model", "")
    if kind == "resnet":
        rp, rs, meta = encoders["resnet"]
        loaded, _ = load_checkpoint(ckpt_dir, "best_model")
        encoders["resnet"] = (loaded["trainable"]["resnet"], loaded["bn_state"], meta)
    elif kind in ("clip", "vit"):
        loaded, _ = load_checkpoint(ckpt_dir, "best_model")
        p, cfg = encoders[kind]
        encoders[kind] = (loaded["trainable"], cfg)
    elif kind == "clip_vit":
        loaded, _ = load_checkpoint(ckpt_dir, "best_model")
        encoders["clip"] = (loaded["trainable"]["clip"], encoders["clip"][1])
        encoders["vit"] = (loaded["trainable"]["vit"], encoders["vit"][1])
    print(f"Loaded stage-1 checkpoint from {ckpt_dir}")
    return encoders


def main():
    args = get_args()
    if args.dev:
        args.epochs = 2
    set_seed(args.seed)

    if args.tokenizer_check:
        vocab, merges = load_vocab_and_merges(
            os.path.join(args.data_root, f"{args.tokenizer_check}.pkl")
        )
    else:
        vocab = {}
    llm_params, llm_config, tokenizer = build_model(
        args.llm, vocab, hf_weights=args.hf_weights
    )
    tokenizer.add_tokens(["<signal>"], special_tokens=True)
    from ecg_byte_tpu.models import transformer as T

    llm_params, llm_config = T.resize_embeddings(llm_params, llm_config, len(tokenizer))
    sig_id = tokenizer.convert_tokens_to_ids("<signal>")
    pad_id = tokenizer.convert_tokens_to_ids(tokenizer.pad_token)
    eos_id = tokenizer.eos_token_id

    directory_path = (
        f"./runs/{args.seed}/{args.model}_{args.llm.replace('/', '-')}_"
        f"{args.dataset}_{args.lr}_{args.warmup}_{args.batch_size}_{args.epochs}_"
        f"{args.pad_to_max}_{args.toy}"
    )

    mesh = make_data_mesh() if args.dis else None
    rng = jax.random.PRNGKey(args.seed)
    split = args.dataset
    probe_dir = f"{args.data_root}/{split}/ecg/train"
    encoders, dims, _cfgs = _backbone_setup(args, rng, 0)
    encoders = _load_stage1(args, encoders)

    lora = lora_lib.init_lora(llm_config, jax.random.PRNGKey(args.seed + 1))
    fusion = fus.init_fusion(
        jax.random.PRNGKey(args.seed + 2), args.model, llm_config.hidden_size, **dims
    )
    trainable = {"lora": lora, "fusion": fusion}
    print(f"Trainable parameters: {lora_lib.count_params(trainable)}")

    num_patches = _cfgs[0].num_patches
    data_cfg = TwoStageConfig(
        dataset=args.dataset, pad_to_max=args.pad_to_max,
        percentiles=args.percentiles, inference=args.inference,
        model=args.model, num_patches=num_patches, image_size=args.image_size,
        seed=args.seed,
    )

    optimizer = make_optimizer(
        llm_config.hidden_size, args.warmup, beta1=args.beta1, beta2=args.beta2,
        eps=args.eps, weight_decay=args.weight_decay,
    )

    # The frozen trees (flagship LLM base + backbone encoders) must be jit
    # ARGUMENTS, not closure captures: captured, XLA embeds them as
    # compile-time constants — a 2.6 GB lowering at Llama-3.2-1B scale,
    # minutes of extra compile time, and a second on-device copy.  The
    # encoder tuples carry static leaves (configs / int metadata), so the
    # array trees travel through jit and the statics are re-attached
    # inside the trace.
    enc_arrays = {}
    enc_static = {}
    for _name, _val in encoders.items():
        if _name == "resnet":
            enc_arrays[_name] = (_val[0], _val[1])  # params, bn state
            enc_static[_name] = _val[2]  # meta (python ints)
        else:
            enc_arrays[_name] = _val[0]  # params
            enc_static[_name] = _val[1]  # config dataclass
    frozen = {"llm": llm_params, "enc": enc_arrays}

    def _rebuild_encoders(enc_arrays):
        return {
            name: ((arrs[0], arrs[1], enc_static[name]) if name == "resnet"
                   else (arrs, enc_static[name]))
            for name, arrs in enc_arrays.items()
        }

    def loss_fn(trainable, frozen, batch, rng):
        return fus.fusion_lm_loss(
            frozen["llm"], llm_config, trainable["fusion"], args.model, batch,
            sig_id, lora=trainable["lora"], dropout_rng=rng,
            encoders=_rebuild_encoders(frozen["enc"]),
        )

    @jax.jit
    def train_step(trainable, opt_state, frozen, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(trainable, frozen, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    @jax.jit
    def eval_step(trainable, frozen, batch):
        return loss_fn(trainable, frozen, batch, None)

    def to_device_batch(batch):
        out = {}
        for k, v in batch.items():
            if isinstance(v, list):
                continue
            a = np.asarray(v)
            if a.dtype == np.float64:
                a = a.astype(np.float32)
            if a.dtype in (np.int64,):
                a = a.astype(np.int32)
            out[k] = jnp.asarray(a)
        return out

    if args.inference:
        test_signals, test_texts = align_signal_text_files(
            f"{args.data_root}/{split}/ecg/test", f"{args.data_root}/{split}/text/test"
        )
        if args.toy:
            test_signals, test_texts = sample_N_percent_from_lists(
                test_signals, test_texts, 0.25
            )
        ds = ECGCLIPFinetune(test_signals, test_texts, tokenizer=tokenizer, args=data_cfg)
        loader = DataLoader(ds, batch_size=1, shuffle=False, pad_id=pad_id)
        ckpt_dir = f"./runs/{args.seed}/{args.checkpoint}"

        infer = {"params": llm_params, "lora": None}

        def generate_fn(batch):
            # bucket prompt lengths to multiples of 64 to avoid per-length
            # recompilation of the decode program
            seq = np.asarray(batch["tokenized_signal2"])
            m = np.asarray(batch["attn_mask2"])
            bucket = -(-seq.shape[1] // 64) * 64
            pad = bucket - seq.shape[1]
            if pad:
                batch = dict(batch)
                batch["tokenized_signal2"] = np.concatenate(
                    [np.full((seq.shape[0], pad), pad_id, seq.dtype), seq], axis=1
                )
                batch["attn_mask2"] = np.concatenate(
                    [np.zeros((m.shape[0], pad), m.dtype), m], axis=1
                )
            db = to_device_batch(batch)
            out = fus.fusion_generate(
                infer["params"], llm_config, trainable["fusion"], args.model,
                db, sig_id, lora=infer["lora"], encoders=encoders,
                max_new_tokens=128, eos_token_id=eos_id, pad_token_id=pad_id,
                int8_kv=args.int8_decode,
            )
            toks = [int(t) for t in np.asarray(out[0])]
            if eos_id in toks:
                toks = toks[: toks.index(eos_id)]
            return tokenizer.decode(
                [t for t in toks if t != pad_id], skip_special_tokens=True
            )

        seeds = [0, 42, 123, 456, 789]
        all_results = []
        for seed in seeds:
            set_seed(seed)
            loaded, _ = load_checkpoint(ckpt_dir, "best_model", trainable)
            trainable.update(loaded)
            if args.int8_decode:
                # fold the stage-2 adapters into the base, then serve int8
                # (embedding splice table stays exact bf16)
                from ecg_byte_tpu.models.quantized import quantize_lm_int8

                infer["params"] = quantize_lm_int8(
                    lora_lib.merge_lora(
                        llm_params, trainable["lora"], llm_config
                    ),
                    llm_config,
                )
                infer["lora"] = None
            else:
                infer["params"], infer["lora"] = llm_params, trainable["lora"]
            res = tester(generate_fn, loader, two_stage=True, dev=args.dev)
            all_results.append(res)
            with open(f"{ckpt_dir}/seed_{seed}_results_{args.dataset}.json", "w") as f:
                json.dump({"averages": res["metrics"],
                           "metric_modes": res["metric_modes"],
                           "qa_results": res["qa_results"]}, f)
        stats = run_statistical_analysis(all_results)
        with open(f"{ckpt_dir}/statistical_analysis_{args.dataset}.json", "w") as f:
            json.dump(stats, f)
        print("Inference Complete")
        return

    train_signals, train_texts = align_signal_text_files(
        f"{args.data_root}/{split}/ecg/train", f"{args.data_root}/{split}/text/train"
    )
    val_signals, val_texts = align_signal_text_files(
        f"{args.data_root}/{split}/ecg/val", f"{args.data_root}/{split}/text/val"
    )
    if args.toy:
        train_signals, train_texts = sample_N_percent_from_lists(
            train_signals, train_texts, 0.25
        )
        val_signals, val_texts = sample_N_percent_from_lists(val_signals, val_texts, 0.25)
    train_ds = ECGCLIPFinetune(train_signals, train_texts, tokenizer=tokenizer, args=data_cfg)
    val_ds = ECGCLIPFinetune(val_signals, val_texts, tokenizer=tokenizer, args=data_cfg)
    train_loader = DataLoader(train_ds, batch_size=args.batch_size, shuffle=True,
                              seed=args.seed, pad_id=pad_id)
    val_loader = DataLoader(val_ds, batch_size=args.batch_size, shuffle=False,
                            pad_id=pad_id)

    ensure_directory_exists(directory_path)
    log_fn = make_log_fn(args)
    opt_state = optimizer.init(trainable)
    step_rng = jax.random.PRNGKey(args.seed + 3)
    train_loss, val_loss = [], []
    try:
        for epoch in range(args.epochs):
            train_loader.set_epoch(epoch)
            total, n = 0.0, 0
            for batch in tqdm(train_loader, desc=f"Training {args.model}", leave=True):
                if batch is None:
                    continue
                db = to_device_batch(batch)
                if mesh is not None:
                    db = shard_batch(db, mesh)
                step_rng, sub = jax.random.split(step_rng)
                trainable, opt_state, loss = train_step(
                    trainable, opt_state, frozen, db, sub
                )
                total += float(loss)
                n += 1
                if args.dev and n >= 10:
                    break
            train_loss.append(total / max(n, 1))
            if log_fn:
                log_fn({"train_epoch_loss": train_loss[-1], "epoch": epoch})
            print(f"Training - Epoch: {epoch+1}\nTrain Loss: {train_loss[-1]}")

            total, n = 0.0, 0
            for batch in tqdm(val_loader, desc=f"Validating {args.model}", leave=True):
                if batch is None:
                    continue
                db = to_device_batch(batch)
                if mesh is not None:
                    db = shard_batch(db, mesh)
                total += float(eval_step(trainable, frozen, db))
                n += 1
                if args.dev and n >= 10:
                    break
            val_loss.append(total / max(n, 1))
            if log_fn:
                log_fn({"val_epoch_loss": val_loss[-1], "epoch": epoch})
            print(f"Validating - Epoch: {epoch+1}\nVal Loss: {val_loss[-1]}")

            if early_stopping(val_loss, patience=args.patience, delta=0.01):
                print("Validation loss has stopped decreasing. Early stopping...")
                break
            if val_loss[-1] <= min(val_loss):
                save_checkpoint(directory_path, "best_model", trainable, epoch=epoch)
                print(f"Best model saved at epoch: {epoch+1}")
    finally:
        # single save: finally also runs on exceptions, and the fusion step
        # does not donate its inputs so ``trainable`` is always alive here
        save_checkpoint(directory_path, "crash_model", trainable, epoch=len(train_loss))
        print("Training Finished")


if __name__ == "__main__":
    main()

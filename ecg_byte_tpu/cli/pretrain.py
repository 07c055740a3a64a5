"""Stage-1 pretraining CLI: clip | vit | clip_vit | resnet backbones.

TPU-native counterpart of ecg_byte/pretrain.py (same flags, run-dir
fingerprint, per-epoch ``best_model`` checkpoint, train-only loop).  The HF
backbones are replaced by the functional JAX implementations in
models/vision.py and models/resnet1d.py; the frozen MedCPT text encoder
(pretrain.py:146-151) becomes ``load_frozen_text_encoder`` (HF when local,
hash-embedding stand-in offline).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
from tqdm import tqdm

from ecg_byte_tpu.cli.common import make_log_fn, set_seed
from ecg_byte_tpu.cli.dist import make_data_mesh, shard_batch
from ecg_byte_tpu.data.loader import DataLoader
from ecg_byte_tpu.data.text_tokenizer import ByteTextTokenizer
from ecg_byte_tpu.data.two_stage import ECGCLIPPretrain, TwoStageConfig
from ecg_byte_tpu.models import encoders as enc
from ecg_byte_tpu.models import resnet1d, vision
from ecg_byte_tpu.train.checkpoint import save_checkpoint
from ecg_byte_tpu.train.scheduler import make_optimizer
from ecg_byte_tpu.utils.file_utils import align_signal_text_files, ensure_directory_exists


def get_args():
    parser = argparse.ArgumentParser(description=None)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--batch_size', type=int, default=128)
    parser.add_argument('--epochs', type=int, default=150)
    parser.add_argument('--device', type=str, default=None)
    parser.add_argument('--dataset', type=str, default='mimic_500')
    parser.add_argument('--model', type=str, default=None,
                        choices=['clip', 'vit', 'clip_vit', 'resnet'])
    parser.add_argument('--beta1', type=float, default=0.9)
    parser.add_argument('--beta2', type=float, default=0.99)
    parser.add_argument('--eps', type=float, default=1e-8)
    parser.add_argument('--warmup', type=int, default=500)
    parser.add_argument('--weight_decay', type=float, default=1e-2)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--patience', type=int, default=5)
    parser.add_argument('--dev', action='store_true')
    parser.add_argument('--checkpoint', type=str)
    parser.add_argument('--log', action='store_true')
    parser.add_argument('--dis', action='store_true')
    parser.add_argument('--gpus', type=str, default='0')
    parser.add_argument('--ports', type=str, default='12356')
    parser.add_argument('--percentiles', type=str, default=None)
    # TPU-native additions
    parser.add_argument('--data_root', type=str, default='./data')
    parser.add_argument('--image_size', type=int, default=224)
    parser.add_argument('--tiny', action='store_true',
                        help='tiny backbone configs for smoke tests')
    parser.add_argument('--text_encoder', type=str, default=None,
                        help='local MedCPT/BERT checkpoint dir for the '
                             'frozen MERL text tower (vocab.txt tokenized '
                             'by the in-repo WordPiece)')
    parser.add_argument('--allow_hash_text_encoder', action='store_true',
                        help='degrade to the hash text encoder when the '
                             '--text_encoder checkpoint fails to load '
                             '(default: raise loudly)')
    return parser.parse_args()


def build_backbone(args, rng):
    """Returns (trainable, static, loss_fn, hidden_size_for_noam).

    ``loss_fn(trainable, static, batch, rng) -> (loss, new_static)``.
    """
    if args.tiny:
        vcfg = vision.tiny_vision_config(image_size=args.image_size,
                                         patch_size=max(args.image_size // 4, 8))
        ccfg = vision.ClipConfig(
            vision=vcfg,
            text=vision.ClipTextConfig(vocab_size=300, hidden_size=32,
                                       num_layers=2, num_heads=4,
                                       intermediate_size=64, max_length=77),
            projection_dim=24,
        )
        resnet_variant = "resnet18"
    else:
        vcfg = vision.VisionConfig(image_size=args.image_size)
        ccfg = vision.ClipConfig(vision=vision.VisionConfig(
            image_size=args.image_size, patch_size=32))
        resnet_variant = "resnet101"

    ks = jax.random.split(rng, 4)
    if args.model == 'clip':
        params = vision.init_clip(ks[0], ccfg)

        def loss_fn(p, static, batch, rng):
            out = vision.clip_forward(
                p, ccfg, batch["clip_input_ids"], batch["clip_att_mask"],
                batch["clip_pixel"], return_loss=True,
            )
            return out["loss"], static

        return params, {}, loss_fn, 768

    if args.model == 'vit':
        params = vision.init_vit(ks[0], vcfg)

        def loss_fn(p, static, batch, rng):
            return vision.vit_mim_loss(
                p, vcfg, batch["vit_pixel"], batch["mask"]
            ), static

        return params, {}, loss_fn, vcfg.hidden_size

    if args.model == 'clip_vit':
        params = {"clip": vision.init_clip(ks[0], ccfg),
                  "vit": vision.init_vit(ks[1], vcfg)}

        def loss_fn(p, static, batch, rng):
            clip_out = vision.clip_forward(
                p["clip"], ccfg, batch["clip_input_ids"], batch["clip_att_mask"],
                batch["clip_pixel"], return_loss=True,
            )
            mim = vision.vit_mim_loss(p["vit"], vcfg, batch["vit_pixel"], batch["mask"])
            return clip_out["loss"] + mim, static

        return params, {}, loss_fn, vcfg.hidden_size

    if args.model == 'resnet':
        rp, rs, meta = resnet1d.init_resnet(ks[0], resnet_variant)
        # attention-pool spatial dim = exact feature length after stem+stages
        feat_shape = jax.eval_shape(
            lambda p, s, x: resnet1d.resnet_forward(p, s, meta, x)[0],
            rp, rs, jax.ShapeDtypeStruct((1, 12, args.signal_len), jnp.float32),
        )
        head = enc.init_merl_head(
            ks[1], feature_channels=meta["out_channels"],
            spacial_dim=int(feat_shape.shape[-1]),
        )
        params = {"resnet": rp, "head": head}
        text_encoder = enc.load_frozen_text_encoder(
            getattr(args, "text_encoder", None),
            allow_hash_fallback=getattr(args, "allow_hash_text_encoder", False),
        )

        def loss_fn(p, bn_state, batch, rng):
            # meta (python structure) is closed over; only bn_state is traced
            feats, new_bn = resnet1d.resnet_forward(
                p["resnet"], bn_state, meta, batch["norm_signal"], train=True,
            )
            text_emb = batch["text_emb"]  # computed host-side (frozen)
            loss, _aux = enc.merl_pretrain_loss(
                p["head"], feats, text_emb, dropout_rng=rng,
            )
            return loss, new_bn

        loss_fn.text_encoder = text_encoder
        loss_fn.is_resnet = True
        return params, rs, loss_fn, 256

    raise ValueError(args.model)


def main():
    args = get_args()
    if args.dev:
        args.epochs = 2
    set_seed(args.seed)

    directory_path = (
        f"./runs/{args.seed}/{args.model}_{args.dataset}_{args.lr}_{args.beta1}_"
        f"{args.beta2}_{args.eps}_{args.weight_decay}_{args.warmup}_"
        f"{args.batch_size}_{args.epochs}"
    )
    ensure_directory_exists(directory_path)

    train_signals, train_texts = align_signal_text_files(
        f"{args.data_root}/{args.dataset}/ecg/train",
        f"{args.data_root}/{args.dataset}/text/train",
    )
    print(len(train_signals), len(train_texts))

    # probe one signal for geometry (attention-pool spatial dim)
    probe = np.load(train_signals[0])
    args.signal_len = probe.shape[-1]

    mesh = make_data_mesh() if args.dis else None
    rng = jax.random.PRNGKey(args.seed)
    trainable, static, loss_fn, hidden = build_backbone(args, rng)

    tokenizer = ByteTextTokenizer()
    # resnet/MERL with a real MedCPT checkpoint: tokenize the reports with
    # the checkpoint's own WordPiece vocab (merl.py:197-201 semantics)
    enc_tok = getattr(getattr(loss_fn, "text_encoder", None), "tokenizer", None)
    if enc_tok is not None:
        tokenizer = enc_tok
    vcfg_patches = ((args.image_size // (args.image_size // 4 if args.tiny else 16)) ** 2)
    data_cfg = TwoStageConfig(
        dataset=args.dataset, model=args.model, percentiles=args.percentiles,
        num_patches=vcfg_patches, image_size=args.image_size, seed=args.seed,
    )
    training_data = ECGCLIPPretrain(
        train_signals, train_texts, tokenizer=tokenizer, args=data_cfg
    )
    training_loader = DataLoader(
        training_data, batch_size=args.batch_size, shuffle=True, seed=args.seed
    )

    optimizer = make_optimizer(
        hidden, args.warmup, beta1=args.beta1, beta2=args.beta2,
        eps=args.eps, weight_decay=args.weight_decay,
    )
    opt_state = optimizer.init(trainable)
    text_encoder = getattr(loss_fn, "text_encoder", None)

    @jax.jit
    def train_step(trainable, opt_state, static, batch, rng):
        (loss, new_static), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, static, batch, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, new_static, loss

    log_fn = make_log_fn(args)
    step_rng = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.epochs):
        training_loader.set_epoch(epoch)
        total, n = 0.0, 0
        for step, batch in enumerate(
            tqdm(training_loader, desc=f"Training {args.model}", leave=True)
        ):
            if batch is None:
                continue
            if text_encoder is not None:
                batch["text_emb"] = text_encoder(
                    batch["resnet_input_ids"], batch["resnet_att_mask"]
                )
                batch = {k: v for k, v in batch.items()
                         if k not in ("resnet_input_ids", "resnet_att_mask")}
            batch = {k: jnp.asarray(v) for k, v in batch.items()
                     if not isinstance(v, list)}
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            step_rng, sub = jax.random.split(step_rng)
            trainable, opt_state, static, loss = train_step(
                trainable, opt_state, static, batch, sub
            )
            total += float(loss)
            n += 1
            if log_fn:
                log_fn({"train_step_loss": float(loss)})
            if args.dev and n >= 10:
                break
        avg = total / max(n, 1)
        if log_fn:
            log_fn({"train_epoch_loss": avg, "epoch": epoch})
        print(f"Training - Epoch: {epoch+1}\nTrain Loss: {avg}")
        save_checkpoint(
            directory_path, "best_model",
            {"trainable": trainable, "bn_state": static},
            epoch=epoch,
        )
        print(f"Model saved at epoch: {epoch+1}")
        print("-----------------------------------------------------------")


if __name__ == "__main__":
    main()

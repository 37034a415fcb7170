"""Qualcomm keyword RCNN training (vanilla / PGD-adversarial).

Rebuild of ``audio_models/RCNN_KWS/train.py``: random-length crops
(0.747–2.747 s, ``:48-58``), optional waveform PGD adversarial training
(``:79-116``), checkpoints for best clean and best robust accuracy
(``:208-228``). TPU adaptation: crop lengths are bucketed to a small static
set so each bucket compiles once instead of recompiling per random length.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_path", default="datasets/qualcomm_keyword_speech_dataset")
    p.add_argument("--mode", choices=["vanilla", "adv"], default="vanilla")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--n_mels", type=int, default=32)
    p.add_argument("--adv_eps", type=float, default=0.002)
    p.add_argument("--adv_alpha", type=float, default=0.0004)
    p.add_argument("--adv_steps", type=int, default=10)
    p.add_argument("--min_sec", type=float, default=0.747)
    p.add_argument("--max_sec", type=float, default=2.747)
    p.add_argument("--length_buckets", type=int, default=5)
    p.add_argument("--save_dir", type=str, default="checkpoints/rcnn_kws")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_batches_per_epoch", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import optax

    from ..attacks.losses import cross_entropy
    from ..core.checkpoint import save_pytree
    from ..data import DataLoader, QualcommKeywordSpottingDataset
    from ..models.rcnn_kws import KWSModel
    from ..ops import Wave2Spect
    from ..train.classifier import pgd_attack_waveform
    from ..transforms import Compose, FixAudioLength, LoadAudio

    rng_np = np.random.default_rng(args.seed)
    sr = 16000
    buckets = np.linspace(args.min_sec * sr, args.max_sec * sr, args.length_buckets).astype(int)
    buckets = np.unique((buckets // 512) * 512)  # hop-aligned static lengths

    def collate(batch):
        length = int(rng_np.choice(buckets))
        out = []
        for item in batch:
            s = item["samples"]
            if len(s) > length:
                start = int(rng_np.integers(0, len(s) - length + 1))
                s = s[start : start + length]
            else:
                s = np.pad(s, (0, length - len(s)))
            out.append(s)
        return np.stack(out), np.asarray([i["target"] for i in batch])

    model = KWSModel(in_size=args.n_mels, num_classes=4)
    w2s = Wave2Spect(n_mels=args.n_mels)
    variables = model.init(jax.random.PRNGKey(args.seed), jnp.zeros((1, 1, args.n_mels, 32)))
    params = variables["params"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    def loss_fn(p, x, y):
        logits = model.apply({"params": p}, w2s(x))
        return jnp.mean(cross_entropy(logits, y))

    @jax.jit
    def train_step(p, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    @jax.jit
    def adv_train_step(p, opt_state, x, y):
        x_adv = pgd_attack_waveform(lambda xx, yy: loss_fn(p, xx, yy), x, y,
                                    args.adv_eps, args.adv_alpha, args.adv_steps)
        loss, grads = jax.value_and_grad(loss_fn)(p, x_adv, y)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    @jax.jit
    def eval_step(p, x, y):
        logits = model.apply({"params": p}, w2s(x))
        clean_acc = jnp.mean(jnp.argmax(logits, -1) == y)
        x_adv = pgd_attack_waveform(lambda xx, yy: loss_fn(p, xx, yy), x, y,
                                    args.adv_eps, args.adv_alpha, args.adv_steps)
        robust_acc = jnp.mean(jnp.argmax(model.apply({"params": p}, w2s(x_adv)), -1) == y)
        return clean_acc, robust_acc

    load = Compose([LoadAudio()])
    train_ds = QualcommKeywordSpottingDataset(args.data_path, transform=load, split="Train")
    valid_ds = QualcommKeywordSpottingDataset(
        args.data_path, transform=Compose([LoadAudio(), FixAudioLength(2.0)]), split="Valid"
    )
    step_fn = adv_train_step if args.mode == "adv" else train_step
    best_clean = best_robust = 0.0
    os.makedirs(args.save_dir, exist_ok=True)

    for epoch in range(args.epochs):
        loader = DataLoader(train_ds, batch_size=args.batch_size, shuffle=True, drop_last=True,
                            seed=args.seed + epoch, collate_fn=collate)
        losses = []
        for bi, (x, y) in enumerate(loader):
            if args.max_batches_per_epoch and bi >= args.max_batches_per_epoch:
                break
            params, opt_state, loss = step_fn(params, opt_state, jnp.asarray(x)[:, None, :], jnp.asarray(y))
            losses.append(float(loss))

        vl = DataLoader(valid_ds, batch_size=args.batch_size, shuffle=False)
        cas, ras, ns = [], [], []
        for batch in vl:
            x = jnp.asarray(batch["samples"])[:, None, :]
            y = jnp.asarray(batch["target"])
            ca, ra = eval_step(params, x, y)
            cas.append(float(ca) * len(y))
            ras.append(float(ra) * len(y))
            ns.append(len(y))
        clean, robust = sum(cas) / sum(ns), sum(ras) / sum(ns)
        print(f"epoch {epoch}: loss {np.mean(losses):.4f}  clean {100 * clean:.2f}%  robust {100 * robust:.2f}%")
        if clean > best_clean:
            best_clean = clean
            save_pytree(os.path.join(args.save_dir, "kws-best-acc"), {"params": params})
        if robust > best_robust:
            best_robust = robust
            save_pytree(os.path.join(args.save_dir, "kws-best-robust-acc"), {"params": params})
    return params


if __name__ == "__main__":
    main()

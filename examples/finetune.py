"""Fine-tuning example — the reference finetune_example.ipynb, TPU-native.

Runs end-to-end with a JSONL manifest of {"audio_filepath": ..., "text": ...}
lines (or with --synthetic for a smoke run without data).  Mirrors the
reference recipe: AdamW, lr 5e-5, linear schedule with 5% warmup, bf16
compute, greedy-WER eval per epoch; exceeds it with orbax train-state
checkpointing and resume.

    python examples/finetune.py --manifest train.jsonl --eval-manifest dev.jsonl \
        --init-checkpoint artifacts/model.safetensors --epochs 5 --batch-size 16
    python examples/finetune.py --synthetic          # smoke test, random data
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import jax

if os.environ.get("TONE_TPU_FORCE_CPU"):
    # Same escape hatch as the CLI: site plugins can force a (possibly
    # tunneled) accelerator backend; this pins CPU reliably.
    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_items(manifest: Path) -> list[dict]:
    from tone_tpu.audio import read_audio
    from tone_tpu.eval import read_manifest

    items = read_manifest(manifest)
    for item in items:
        item["audio"] = read_audio(item["audio_filepath"]).astype(np.float32) / 32767.0
    return items


def synthetic_items(n: int = 32) -> list[dict]:
    rng = np.random.default_rng(0)
    texts = ["да", "нет", "привет мир", "добрый день"]
    return [{"audio": rng.normal(0, 0.1, rng.integers(4000, 12000)).astype(np.float32),
             "text": texts[i % len(texts)]} for i in range(n)]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--manifest", type=Path)
    parser.add_argument("--eval-manifest", type=Path)
    parser.add_argument("--init-checkpoint", type=Path,
                        help="torch .safetensors/.bin or tone_tpu checkpoint dir")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=5e-5)
    parser.add_argument("--grad-accum", type=int, default=1,
                        help="gradient accumulation steps (effective batch = "
                             "batch-size x grad-accum)")
    parser.add_argument("--out", type=Path, default=Path("finetuned"))
    parser.add_argument("--resume", type=Path, default=None)
    args = parser.parse_args()

    from tone_tpu.checkpoint import save_checkpoint
    from tone_tpu.config import ToneConfig
    from tone_tpu.training import DataCollatorCTCWithPadding, Trainer, TrainerConfig

    config = ToneConfig()
    if args.init_checkpoint:
        from tone_tpu.acoustic import StreamingCTCModel

        variables = StreamingCTCModel.from_local(args.init_checkpoint).variables
        variables = jax.tree.map(lambda x: np.asarray(x, np.float32), variables)
    else:
        from tone_tpu.core.model import init_model_params

        print("note: training from random init (no --init-checkpoint)")
        variables = init_model_params(jax.random.PRNGKey(0), config)

    items = synthetic_items() if args.synthetic else load_items(args.manifest)
    eval_items = (items[:8] if args.synthetic or not args.eval_manifest
                  else load_items(args.eval_manifest))

    steps_per_epoch = max(len(items) // args.batch_size, 1)
    trainer = Trainer(config, TrainerConfig(
        learning_rate=args.lr,
        total_steps=max(steps_per_epoch * args.epochs // args.grad_accum, 1),
        grad_accum_steps=args.grad_accum,
    ))
    state = trainer.create_state(variables)
    if args.resume:
        state = trainer.restore(args.resume, state)
        print(f"resumed at step {int(state.step)}")

    # Pad every batch to the dataset-max audio length so XLA compiles the
    # train step once (shape bucketing matters on TPU).
    max_audio = max(len(it["audio"]) for it in items + eval_items)
    collator = DataCollatorCTCWithPadding(
        pad_audio_to_multiple_of=-(-max_audio // 2400) * 2400)
    rng = np.random.default_rng(0)

    def batches(data):
        order = rng.permutation(len(data))
        for i in range(0, len(data) - args.batch_size + 1, args.batch_size):
            feats = [{"input_values": data[j]["audio"], "labels": data[j]["text"]}
                     for j in order[i:i + args.batch_size]]
            yield collator(feats)

    def eval_batches():
        for i in range(0, len(eval_items), args.batch_size):
            chunk = eval_items[i:i + args.batch_size]
            yield collator([{"input_values": it["audio"], "labels": it["text"]}
                            for it in chunk])

    refs = [it["text"] for it in eval_items]
    for epoch in range(args.epochs):
        losses = []
        for batch in batches(items):
            state, loss = trainer.train_step(state, batch)
            losses.append(float(loss))
        wer = trainer.eval_wer(state, eval_batches(), refs)
        print(f"epoch {epoch}: loss {np.mean(losses):.3f}  greedy WER {wer:.4f}")
        trainer.save(args.out / "train_state", state)

    save_checkpoint(args.out / "model",
                    {"params": state.params, "batch_stats": state.batch_stats},
                    config)
    print(f"saved inference checkpoint to {args.out / 'model'}")


if __name__ == "__main__":
    main()

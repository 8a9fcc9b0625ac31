"""End-to-end proof on synthetic data: train -> deploy -> stream.

Trains a tiny (1.5 M-param) Conformer CTC from scratch on synthetic
tone-audio (each character rendered as a pure tone), then deploys the
trained weights through the STREAMING pipeline — chunked 300 ms inference
with carried recurrent state and greedy decoding — and checks exact
transcription.  Demonstrates the whole framework loop (data -> mesh
training -> checkpoint -> streaming serving numerics) without any external
dataset or pretrained weights.

Expected output: train WER 0.000 and 6/6 exact streaming matches
(run on a CPU mesh: takes ~15-20 min; ~400 training steps).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from tone_tpu.config import EncoderConfig, LABELS, ToneConfig


def tiny_config() -> ToneConfig:
    enc = EncoderConfig(
        n_layers=4, d_model=128, n_heads=4, rope_dim=16, ff_expansion_factor=2,
        conv_kernel_size=15, subsampling_conv_channels=(16, 32),
        mhsa_stateless_layers=3, reduction_position=1, upsample_position=2,
        should_recompute_att_scores=(True, True, True, True),
        dropout=0.0, dropout_att=0.0,
    )
    return ToneConfig(encoder=enc, compute_dtype="float32")


def synth(text: str, sr: int = 8000, char_dur: float = 0.12) -> np.ndarray:
    """Render text as a sequence of character-specific pure tones."""
    freqs = {c: 300 + 150 * i for i, c in enumerate(LABELS[:12])}
    parts = [np.zeros(800)]
    for ch in text:
        n = int(char_dur * sr)
        t = np.arange(n) / sr
        parts.append(0.5 * np.sin(2 * np.pi * freqs[ch] * t) if ch in freqs
                     else np.zeros(n))
    parts.append(np.zeros(800))
    return np.concatenate(parts).astype(np.float32)


def make_dataset() -> list[dict]:
    words = ["аб", "вг", "дед", "абв", "где", "ба"]
    texts = [" ".join([words[i % 6], words[(i + 2) % 6]]) for i in range(12)]
    return [{"audio": synth(t), "text": t} for t in texts]


def run_training(steps: int = 400, lr: float = 1e-3, seed: int = 0):
    """Train the tiny model; returns (cfg, trainer, state, collator, items)."""
    from tone_tpu.core.model import init_model_params
    from tone_tpu.parallel.mesh import make_mesh
    from tone_tpu.training import DataCollatorCTCWithPadding, Trainer, TrainerConfig

    cfg = tiny_config()
    variables = init_model_params(jax.random.PRNGKey(seed), cfg)
    items = make_dataset()
    max_audio = max(len(i["audio"]) for i in items)
    collator = DataCollatorCTCWithPadding(
        pad_audio_to_multiple_of=-(-max_audio // 2400) * 2400)

    n_dev = len(jax.devices())
    mesh = make_mesh(n_data=min(4, n_dev), n_model=2 if n_dev >= 8 else 1)
    trainer = Trainer(cfg, TrainerConfig(total_steps=steps, learning_rate=lr),
                      mesh=mesh)
    state = trainer.create_state(variables)
    rng = np.random.default_rng(seed)
    for step in range(steps):
        idx = rng.choice(len(items), 8)
        batch = collator([{"input_values": items[j]["audio"],
                           "labels": items[j]["text"]} for j in idx])
        state, loss = trainer.train_step(state, batch)
        if step % 50 == 0:
            print(f"step {step}: loss {float(loss):.3f}", flush=True)
    return cfg, trainer, state, collator, items


def run(steps: int = 400, lr: float = 1e-3, seed: int = 0) -> tuple[float, int, int]:
    """Returns (train WER, exact streaming matches, total checked)."""
    cfg, trainer, state, collator, items = run_training(steps, lr, seed)

    eval_batch = collator([{"input_values": it["audio"], "labels": it["text"]}
                           for it in items])
    wer = trainer.eval_wer(state, [eval_batch], [it["text"] for it in items])
    print(f"train WER: {wer:.3f}")

    # Deploy through the chunked streaming pipeline.
    from tone_tpu.acoustic import StreamingCTCModel
    from tone_tpu.decoder import GreedyCTCDecoder
    from tone_tpu.pipeline import StreamingCTCPipeline
    from tone_tpu.splitter import StreamingLogprobSplitter

    model = StreamingCTCModel(
        {"params": jax.tree.map(np.asarray, state.params),
         "batch_stats": jax.tree.map(np.asarray, state.batch_stats)}, cfg)
    pipe = StreamingCTCPipeline(model, StreamingLogprobSplitter(), GreedyCTCDecoder())
    hits = 0
    checked = items[:6]
    for it in checked:
        audio_i32 = np.clip(it["audio"] * 32767, -32768, 32767).astype(np.int32)
        text = " ".join(p.text for p in pipe.forward_offline(audio_i32))
        print(f"  ref={it['text']!r} hyp={text!r}")
        hits += text == it["text"]
    print(f"streaming pipeline exact matches: {hits}/{len(checked)}")
    return wer, hits, len(checked)


if __name__ == "__main__":
    run()

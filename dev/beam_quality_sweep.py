"""Quantify the device-beam quality gap on a TRAINED model.

VERDICT-r2 weak #1: the device search defaults to width 32 with
8-hypothesis rescoring vs the reference's width-200 full fusion
(tone/decoder.py:133) — prove what that costs.  This harness trains the
tiny synthetic Conformer (examples/train_tiny_e2e.py), builds a bigram
word LM over its corpus, then decodes noise-corrupted eval audio with:

* host prefix beam search, width 200, full LM fusion (the reference
  configuration — the gold standard);
* the on-TPU batched search at widths 16/32/64, in both LM modes
  (host n-best rescoring and full device fusion);

and reports WER vs ground truth plus transcript agreement with the
host-200 decode at each noise level.  Run:

    python dev/beam_quality_sweep.py [--steps 150] [--widths 16 32 64]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from collections import Counter
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def corpus_lm(order: int = 2):
    """Bigram LM over the synthetic training corpus' word distribution."""
    from train_tiny_e2e import make_dataset

    sents = [it["text"].split() for it in make_dataset()]
    counters = [Counter() for _ in range(order)]
    for s in sents:
        toks = ["<s>"] + s + ["</s>"]
        for n in range(1, order + 1):
            for i in range(len(toks) - n + 1):
                counters[n - 1][tuple(toks[i:i + n])] += 1
    counters[0][("<unk>",)] += 1
    ngrams = []
    for n, counter in enumerate(counters, start=1):
        tot = sum(counter.values())
        ngrams.append({g: (round(math.log10(c / tot), 4),
                           0.0 if n == order else -0.35)
                       for g, c in counter.items()})
    return ngrams


def utterance_logprobs(model, cfg, audio_f32: np.ndarray, noise: float,
                       rng: np.random.Generator) -> np.ndarray:
    """Offline logprobs for one noisy utterance via the streaming model."""
    from tone_tpu.core.model import apply_streaming, init_streaming_state

    noisy = audio_f32 + rng.normal(0, noise, len(audio_f32))
    audio = np.clip(noisy * 32767, -32768, 32767).astype(np.int32)
    audio = np.pad(audio, (2400, 2400))
    audio = np.pad(audio, (0, -len(audio) % 2400))
    state = init_streaming_state(cfg, 1)
    out = []
    for i in range(len(audio) // 2400):
        lp, state = apply_streaming(model, cfg, audio[None, i * 2400:(i + 1) * 2400], state)
        out.append(np.asarray(lp, np.float32)[0])
    return np.concatenate(out, axis=0)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=150)
    parser.add_argument("--widths", type=int, nargs="+", default=[16, 32, 64])
    parser.add_argument("--noises", type=float, nargs="+",
                        default=[0.15, 0.3, 0.45])
    parser.add_argument("--repeats", type=int, default=4,
                        help="noisy copies of each eval utterance")
    parser.add_argument("--blend", action="store_true",
                        help="evaluate on blends of two utterances "
                             "(acoustically ambiguous — beams must compete)")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from train_tiny_e2e import make_dataset, run_training

    from tone_tpu.decoder import BeamSearchCTCDecoder, DeviceBeamSearchCTCDecoder
    from tone_tpu.decoding.lm import ArpaLM
    from tone_tpu.decoding.device_lm import DeviceLM
    from tone_tpu.training.wer import word_error_rate

    cfg, _, state, _, _ = run_training(steps=args.steps)
    model = {"params": jax.tree.map(np.asarray, state.params),
             "batch_stats": jax.tree.map(np.asarray, state.batch_stats)}
    ngrams = corpus_lm()
    arpa = ArpaLM(ngrams)
    dev_lm = DeviceLM.from_ngrams(ngrams)

    host = BeamSearchCTCDecoder(arpa, beam_width=200)
    decoders = {"host_w200_fusion": host}
    for w in args.widths:
        decoders[f"device_w{w}_rescore"] = DeviceBeamSearchCTCDecoder(
            arpa, beam_width=w, nbest=8)
        decoders[f"device_w{w}_fusion"] = DeviceBeamSearchCTCDecoder(
            dev_lm, beam_width=w, fusion=True)

    items = make_dataset()
    if args.blend:
        # Acoustically ambiguous eval: mix two utterances' audio so the AM
        # is torn between transcripts and the LM/beam must arbitrate —
        # without this, the tiny task is so separable that every width
        # makes identical decisions and the sweep can't discriminate.
        from train_tiny_e2e import synth

        blended = []
        texts = sorted({it["text"] for it in items})
        for i, ta in enumerate(texts):
            for tb in texts[i + 1:]:
                a, b = synth(ta), synth(tb)
                n = min(len(a), len(b))
                for mix in (0.4, 0.5, 0.6):
                    blended.append({
                        "audio": mix * a[:n] + (1 - mix) * b[:n],
                        "text": ta if mix >= 0.5 else tb,
                    })
        items = blended

    rng = np.random.default_rng(7)
    rows = []
    for noise in args.noises:
        evals = []  # (logprobs, ref)
        for rep in range(args.repeats):
            for it in items:
                evals.append((utterance_logprobs(model, cfg, it["audio"],
                                                 noise, rng), it["text"]))
        refs = [ref for _, ref in evals]
        hyps = {}
        for name, dec in decoders.items():
            if hasattr(dec, "forward_batch"):
                hyps[name] = dec.forward_batch([lp for lp, _ in evals])
            else:
                hyps[name] = [dec.forward(lp) for lp, _ in evals]
        gold = hyps["host_w200_fusion"]
        for name in decoders:
            agree = float(np.mean([h == g for h, g in zip(hyps[name], gold)]))
            rows.append({
                "noise": noise,
                "decoder": name,
                "wer": round(word_error_rate(hyps[name], refs), 4),
                "agree_vs_host200": round(agree, 4),
                "n": len(refs),
            })
            print(json.dumps(rows[-1], ensure_ascii=False), flush=True)

    print("\n== summary (WER delta vs host_w200_fusion) ==")
    for noise in args.noises:
        base = next(r["wer"] for r in rows
                    if r["noise"] == noise and r["decoder"] == "host_w200_fusion")
        for r in rows:
            if r["noise"] == noise:
                print(f"noise={noise} {r['decoder']:24s} wer={r['wer']:.4f} "
                      f"delta={r['wer'] - base:+.4f} agree={r['agree_vs_host200']:.3f}")


if __name__ == "__main__":
    main()

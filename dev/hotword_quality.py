"""Quantify hotword biasing on a TRAINED model: entity recall vs false alarms.

Hotword biasing targets the reference's weakest WER category — named
entities (reference README.md:153).  This harness trains the tiny synthetic
Conformer (examples/train_tiny_e2e.py), picks an "entity" word from its
corpus, then decodes noise-corrupted eval audio with the host beam search
and the on-TPU search at hotword weights {0, 1, 2, 4, 8} and reports, per
noise level and weight:

* entity recall   — P(entity in hypothesis | entity in reference);
* false alarms    — P(entity in hypothesis | entity NOT in reference);
* overall WER.

The useful regime is where recall rises before false alarms do; the curve
shows the over-biasing cliff (a too-large weight hallucinates the entity —
same failure mode as pyctcdecode's hotword_weight).  Run:

    python dev/hotword_quality.py [--steps 150] [--weights 0 1 2 4 8]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from beam_quality_sweep import utterance_logprobs  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=150)
    parser.add_argument("--weights", type=float, nargs="+",
                        default=[0.0, 1.0, 2.0, 4.0, 8.0])
    parser.add_argument("--noises", type=float, nargs="+", default=[0.3, 0.45])
    parser.add_argument("--copies", type=int, default=6)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from train_tiny_e2e import run_training, synth

    from tone_tpu.config import LABELS
    from tone_tpu.decoder import DeviceBeamSearchCTCDecoder
    from tone_tpu.decoding.beam import ctc_beam_search
    from tone_tpu.decoding.hotwords import HotwordScorer
    from tone_tpu.training.wer import word_error_rate

    cfg, _, state, _, items = run_training(steps=args.steps)
    model = {"params": jax.tree.map(np.asarray, state.params),
             "batch_stats": jax.tree.map(np.asarray, state.batch_stats)}

    entity = "дед"  # in-corpus word standing in for a client/product name
    with_e = [it["text"] for it in items if entity in it["text"].split()]
    without = [it["text"] for it in items if entity not in it["text"].split()]
    texts = with_e + without
    rng = np.random.default_rng(0)

    results = []
    for noise in args.noises:
        cases = []  # (reference_text, logprobs)
        for copy in range(args.copies):
            for text in texts:
                audio = synth(text).astype(np.float32)
                cases.append((text, utterance_logprobs(model, cfg, audio,
                                                       noise, rng)))
        for weight in args.weights:
            hw = HotwordScorer([entity], weight) if weight else None
            tables = None
            refs, host_hyps = [], []
            for text, lp in cases:
                refs.append(text)
                host_hyps.append(ctc_beam_search(
                    lp.astype(np.float64), LABELS, None, beam_width=32,
                    hotwords=hw))
            dev_dec = DeviceBeamSearchCTCDecoder(
                beam_width=32, hotwords=[entity] if weight else None,
                hotword_weight=weight or 10.0)
            dev_hyps = dev_dec.forward_batch([lp for _, lp in cases])

            def stats(hyps):
                rec_n = rec_hit = fa_n = fa_hit = 0
                for ref, hyp in zip(refs, hyps):
                    has = entity in ref.split()
                    got = entity in hyp.split()
                    if has:
                        rec_n += 1
                        rec_hit += got
                    else:
                        fa_n += 1
                        fa_hit += got
                return {"recall": round(rec_hit / max(rec_n, 1), 3),
                        "false_alarm": round(fa_hit / max(fa_n, 1), 3),
                        "wer": round(word_error_rate(hyps, refs), 3)}

            row = {"noise": noise, "weight": weight,
                   "host": stats(host_hyps), "device": stats(dev_hyps)}
            results.append(row)
            print(json.dumps(row, ensure_ascii=False), flush=True)

    # Sanity: at some positive weight, recall must not fall below weight 0.
    by_noise = {}
    for r in results:
        by_noise.setdefault(r["noise"], {})[r["weight"]] = r
    for noise, rows in by_noise.items():
        base = rows[min(rows)]["host"]["recall"]
        best = max(r["host"]["recall"] for r in rows.values())
        print(f"# noise {noise}: host recall {base} -> best {best}")


if __name__ == "__main__":
    main()

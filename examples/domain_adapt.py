"""Domain adaptation, end to end and in-framework — no external tools.

The full loop a telephony deployment runs when a new domain (client, product
line) arrives, exercising capabilities the reference delegates to external
tooling (lmplz/build_binary) or doesn't have (hotwords, word times):

  1. fine-tune the acoustic model on domain audio (here: the tiny synthetic
     corpus so the example runs anywhere in ~a minute);
  2. estimate a domain n-gram LM from the transcripts with the built-in
     modified-Kneser-Ney estimator and write a KenLM-format binary;
  3. decode with the on-TPU beam search with the LM fully fused, biased
     toward domain entity words (hotwords);
  4. read word-level timestamps + confidences off the result.

    python examples/domain_adapt.py [--steps 150]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=150)
    args = parser.parse_args()

    import jax

    if os.environ.get("TONE_TPU_FORCE_CPU"):
        # Same escape hatch as the CLI: site plugins can force a (possibly
        # tunneled) accelerator backend; this pins CPU reliably.
        jax.config.update("jax_platforms", "cpu")

    from train_tiny_e2e import run_training, synth

    from tone_tpu.decoder import DeviceBeamSearchCTCDecoder
    from tone_tpu.decoding.device_lm import load_device_lm
    from tone_tpu.decoding.estimate import estimate_ngram_lm, perplexity
    from tone_tpu.decoding.kenlm_binary import write_kenlm_binary
    from tone_tpu.decoding.lm import ArpaLM
    from tone_tpu.offline import OfflineTranscriber

    # 1. fine-tune on the domain corpus ---------------------------------
    print(f"== training ({args.steps} steps on the synthetic domain corpus)")
    cfg, _, state, _, items = run_training(steps=args.steps)
    variables = {"params": jax.tree.map(np.asarray, state.params),
                 "batch_stats": jax.tree.map(np.asarray, state.batch_stats)}

    # 2. domain LM from the transcripts ---------------------------------
    sentences = [it["text"].split() for it in items]
    tables = estimate_ngram_lm(sentences, order=3)
    ppl = perplexity(ArpaLM(tables), sentences)
    lm_path = Path(tempfile.mkdtemp()) / "domain_lm.bin"
    write_kenlm_binary(tables, lm_path)
    print(f"== domain LM: {[len(t) for t in tables]} n-grams, "
          f"train ppl {ppl:.1f}, written to {lm_path}")

    # 3. fused decode with hotword biasing ------------------------------
    entity = items[0]["text"].split()[0]
    decoder = DeviceBeamSearchCTCDecoder(
        load_device_lm(lm_path), fusion=True, beam_width=16,
        hotwords=[entity], hotword_weight=2.0)
    transcriber = OfflineTranscriber(variables, cfg, decoder=decoder,
                                     word_timestamps=True)

    # 4. transcribe noisy domain audio with word times ------------------
    rng = np.random.default_rng(0)
    audios = []
    refs = []
    for it in items[:4]:
        wav = synth(it["text"]).astype(np.float32)
        noisy = wav + rng.normal(0, 0.25, len(wav))
        audios.append(np.clip(noisy * 32767, -32768, 32767).astype(np.int32))
        refs.append(it["text"])

    results = transcriber.transcribe(audios)
    correct = 0
    for ref, phrases in zip(refs, results):
        hyp = " ".join(p.text for p in phrases if p.text)
        correct += hyp == ref
        print(f"   ref: {ref}")
        print(f"   hyp: {hyp}")
        for p in phrases:
            for w in p.words or ():
                print(f"        [{w.start_time:5.2f}–{w.end_time:5.2f}] "
                      f"({w.confidence:.2f}) {w.word}")
    print(f"== {correct}/{len(refs)} exact matches "
          f"(fused domain LM + hotword '{entity}' + word times)")
    if correct == 0:
        raise SystemExit("domain adaptation produced no exact match")


if __name__ == "__main__":
    main()

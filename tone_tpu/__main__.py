"""Command-line interface for the tone_tpu framework.

Superset of the reference CLI (tone/__main__.py — ``download`` only):

  python -m tone_tpu download DIR [--only-acoustic]   artifact download
  python -m tone_tpu transcribe AUDIO [...]           transcribe files
  python -m tone_tpu serve [...]                      websocket ASR server
  python -m tone_tpu eval MANIFEST [...]              corpus WER
  python -m tone_tpu export DIR [...]                 StableHLO export
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path


def _add_model_args(p: argparse.ArgumentParser) -> None:
    # TONE_TPU_MODEL_DIR mirrors the reference demo's LOAD_FROM_FOLDER env
    # var (reference tone/demo/website.py:25-33) for container deployments.
    env_dir = os.environ.get("TONE_TPU_MODEL_DIR")
    p.add_argument("--checkpoint", type=Path,
                   default=Path(env_dir) if env_dir else None,
                   help="tone_tpu checkpoint dir or torch checkpoint file "
                        "(default: $TONE_TPU_MODEL_DIR, else random weights "
                        "for smoke testing)")
    p.add_argument("--decoder", choices=["greedy", "beam", "device-beam"],
                   default="greedy",
                   help="device-beam = beam search on the TPU with n-best "
                        "LM rescoring on the host (high-throughput path)")
    p.add_argument("--lm", type=Path, default=None,
                   help="LM for beam search (ARPA text or KenLM binary)")
    p.add_argument("--fused-lm", action="store_true",
                   help="with --decoder device-beam: fuse the LM into the "
                        "on-TPU search (full shallow fusion) instead of "
                        "n-best rescoring")
    p.add_argument("--hotwords", type=str, default=None,
                   help="with --decoder beam: comma-separated words/phrases "
                        "(or @file, one per line) to bias the search toward")
    p.add_argument("--hotword-weight", type=float, default=10.0)
    p.add_argument("--beam-width", type=int, default=None,
                   help="beam width override (default: 200 host / 32 device)")
    p.add_argument("--chunk-ms", type=int, default=300)
    env_cache = os.environ.get("TONE_TPU_COMPILE_CACHE")
    p.add_argument("--compile-cache", type=Path,
                   default=Path(env_cache) if env_cache else None,
                   help="persistent XLA compile-cache directory (default: "
                        "$TONE_TPU_COMPILE_CACHE) — repeat runs and server "
                        "restarts skip jit/warmup compiles, incl. the "
                        "minutes-long fused-LM decode programs")


def _build_pipeline(args):
    import jax

    from tone_tpu.acoustic import StreamingCTCModel
    from tone_tpu.config import ToneConfig
    from tone_tpu.pipeline import StreamingCTCPipeline
    from tone_tpu.splitter import StreamingLogprobSplitter

    if getattr(args, "compile_cache", None):
        from tone_tpu.export import enable_compilation_cache

        enable_compilation_cache(args.compile_cache)

    config = ToneConfig()
    if args.chunk_ms != 300:
        config = config.with_chunk_duration_ms(args.chunk_ms)
    if args.checkpoint is not None:
        model = StreamingCTCModel.from_local(args.checkpoint)
        if args.chunk_ms != 300:
            model.config = model.config.with_chunk_duration_ms(args.chunk_ms)
    else:
        from tone_tpu.core.model import init_model_params

        print("warning: no checkpoint given — using RANDOM weights")
        model = StreamingCTCModel(init_model_params(jax.random.PRNGKey(0), config), config)
    from tone_tpu.decoder import build_decoder

    from tone_tpu.decoder import parse_hotwords

    try:
        decoder = build_decoder(args.decoder, lm=args.lm,
                                fused_lm=args.fused_lm,
                                beam_width=args.beam_width,
                                hotwords=parse_hotwords(
                                    getattr(args, "hotwords", None)),
                                hotword_weight=args.hotword_weight)
    except ValueError as e:
        raise SystemExit(str(e)) from None
    try:
        return StreamingCTCPipeline(
            model, StreamingLogprobSplitter(), decoder,
            word_timestamps=getattr(args, "word_times", False),
            nbest=getattr(args, "nbest", 0))
    except ValueError as e:
        raise SystemExit(str(e)) from None


def main() -> None:
    import os

    if os.environ.get("TONE_TPU_FORCE_CPU"):
        # Env-var JAX_PLATFORMS can be overridden by site plugins that select
        # their platform programmatically; this forces CPU reliably.
        import jax

        jax.config.update("jax_platforms", "cpu")

    parser = argparse.ArgumentParser(prog="tone_tpu",
                                     description="TPU-native streaming ASR")
    sub = parser.add_subparsers(dest="command", required=True)

    p_dl = sub.add_parser("download", help="download artifacts from HF Hub")
    p_dl.add_argument("download_dir", type=Path)
    p_dl.add_argument("--only-acoustic", action="store_true")

    p_tr = sub.add_parser("transcribe", help="transcribe audio files")
    p_tr.add_argument("files", nargs="+", type=Path)
    p_tr.add_argument("--json", action="store_true", help="JSON output")
    p_tr.add_argument("--word-times", action="store_true",
                      help="word-level timestamps + confidences via CTC "
                           "forced alignment")
    p_tr.add_argument("--batch-size", type=int, default=0,
                      help=">0: batch files through the bulk transcriber "
                           "(device-batched acoustics/decodes/alignment)")
    p_tr.add_argument("--nbest", type=int, default=0,
                      help="phrases carry up to N scored alternative "
                           "transcripts (needs a beam decoder; shown with "
                           "--json)")
    p_tr.add_argument("--offline-forward", action="store_true",
                      help="with --batch-size: full-sequence (blocked-"
                           "attention) graph instead of the streaming chunk "
                           "scan")
    p_tr.add_argument("--data-parallel", action="store_true",
                      help="with --batch-size: shard batch rows over all "
                           "devices of a ('data',) mesh")
    _add_model_args(p_tr)

    p_srv = sub.add_parser("serve", help="websocket ASR server")
    p_srv.add_argument("--host", default="0.0.0.0")
    p_srv.add_argument("--port", type=int, default=8080)
    p_srv.add_argument("--metrics-port", type=int, default=8002)
    p_srv.add_argument("--slots", type=int, default=256)
    p_srv.add_argument("--interim", action="store_true",
                       help="stream in-progress phrase partials")
    p_srv.add_argument("--interim-beam", action="store_true",
                       help="LM-quality partials via carried host beam search")
    p_srv.add_argument("--interim-device-beam", action="store_true",
                       help="carried interim beam search on the TPU")
    p_srv.add_argument("--interim-beam-width", type=int, default=8)
    p_srv.add_argument("--interim-beam-max-len", type=int, default=2048)
    p_srv.add_argument("--idle-evict-seconds", type=float, default=None,
                       help="idle stream reap timeout (default 15 s, Triton parity)")
    p_srv.add_argument("--word-times", action="store_true",
                       help="transcript events carry per-word times + "
                            "confidences (CTC forced alignment)")
    p_srv.add_argument("--force-evict-grace", type=float, default=None,
                       help="min quiet seconds before slot steal under pressure")
    p_srv.add_argument("--data-parallel", action="store_true",
                       help="shard the stream-slot arena over all devices "
                            "of a ('data',) mesh (multi-chip serving)")
    p_srv.add_argument("--nbest", type=int, default=0,
                       help="transcript events carry up to N scored "
                            "alternatives for every stream (needs a beam "
                            "decoder; per-phrase decodes — a throughput cost "
                            "at arena scale.  Clients can instead opt in per "
                            "stream with a JSON config frame {'nbest': N})")
    p_srv.add_argument("--hotword-warmup-buckets", type=int, nargs="*",
                       default=[32], metavar="NODES",
                       help="hotword-table node buckets (powers of two) "
                            "whose per-request-biased decode programs are "
                            "compiled during warmup, so the first biased "
                            "request of that size pays no compile (default "
                            "32 — typical short contact lists; pass every "
                            "expected size, or nothing to skip)")
    p_srv.add_argument("--drain-grace", type=float, default=10.0,
                       help="graceful-shutdown budget: on SIGTERM/SIGINT the "
                            "server refuses new connections and flushes every "
                            "live stream's buffered audio + final phrases "
                            "within this many seconds before exiting (a "
                            "second signal exits immediately)")
    p_srv.add_argument("--max-candidates", type=int, default=4096,
                       help="streams accepted beyond --slots: they queue as "
                            "candidates (chunks buffer host-side) and bind "
                            "oldest-first as slots free — Triton's "
                            "max_candidate_sequences semantics (default 4096, "
                            "its config value); 0 rejects at capacity")
    _add_model_args(p_srv)

    p_ev = sub.add_parser("eval", help="corpus WER over a JSONL manifest")
    p_ev.add_argument("manifest", type=Path)
    p_ev.add_argument("--limit", type=int, default=None)
    p_ev.add_argument("--server", default=None,
                      help="evaluate against ws://host:port/api/ws instead of locally")
    p_ev.add_argument("--batch-size", type=int, default=0,
                      help=">0: batched offline transcription (faster bulk eval)")
    p_ev.add_argument("--offline-forward", action="store_true",
                      help="full-sequence (blocked-attention) graph instead of "
                           "the streaming chunk scan for batched eval")
    p_ev.add_argument("--data-parallel", action="store_true",
                      help="shard batched eval rows over all devices "
                           "(batch-size must divide evenly)")
    _add_model_args(p_ev)

    p_al = sub.add_parser(
        "align", help="force-align given transcripts to audio (word times + "
                      "confidences; subtitle/relabeling workflows)")
    p_al.add_argument("manifest", type=Path,
                      help="JSONL of {audio_filepath, text}")
    p_al.add_argument("--out", type=Path, default=None,
                      help="output JSONL (default: stdout)")
    p_al.add_argument("--batch-size", type=int, default=16)
    _add_model_args(p_al)

    p_lm = sub.add_parser(
        "lm", help="estimate an n-gram LM (modified Kneser-Ney, lmplz-style)")
    p_lm.add_argument("corpus", type=Path,
                      help="text corpus, one sentence per line")
    p_lm.add_argument("out", type=Path,
                      help="output LM: .arpa/.arpa.gz text or KenLM binary")
    p_lm.add_argument("--order", type=int, default=3)
    p_lm.add_argument("--binary", choices=["probing", "trie"], default="probing",
                      help="binary flavor when out is not .arpa")
    p_lm.add_argument("--quant", type=int, nargs=2, metavar=("PROB", "BACKOFF"),
                      default=None,
                      help="with --binary trie: quantize probs/backoffs to "
                           "this many bits (build_binary -q/-b)")
    p_lm.add_argument("--bhiksha", type=int, default=None,
                      help="with --binary trie: Bhiksha pointer compression "
                           "up to this many bits (build_binary -a)")
    p_lm.add_argument("--prune", type=int, nargs="+", default=None,
                      help="per-order count thresholds (lmplz --prune)")
    p_lm.add_argument("--ppl", type=Path, default=None,
                      help="held-out text file: report perplexity of the "
                           "built model")
    p_lm.add_argument("--native", action="store_true",
                      help="estimate with the C++ estimator (~5x the Python "
                           "path; the scale choice for 10M+-token corpora — "
                           "same model up to float rounding, fuzz-pinned)")

    p_ex = sub.add_parser("export", help="serialize StableHLO artifacts")
    p_ex.add_argument("out_dir", type=Path)
    p_ex.add_argument("--batch-sizes", type=int, nargs="+", default=[1, 8, 64])
    p_ex.add_argument("--nemo", action="store_true",
                      help="also write a NeMo-restorable .nemo archive "
                           "(reference tone/scripts/export.py:528-549)")
    _add_model_args(p_ex)

    args = parser.parse_args()

    if args.command == "download":
        from tone_tpu.pipeline import StreamingCTCPipeline

        args.download_dir.mkdir(exist_ok=True)
        StreamingCTCPipeline.download_from_hugging_face(
            args.download_dir, only_acoustic=args.only_acoustic)
        return

    if args.command == "transcribe":
        from tone_tpu.audio import read_audio

        if args.batch_size <= 0 and (args.offline_forward or args.data_parallel):
            raise SystemExit(
                "--offline-forward/--data-parallel apply to the bulk "
                "transcriber only: pass --batch-size N")
        if args.batch_size > 0 and args.nbest > 0:
            raise SystemExit(
                "--nbest decodes per phrase and is not supported on the "
                "batched bulk path; drop --batch-size")

        def phrase_dict(p):
            d = {"text": p.text, "start_time": p.start_time,
                 "end_time": p.end_time}
            if p.words is not None:
                d["words"] = [vars(w) for w in p.words]
            if p.nbest is not None:
                d["nbest"] = [{"text": t, "score": s} for t, s in p.nbest]
            return d

        pipeline = _build_pipeline(args)
        if args.batch_size > 0:
            from tone_tpu.offline import OfflineTranscriber

            mesh = None
            if args.data_parallel:
                from tone_tpu.parallel.mesh import make_mesh

                mesh = make_mesh()
            transcriber = OfflineTranscriber(
                pipeline.model.variables, pipeline.model.config,
                decoder=pipeline.decoder, batch_size=args.batch_size,
                use_offline_forward=args.offline_forward, mesh=mesh,
                word_timestamps=args.word_times)
            all_phrases = transcriber.transcribe(
                [read_audio(p) for p in args.files])
        else:
            all_phrases = None
        for k, path in enumerate(args.files):
            phrases = (all_phrases[k] if all_phrases is not None
                       else pipeline.forward_offline(read_audio(path)))
            if args.json:
                print(json.dumps({
                    "file": str(path),
                    "phrases": [phrase_dict(p) for p in phrases],
                }, ensure_ascii=False))
            else:
                print(f"== {path}")
                for p in phrases:
                    print(f"  [{p.start_time:7.2f} – {p.end_time:7.2f}] {p.text}")
                    for w in p.words or ():
                        print(f"      [{w.start_time:7.2f} – {w.end_time:7.2f}]"
                              f" ({w.confidence:.2f}) {w.word}")
        return

    if args.command == "serve":
        import asyncio
        import logging

        from tone_tpu.runtime.engine import MultiStreamEngine
        from tone_tpu.runtime.server import serve

        logging.basicConfig(level=logging.INFO)

        mesh = None
        if args.data_parallel:
            from tone_tpu.parallel.mesh import DATA_AXIS, make_mesh

            mesh = make_mesh(n_model=1)
            if args.slots % mesh.shape[DATA_AXIS]:
                # fail before the (slow) checkpoint load / jit warmup
                raise SystemExit(
                    f"--data-parallel: --slots ({args.slots}) must be a "
                    f"multiple of the device count ({mesh.shape[DATA_AXIS]})")
        pipeline = _build_pipeline(args)
        sharding = None
        if mesh is not None:
            from tone_tpu.parallel.mesh import arena_shardings

            sharding = arena_shardings(mesh, pipeline.model.config, args.slots)
        engine = MultiStreamEngine(
            pipeline.model.variables, pipeline.model.config,
            n_slots=args.slots, decoder=pipeline.decoder, sharding=sharding,
            interim_transcripts=args.interim,
            interim_beam=args.interim_beam,
            interim_device_beam=args.interim_device_beam,
            interim_beam_width=args.interim_beam_width,
            interim_beam_max_len=args.interim_beam_max_len,
            idle_evict_seconds=args.idle_evict_seconds,
            force_evict_grace=args.force_evict_grace,
            word_timestamps=args.word_times,
            nbest=args.nbest,
            max_candidates=args.max_candidates,
            hotword_warmup_buckets=args.hotword_warmup_buckets)
        asyncio.run(serve(engine, args.host, args.port,
                          metrics_port=args.metrics_port,
                          drain_grace=args.drain_grace))
        return

    if args.command == "eval":
        from tone_tpu.eval import evaluate_pipeline, evaluate_server

        local_flags = (args.batch_size > 0 or args.offline_forward
                       or args.data_parallel)
        if args.server and local_flags:
            raise SystemExit(
                "--server evaluates a remote deployment; "
                "--batch-size/--offline-forward/--data-parallel only "
                "apply to local batched eval")
        if args.batch_size <= 0 and (args.offline_forward or args.data_parallel):
            raise SystemExit(
                "--offline-forward/--data-parallel apply to batched eval "
                "only: pass --batch-size N")
        if args.server:
            result = evaluate_server(args.server, args.manifest, limit=args.limit)
        elif args.batch_size > 0:
            from tone_tpu.offline import OfflineTranscriber

            pipeline = _build_pipeline(args)
            mesh = None
            if args.data_parallel:
                from tone_tpu.parallel.mesh import make_mesh

                mesh = make_mesh()
            transcriber = OfflineTranscriber(
                pipeline.model.variables, pipeline.model.config,
                decoder=pipeline.decoder, batch_size=args.batch_size,
                use_offline_forward=args.offline_forward, mesh=mesh)
            result = evaluate_pipeline(transcriber, args.manifest, limit=args.limit)
        else:
            result = evaluate_pipeline(_build_pipeline(args), args.manifest,
                                       limit=args.limit)
        print(json.dumps({
            "wer": round(result.wer, 4),
            "utterances": result.n_utterances,
            "audio_seconds": round(result.audio_seconds, 1),
            "wall_seconds": round(result.wall_seconds, 2),
            "rtfx": round(result.rtfx, 1),
        }))
        return

    if args.command == "align":
        import sys as _sys

        import numpy as np

        from tone_tpu.align import spans_to_word_timings
        from tone_tpu.audio import read_audio
        from tone_tpu.config import LABELS
        from tone_tpu.eval import read_manifest
        from tone_tpu.offline import OfflineTranscriber
        from tone_tpu.ops.align_device import align_words_batch

        pipeline = _build_pipeline(args)
        cfg = pipeline.model.config
        transcriber = OfflineTranscriber(
            pipeline.model.variables, cfg, batch_size=args.batch_size)
        items = read_manifest(args.manifest)
        bias = cfg.mean_time_bias + cfg.padding / cfg.frontend.sample_rate
        alphabet = set(LABELS) - {" "}

        def norm_word(word: str) -> str:
            # real transcripts carry punctuation/digits/Latin the model's
            # alphabet lacks: align what is representable, keep the
            # ORIGINAL word in the output
            return "".join(c for c in word.lower() if c in alphabet)

        def align_one(it, lp):
            orig = str(it["text"]).split()
            norm = [norm_word(w) for w in orig]
            text = " ".join(w for w in norm if w)
            spans = align_words_batch([lp], [text])[0] if text else []
            timed = iter(spans_to_word_timings(spans, 0, cfg.frame_size, bias))
            words = []
            for w, nw in zip(orig, norm):
                if nw:
                    t = next(timed)
                    words.append({"word": w, "start_time": t.start_time,
                                  "end_time": t.end_time,
                                  "confidence": t.confidence})
                else:  # nothing alignable in this word (e.g. "—")
                    words.append({"word": w, "start_time": None,
                                  "end_time": None, "confidence": None})
            return {"audio_filepath": it.get("audio_filepath"),
                    "text": it["text"], "words": words}

        out_f = (open(args.out, "w", encoding="utf-8") if args.out
                 else _sys.stdout)
        n_done = n_failed = 0
        try:
            # batch-by-batch so memory is bounded and output is incremental
            for start in range(0, len(items), args.batch_size):
                chunk = items[start:start + args.batch_size]
                audios = [np.asarray(it.get("audio")
                                     if it.get("audio") is not None
                                     else read_audio(it["audio_filepath"]),
                                     np.int32) for it in chunk]
                lps = transcriber.logprobs(audios)
                for it, lp in zip(chunk, lps):
                    try:
                        record = align_one(it, lp)
                        n_done += 1
                    except ValueError as e:  # e.g. text longer than audio
                        record = {"audio_filepath": it.get("audio_filepath"),
                                  "text": it["text"], "error": str(e)}
                        n_failed += 1
                    out_f.write(json.dumps(record, ensure_ascii=False) + "\n")
                out_f.flush()
        finally:
            if args.out:
                out_f.close()
        if args.out:
            print(json.dumps({"out": str(args.out), "utterances": n_done,
                              "failed": n_failed}))
        return

    if args.command == "lm":
        from tone_tpu.decoding.estimate import estimate_from_text, write_arpa

        name = args.out.name
        is_arpa = name.endswith(".arpa") or name.endswith(".arpa.gz")
        if (args.quant or args.bhiksha) and (args.binary != "trie" or is_arpa):
            # pure argument error: fail before the (possibly minutes-long)
            # corpus counting, not after
            raise SystemExit("--quant/--bhiksha require --binary trie and a "
                             "binary output path")
        if args.native:
            from tone_tpu.decoding.native.estimate import (
                estimate_arpa_native, native_available)

            if not native_available():
                raise SystemExit("--native: no C++ toolchain available")
            if is_arpa and not name.endswith(".gz"):
                # native writes the final ARPA directly — no Python tables
                estimate_arpa_native(args.corpus, args.out,
                                     order=args.order, prune=args.prune)
                tables = None
            else:
                # native ARPA to a sibling temp, then convert to the
                # requested artifact through the standard readers/writers
                import tempfile

                from tone_tpu.decoding.lm import ArpaLM

                with tempfile.NamedTemporaryFile(
                        suffix=".arpa", dir=args.out.parent,
                        delete=False) as tf:
                    tmp_arpa = Path(tf.name)
                try:
                    estimate_arpa_native(args.corpus, tmp_arpa,
                                         order=args.order, prune=args.prune)
                    tables = ArpaLM.from_file(tmp_arpa)._ngrams
                finally:
                    tmp_arpa.unlink(missing_ok=True)
        else:
            with open(args.corpus, encoding="utf-8") as f:
                tables = estimate_from_text(f, order=args.order,
                                            prune=args.prune)
        if tables is None:
            pass  # already written (native direct-ARPA path)
        elif is_arpa:
            write_arpa(tables, args.out)
        elif args.binary == "trie":
            from tone_tpu.decoding.kenlm_trie import write_kenlm_trie

            write_kenlm_trie(tables, args.out,
                             quant_bits=tuple(args.quant) if args.quant else None,
                             bhiksha_bits=args.bhiksha)
        else:
            from tone_tpu.decoding.kenlm_binary import write_kenlm_binary

            write_kenlm_binary(tables, args.out)
        if tables is None and (args.ppl is not None):
            from tone_tpu.decoding.lm import ArpaLM

            tables = ArpaLM.from_file(args.out)._ngrams
        if tables is None:
            # native direct-ARPA path without --ppl: counts from the header
            import re

            with open(args.out, encoding="utf-8") as f:
                head = f.read(4096)
            counts = [int(m) for m in re.findall(r"ngram \d+=(\d+)", head)]
            report = {"out": str(args.out), "order": args.order,
                      "ngrams": counts}
        else:
            report = {"out": str(args.out), "order": args.order,
                      "ngrams": [len(t) for t in tables]}
        if args.ppl is not None:
            from tone_tpu.decoding.estimate import perplexity
            from tone_tpu.decoding.lm import ArpaLM

            with open(args.ppl, encoding="utf-8") as f:
                held_out = [line.split() for line in
                            (l.strip().lower() for l in f) if line]
            report["ppl"] = round(perplexity(ArpaLM(tables), held_out), 3)
        print(json.dumps(report))
        return

    if args.command == "export":
        from tone_tpu.export import export_streaming

        pipeline = _build_pipeline(args)
        written = export_streaming(
            pipeline.model.variables, pipeline.model.config,
            args.batch_sizes, args.out_dir)
        if args.nemo:
            from tone_tpu.interop import save_nemo_archive

            nemo_path = args.out_dir / "model.nemo"
            save_nemo_archive(nemo_path, pipeline.model.variables,
                              pipeline.model.config)
            written = list(written) + [nemo_path]
        for p in written:
            print(p)
        return


if __name__ == "__main__":
    main()

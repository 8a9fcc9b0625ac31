"""Publish tone_tpu artifacts to a Hugging Face Hub repo
(parity with dev/hf/push.py): uploads the native checkpoint, a torch-naming
safetensors export, config, and optionally an LM, a ``.nemo`` archive
(generated from the checkpoint), a VAD onnx (the reference bundles
silero_vad.onnx at onnx/silero_vad.onnx — dev/hf/push.py:10,110-114), and
StableHLO serving artifacts (the reference's TensorRT model.plan slot).

    HF_TOKEN=... python dev/push_hf.py --repo your-org/your-model \
        --checkpoint artifacts/model [--lm lm.arpa.gz] [--nemo] \
        [--vad silero_vad.onnx] [--stablehlo exported_dir]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--repo", required=True)
    parser.add_argument("--checkpoint", type=Path, required=True,
                        help="tone_tpu checkpoint dir (config.json + variables)")
    parser.add_argument("--lm", type=Path, default=None)
    parser.add_argument("--nemo", action="store_true",
                        help="also generate + upload a reference-restorable "
                             ".nemo archive (interop.save_nemo_archive)")
    parser.add_argument("--vad", type=Path, default=None,
                        help="VAD onnx to bundle at onnx/silero_vad.onnx "
                             "(reference repo layout; tone_tpu itself uses "
                             "the logprob splitter for segmentation)")
    parser.add_argument("--stablehlo", type=Path, default=None,
                        help="dir of export_streaming artifacts to upload "
                             "under stablehlo/ (the TensorRT model.plan slot)")
    parser.add_argument("--private", action="store_true")
    parser.add_argument("--dry-run", action="store_true",
                        help="assemble the upload set and print it without "
                             "network access or credentials")
    args = parser.parse_args()

    from tone_tpu.checkpoint import load_checkpoint
    from tone_tpu.interop import save_torch_checkpoint

    variables, config = load_checkpoint(args.checkpoint)

    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        # torch-naming safetensors so the reference toolchain can load it too
        save_torch_checkpoint(tmp / "model.safetensors", variables, config)
        uploads = [
            (str(args.checkpoint), "tone_tpu_checkpoint/ (folder)"),
            (str(tmp / "model.safetensors"), "model.safetensors"),
        ]
        if args.lm:
            uploads.append((str(args.lm), args.lm.name))
        if args.nemo:
            from tone_tpu.interop import save_nemo_archive

            save_nemo_archive(tmp / "model.nemo", variables, config)
            uploads.append((str(tmp / "model.nemo"), "model.nemo"))
        if args.vad:
            if not args.vad.exists():
                raise FileNotFoundError(f"missing VAD onnx: {args.vad}")
            uploads.append((str(args.vad), "onnx/silero_vad.onnx"))
        if args.stablehlo:
            uploads.append((str(args.stablehlo), "stablehlo/ (folder)"))
        if args.dry_run:
            for src, dest in uploads:
                print(f"would upload {src} -> {args.repo}:{dest}")
            return

        from huggingface_hub import HfApi

        api = HfApi()
        api.create_repo(args.repo, exist_ok=True, private=args.private)
        api.upload_folder(repo_id=args.repo, folder_path=str(args.checkpoint),
                          path_in_repo="tone_tpu_checkpoint")
        api.upload_file(repo_id=args.repo,
                        path_or_fileobj=str(tmp / "model.safetensors"),
                        path_in_repo="model.safetensors")
        if args.lm:
            api.upload_file(repo_id=args.repo, path_or_fileobj=str(args.lm),
                            path_in_repo=args.lm.name)
        if args.nemo:
            api.upload_file(repo_id=args.repo,
                            path_or_fileobj=str(tmp / "model.nemo"),
                            path_in_repo="model.nemo")
        if args.vad:
            api.upload_file(repo_id=args.repo, path_or_fileobj=str(args.vad),
                            path_in_repo="onnx/silero_vad.onnx")
        if args.stablehlo:
            api.upload_folder(repo_id=args.repo,
                              folder_path=str(args.stablehlo),
                              path_in_repo="stablehlo")
    print(f"published to https://huggingface.co/{args.repo}")


if __name__ == "__main__":
    main()

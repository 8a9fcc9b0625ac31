"""Publish tone_tpu artifacts to a Hugging Face Hub repo
(parity with dev/hf/push.py): uploads the native checkpoint, a torch-naming
safetensors export, config, and optionally an ARPA LM.

    HF_TOKEN=... python dev/push_hf.py --repo your-org/your-model \
        --checkpoint artifacts/model [--lm lm.arpa.gz]
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
    print(f"published to https://huggingface.co/{args.repo}")


if __name__ == "__main__":
    main()

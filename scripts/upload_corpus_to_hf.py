"""Upload eval_corpus.json to the Hugging Face Hub.

Parity with /root/reference/scripts/upload_corpus_to_hf.py (gated on hub
access). The corpus auto-resolves from processed/ when not configured.
"""

from __future__ import annotations

# Allow running as `python scripts/<name>.py` from a repo checkout.
import sys as _sys
from pathlib import Path as _Path

_repo_root = str(_Path(__file__).resolve().parents[1])
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
from pathlib import Path

from instacart_next_order_recommendation_tpu.constants import (
    DEFAULT_CONFIG_UPLOAD_CORPUS,
    DEFAULT_PROCESSED_DIR,
    EVAL_CORPUS_FILENAME,
)
from instacart_next_order_recommendation_tpu.utils import resolve_processed_dir
from instacart_next_order_recommendation_tpu.utils.config import load_yaml_config


def main() -> None:
    parser = argparse.ArgumentParser(description="Upload eval_corpus.json to Hugging Face Hub")
    parser.add_argument("--config", type=Path, default=None)
    parser.add_argument("--repo-id", default=None)
    args = parser.parse_args()

    raw = load_yaml_config(args.config, DEFAULT_CONFIG_UPLOAD_CORPUS)
    repo_id = args.repo_id or raw.get("repo_id")
    repo_type = str(raw.get("repo_type", "dataset"))
    private = bool(raw.get("private", False))

    if raw.get("corpus_path"):
        corpus_path = Path(raw["corpus_path"])
    else:
        processed_dir, _ = resolve_processed_dir(DEFAULT_PROCESSED_DIR, DEFAULT_PROCESSED_DIR)
        corpus_path = processed_dir / EVAL_CORPUS_FILENAME

    if not repo_id:
        raise SystemExit("repo_id is required (config key repo_id or --repo-id)")
    if not corpus_path.is_file():
        raise SystemExit(f"corpus not found: {corpus_path}")

    from huggingface_hub import HfApi

    api = HfApi()
    api.create_repo(repo_id=repo_id, repo_type=repo_type, private=private, exist_ok=True)
    api.upload_file(
        path_or_fileobj=str(corpus_path),
        path_in_repo=corpus_path.name,
        repo_id=repo_id,
        repo_type=repo_type,
    )
    print(f"Uploaded {corpus_path} -> {repo_id} ({repo_type})")


if __name__ == "__main__":
    main()

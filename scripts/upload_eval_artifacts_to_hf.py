"""Upload versioned eval artifacts (corpus + queries) to the Hugging Face Hub.

Parity with /root/reference/scripts/upload_eval_artifacts_to_hf.py:76-77
including the versioned naming: ``product_catalog_corpus_<params>.json`` and
``product_queries_<params>.json`` where ``<params>`` is the processed subdir
name (e.g. ``p5_mp20_ef0.1``).
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
    EVAL_QUERIES_FILENAME,
)
from instacart_next_order_recommendation_tpu.utils import resolve_processed_dir
from instacart_next_order_recommendation_tpu.utils.config import load_yaml_config


def main() -> None:
    parser = argparse.ArgumentParser(description="Upload versioned eval artifacts to HF Hub")
    parser.add_argument("--config", type=Path, default=None)
    parser.add_argument("--repo-id", default=None)
    args = parser.parse_args()

    raw = load_yaml_config(args.config, DEFAULT_CONFIG_UPLOAD_CORPUS)
    repo_id = args.repo_id or raw.get("repo_id")
    repo_type = str(raw.get("repo_type", "dataset"))
    private = bool(raw.get("private", False))
    if not repo_id:
        raise SystemExit("repo_id is required (config key repo_id or --repo-id)")

    processed_dir, _ = resolve_processed_dir(DEFAULT_PROCESSED_DIR, DEFAULT_PROCESSED_DIR)
    params = processed_dir.name

    uploads = [
        (processed_dir / EVAL_CORPUS_FILENAME, f"product_catalog_corpus_{params}.json"),
        (processed_dir / EVAL_QUERIES_FILENAME, f"product_queries_{params}.json"),
    ]
    from huggingface_hub import HfApi

    api = HfApi()
    api.create_repo(repo_id=repo_id, repo_type=repo_type, private=private, exist_ok=True)
    for local, remote in uploads:
        if not local.is_file():
            raise SystemExit(f"artifact not found: {local}")
        api.upload_file(
            path_or_fileobj=str(local), path_in_repo=remote, repo_id=repo_id, repo_type=repo_type
        )
        print(f"Uploaded {local} -> {repo_id}/{remote}")


if __name__ == "__main__":
    main()

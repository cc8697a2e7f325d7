"""Upload a trained tower checkpoint folder to the Hugging Face Hub.

Parity with /root/reference/scripts/upload_model_to_hf.py (gated: requires
hub network access and HF_TOKEN/login; offline environments get a clear
error instead).
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
    DEFAULT_CONFIG_UPLOAD_MODEL,
    DEFAULT_MODEL_DIR,
)
from instacart_next_order_recommendation_tpu.utils.config import (
    load_yaml_config,
    resolve_project_path,
)


def main() -> None:
    parser = argparse.ArgumentParser(description="Upload model folder to Hugging Face Hub")
    parser.add_argument("--config", type=Path, default=None)
    parser.add_argument("--repo-id", default=None)
    args = parser.parse_args()

    raw = load_yaml_config(args.config, DEFAULT_CONFIG_UPLOAD_MODEL)
    repo_id = args.repo_id or raw.get("repo_id")
    model_dir = resolve_project_path(raw.get("model_dir"), DEFAULT_MODEL_DIR)
    private = bool(raw.get("private", False))

    if not repo_id:
        raise SystemExit("repo_id is required (config key repo_id or --repo-id)")
    if not model_dir.is_dir():
        raise SystemExit(f"model dir not found: {model_dir}")

    from huggingface_hub import HfApi

    api = HfApi()
    api.create_repo(repo_id=repo_id, repo_type="model", private=private, exist_ok=True)
    api.upload_folder(folder_path=str(model_dir), repo_id=repo_id, repo_type="model")
    print(f"Uploaded {model_dir} -> {repo_id}")


if __name__ == "__main__":
    main()

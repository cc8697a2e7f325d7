"""Path-resolution helpers for processed data and the serving corpus.

Mirrors the auto-resolution behavior of the reference
(/root/reference/src/utils.py:76-197): param-subdir auto-selection under the
default processed dir, and a best-effort Hugging Face Hub fallback when the
corpus is missing locally (gated: hub access may be unavailable offline).
"""

from __future__ import annotations

import logging
import os
import shutil
from pathlib import Path

from instacart_next_order_recommendation_tpu.constants import (
    DEFAULT_CORPUS_HF_FILENAME,
    DEFAULT_CORPUS_HF_REPO,
    DEFAULT_CORPUS_HF_REPO_TYPE,
    DEFAULT_QUERIES_HF_FILENAME,
    ENV_CORPUS_HF_REPO,
    ENV_CORPUS_HF_REPO_TYPE,
    EVAL_QUERIES_FILENAME,
    TRAIN_DATASET_SUBDIR,
)

logger = logging.getLogger(__name__)


def resolve_processed_dir(
    processed_dir: Path, default_processed_dir: Path
) -> tuple[Path, str | None]:
    """Resolve the processed-data dir, auto-selecting a param subdir when needed.

    When ``processed_dir`` equals the default and holds no ``train_dataset``,
    searches its immediate subdirs for one that does (e.g. ``p5_mp20_ef0.1``):
    a single match is used directly, multiple matches pick the most recently
    modified. Returns ``(resolved_path, log_message_or_None)``.

    Raises:
        FileNotFoundError: if no train_dataset can be located.
    """
    processed_dir = Path(processed_dir)
    train_path = processed_dir / TRAIN_DATASET_SUBDIR

    if not train_path.exists() and processed_dir == default_processed_dir and processed_dir.is_dir():
        candidates = [
            d
            for d in processed_dir.iterdir()
            if d.is_dir()
            and (d / TRAIN_DATASET_SUBDIR).exists()
            # Feedback-merged retrain datasets (scripts/feedback_retrain.py
            # writes <base>_fb) are explicit retrain inputs, not prep
            # outputs: auto-resolution must not silently hijack every
            # default-config entry point after the first retrain.
            and not d.name.endswith("_fb")
        ]
        if len(candidates) == 1:
            return candidates[0], f"  -> Using param subdir: {candidates[0].name}"
        if len(candidates) > 1:
            latest = max(candidates, key=lambda d: (d / TRAIN_DATASET_SUBDIR).stat().st_mtime)
            return latest, f"  -> Multiple subdirs found, using latest: {latest.name}"

    if not train_path.exists():
        raise FileNotFoundError(
            f"Train dataset not found at {train_path}. Run data prep first "
            "(python -m instacart_next_order_recommendation_tpu.data.prepare) "
            "or point processed_dir at a param subdir (e.g. processed/p5_mp20_ef0.1)."
        )
    return processed_dir, None


def resolve_corpus_with_hf_fallback(
    corpus_path: Path,
    *,
    hf_repo: str | None = None,
    hf_repo_type: str | None = None,
) -> Path:
    """Resolve the corpus path, downloading from Hugging Face Hub as fallback.

    The download path is best-effort: in offline environments the fallback
    raises FileNotFoundError with remediation instructions instead.
    """
    path = Path(corpus_path).resolve()
    if path.is_file():
        return path

    repo = hf_repo or os.getenv(ENV_CORPUS_HF_REPO) or DEFAULT_CORPUS_HF_REPO
    repo_type = hf_repo_type or os.getenv(ENV_CORPUS_HF_REPO_TYPE) or DEFAULT_CORPUS_HF_REPO_TYPE

    if not repo:
        raise FileNotFoundError(
            f"eval_corpus.json not found at {path}. Run data prep first, or set "
            f"{ENV_CORPUS_HF_REPO} to download from Hugging Face."
        )

    try:
        from huggingface_hub import hf_hub_download

        local_corpus = Path(
            hf_hub_download(repo_id=repo, filename=DEFAULT_CORPUS_HF_FILENAME, repo_type=repo_type)
        )
        # Best-effort: place eval_queries.json next to the corpus so user_id
        # lookup works for demos (reference src/utils.py:155-180).
        try:
            local_queries = Path(
                hf_hub_download(
                    repo_id=repo, filename=DEFAULT_QUERIES_HF_FILENAME, repo_type=repo_type
                )
            )
            target = local_corpus.parent / EVAL_QUERIES_FILENAME
            if not target.exists():
                shutil.copy2(local_queries, target)
        except Exception:
            logger.info("eval_queries.json not available in %s; user_id lookup disabled.", repo)
        return local_corpus
    except Exception as exc:
        raise FileNotFoundError(
            f"eval_corpus.json not found at {path} and download from {repo} failed: {exc}. "
            "Run data prep first."
        ) from exc

"""YAML config loading shared by every CLI entrypoint.

The reference uses one hand-rolled ``*Config`` class per tool, each wrapping
``yaml.safe_load`` with defaults and a ``--config`` override
(/root/reference/src/data/prepare_instacart_sbert.py:58-83 and peers). We keep
that per-tool-config shape but centralize the load/resolve plumbing here.
"""

from __future__ import annotations

from pathlib import Path

import yaml

from instacart_next_order_recommendation_tpu.constants import PROJECT_ROOT


def load_yaml_config(config_path: Path | str | None, default_path: Path) -> dict:
    """Load a YAML config file, resolving relative paths against PROJECT_ROOT.

    Returns an empty dict for an empty file; missing default config files also
    yield an empty dict so tools run with pure in-code defaults.
    """
    path = Path(config_path) if config_path else default_path
    if not path.is_absolute():
        path = PROJECT_ROOT / path
    if config_path is None and not path.exists():
        return {}
    with open(path) as f:
        return yaml.safe_load(f) or {}


def resolve_project_path(value: str | Path | None, default: Path) -> Path:
    """Resolve a possibly-relative path string against PROJECT_ROOT."""
    if not value:
        return default
    path = Path(value)
    return path if path.is_absolute() else PROJECT_ROOT / path

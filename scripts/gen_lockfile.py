"""Regenerate requirements.lock from the installed environment.

Parity artifact for the reference's dependency lockfile
(/root/reference/uv.lock): pins the exact versions of every runtime and
test dependency this framework imports, so a deployment can reproduce the
validated environment. Run from the repo root:

    python scripts/gen_lockfile.py
"""

from __future__ import annotations

import importlib.metadata as md
from pathlib import Path

PACKAGES = [
    # TPU compute path
    "jax", "jaxlib", "flax", "optax", "orbax-checkpoint", "chex", "einops",
    # data path
    "numpy", "pandas", "pyarrow", "datasets", "msgpack", "scipy",
    # warm-start / tokenizer parity oracles
    "transformers", "torch", "tokenizers", "huggingface-hub", "accelerate",
    # config + tests
    "pyyaml", "pytest",
]


def main() -> None:
    pins = []
    for name in PACKAGES:
        try:
            pins.append(f"{name}=={md.version(name)}")
        except md.PackageNotFoundError:
            pass
    out = Path(__file__).resolve().parent.parent / "requirements.lock"
    out.write_text(
        "# Pinned environment snapshot (parity artifact for the reference's"
        " uv.lock).\n"
        "# Generated from the baked image; regenerate with"
        " scripts/gen_lockfile.py.\n" + "\n".join(pins) + "\n"
    )
    print(f"wrote {out} ({len(pins)} pins)")


if __name__ == "__main__":
    main()

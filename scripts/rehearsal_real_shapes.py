"""Full-shape rehearsal of the real-data runbook (`make real-data`).

The real Instacart CSVs and the pretrained all-MiniLM-L6-v2 weights are not
available offline, so this script proves the RUNBOOK survives reference
scale with everything else real:

  - synthetic CSVs at reference scale (~200k users -> ~1.2M train pairs,
    50k products) with REAL-NAME GEOMETRY (long product names, so the
    p5_mp20 prep genuinely fills max_seq_length 256 — the reference's
    actual training shape),
  - a full-architecture warm-start checkpoint (vocab 30522, H=384, L=6;
    random weights — scripts/make_rehearsal_checkpoint.py) loaded through
    the same models/hf_loader.py path the real download would use,
  - the unmodified `scripts/real_data_run.py` recipe: p5_mp20_ef0.1 prep,
    5 warm-started epochs at B=64 / S=256 / lr 5e-5 / MNRL scale 30,
    per-epoch IR eval at ~20k queries x 50k corpus.

Quality numbers from random warm-start weights are NOT comparable to the
reference's pretrained run — the deliverable is shapes, wall-clock, and
memory (REHEARSAL_RESULTS.md), i.e. the proof that on parity day the
one-command runbook runs to completion at real scale.

    python scripts/rehearsal_real_shapes.py [--users 200000] [--skip-baselines]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_repo_root = str(_Path(__file__).resolve().parents[1])
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import resource
import time
from pathlib import Path


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--users", type=int, default=200_000)
    parser.add_argument("--products", type=int, default=50_000)
    parser.add_argument("--workdir", type=Path, default=Path("rehearsal_ws"))
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--skip-baselines", action="store_true")
    parser.add_argument("--skip-compare", action="store_true")
    args = parser.parse_args()

    from instacart_next_order_recommendation_tpu.data.synthetic import (
        generate_instacart_csvs,
    )

    wd = args.workdir
    wd.mkdir(parents=True, exist_ok=True)

    t0 = time.time()
    data_dir = wd / "data"
    if not (data_dir / "orders.csv").exists():
        print(f"=== generating reference-scale CSVs ({args.users} users, "
              f"{args.products} products, long names) ===")
        generate_instacart_csvs(
            data_dir, n_users=args.users, n_products=args.products,
            long_names=True, seed=1,
        )
        print(f"generated in {time.time() - t0:.0f}s")
    else:
        print(f"reusing CSVs in {data_dir}")

    ckpt = wd / "all-MiniLM-L6-v2"
    if not (ckpt / "pytorch_model.bin").exists():
        print("=== building full-architecture warm-start checkpoint ===")
        import subprocess

        subprocess.run(
            [_sys.executable, str(_Path(__file__).parent / "make_rehearsal_checkpoint.py"),
             "--out", str(ckpt)],
            check=True,
        )

    print("=== running the real-data runbook (scripts/real_data_run.py) ===")
    from scripts.real_data_run import main as runbook_main

    argv = [
        "--data-dir", str(data_dir),
        "--base-model", str(ckpt),
        "--workdir", str(wd / "run"),
        "--epochs", str(args.epochs),
        "--results", str(Path("REHEARSAL_RESULTS.md")),
    ]
    if args.skip_baselines:
        argv.append("--skip-baselines")
    if args.skip_compare:
        argv.append("--skip-compare")
    rc = runbook_main(argv)

    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    total_min = (time.time() - t0) / 60
    print(f"rehearsal total: {total_min:.1f} min, peak host RSS {peak_gb:.1f} GB")
    # Banner + resource footprint around the report the runbook just wrote:
    # the runbook's template is titled for the real-data parity day, and a
    # rehearsal's quality columns must not read as that claim.
    results = Path("REHEARSAL_RESULTS.md")
    if rc == 0 and results.exists():
        banner = (
            "> **SHAPE REHEARSAL, NOT REAL DATA.** Synthetic long-name CSVs"
            " + a random-weight all-MiniLM-L6-v2-architecture checkpoint"
            " through the unmodified `make real-data` recipe"
            " (scripts/rehearsal_real_shapes.py). Quality columns are NOT"
            " comparable to the reference's pretrained warm start; the"
            " deliverables are runbook completion at reference scale,"
            " per-stage wall clocks, and the memory envelope.\n\n"
        )
        body = results.read_text()
        if not body.startswith("> **SHAPE REHEARSAL"):
            body = banner + body
        results.write_text(
            body
            + f"\n## Rehearsal resource footprint\n\n"
            f"- total wall clock: {total_min:.1f} min (incl. data generation)\n"
            f"- peak host RSS: {peak_gb:.1f} GB\n"
            f"- scale: {args.users} users, {args.products} products, "
            f"long-name geometry (see scripts/rehearsal_real_shapes.py)\n"
        )
    return rc


if __name__ == "__main__":
    raise SystemExit(main())

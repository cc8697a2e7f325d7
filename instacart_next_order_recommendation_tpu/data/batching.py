"""Training batch construction: no-duplicates sampling + fixed-shape batches.

Replicates the reference's sampler semantics
(``BatchSamplers.NO_DUPLICATES`` with ``dataloader_drop_last=True``,
/root/reference/src/training/train_sbert.py:233,243): shuffled batches in
which no anchor or positive text repeats (duplicate positives would be false
negatives for MNRL); samples that don't fit wait for a later batch; the final
ragged batch is dropped.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np


def no_duplicates_batches(
    anchors: Sequence[str],
    positives: Sequence[str],
    batch_size: int,
    seed: int,
    epoch: int = 0,
) -> Iterator[np.ndarray]:
    """Yield index arrays of exactly ``batch_size`` (drop_last semantics)."""
    rng = np.random.default_rng(seed + epoch)
    remaining: list[int] = list(rng.permutation(len(anchors)))
    while len(remaining) >= batch_size:
        batch: list[int] = []
        seen: set[str] = set()
        deferred: list[int] = []
        cut = len(remaining)
        for pos, i in enumerate(remaining):
            a, p = anchors[i], positives[i]
            if a in seen or p in seen:
                deferred.append(i)
                continue
            batch.append(i)
            seen.add(a)
            seen.add(p)
            if len(batch) == batch_size:
                cut = pos + 1
                break
        if len(batch) < batch_size:
            # Remaining samples cannot fill a clean batch; drop them.
            return
        # Deferred duplicates retry at the front of the next batch's scan;
        # each batch scans only what it consumed (O(n) per epoch overall).
        remaining = deferred + remaining[cut:]
        yield np.asarray(batch)


def steps_per_epoch(n_samples: int, batch_size: int) -> int:
    """Upper bound used for LR scheduling (matches ceil-div of the reference,
    /root/reference/src/training/train_sbert.py:213-217; the no-duplicates
    sampler may yield slightly fewer)."""
    return -(-n_samples // batch_size)

"""Adversarial: corpus/model hot-swap racing live /recommend traffic.

The swap is a single atomic assignment into app.state; a request must
always be served by a CONSISTENT recommender — every returned product id
must belong to one corpus generation, never a mix, and no request may 500
mid-swap. Uses a real tiny tower (no mocks) so the whole serve path
(tokenize -> encode -> index -> rank) runs under the race.
"""

import json
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import pytest

from tests.helpers import make_tiny_model_dir


def _corpus(generation: int, n: int = 20) -> dict[str, str]:
    # Product ids are namespaced per generation so a response's provenance
    # is decidable: gen-g ids are f"{g}xxx".
    return {
        f"{generation}{i:03d}": f"Product: Organic Milk {generation}-{i}. Aisle: a{i % 3}. Department: d{i % 2}."
        for i in range(n)
    }


@pytest.mark.slow
def test_recommend_correct_during_corpus_swaps(tmp_path, monkeypatch):
    from instacart_next_order_recommendation_tpu.api.app import create_app
    from instacart_next_order_recommendation_tpu.api.http import TestClient

    monkeypatch.setenv("FEEDBACK_DB_PATH", str(tmp_path / "fb.db"))
    corpus0 = _corpus(1)
    mdir = make_tiny_model_dir(tmp_path, corpus0)
    corpus_path = tmp_path / "corpus.json"
    corpus_path.write_text(json.dumps(corpus0))

    app = create_app(model_dir=mdir, corpus_path=corpus_path, rate_limit="1000000/minute")
    with TestClient(app) as client:
        stop = threading.Event()
        errors: list[str] = []
        generations_seen: set[int] = set()

        def requester(i: int) -> None:
            while not stop.is_set():
                r = client.post(
                    "/recommend",
                    json={"user_context": f"Organic Milk {i}", "top_k": 5},
                )
                if r.status_code != 200:
                    errors.append(f"status {r.status_code}: {r.text[:200]}")
                    return
                pids = [x["product_id"] for x in r.json()["recommendations"]]
                gens = {int(p[0]) for p in pids}
                if len(gens) != 1:
                    errors.append(f"mixed-generation response: {pids}")
                    return
                generations_seen.add(gens.pop())

        def swapper() -> None:
            g = 2
            while not stop.is_set():
                r = client.post("/admin/corpus", json={"corpus": _corpus(g)})
                if r.status_code != 200:
                    errors.append(f"swap {g} failed: {r.status_code} {r.text[:200]}")
                    return
                # Let concurrent requesters observe this generation before
                # the next swap: the r4 fast path finishes a tiny-corpus
                # swap in milliseconds, faster than a request iteration.
                time.sleep(0.3)
                g += 1
                if g > 6:
                    break

        threads = [threading.Thread(target=requester, args=(i,)) for i in range(4)]
        sw = threading.Thread(target=swapper)
        for t in threads:
            t.start()
        sw.start()
        sw.join(timeout=120)
        assert not sw.is_alive(), "swapper did not finish within its timeout"
        # Final-state check AFTER the swapper provably finished: the last
        # installed corpus must be the one serving.
        r = client.post("/recommend", json={"user_context": "Organic Milk", "top_k": 5})
        assert r.status_code == 200
        final_gens = {int(x["product_id"][0]) for x in r.json()["recommendations"]}
        assert final_gens == {6}, f"final state must serve the last corpus: {final_gens}"
        stop.set()
        for t in threads:
            t.join(timeout=30)

        assert not errors, errors[:5]
        # LIVE traffic spanned swaps (the swapper's inter-swap pause
        # guarantees requesters can interleave): more than one corpus
        # generation answered concurrent requests.
        assert len(generations_seen) >= 2, generations_seen


def test_corpus_swap_reloads_retrained_checkpoint(tmp_path, monkeypatch):
    """The hot-swap fast path reuses the live encoder ONLY while the
    checkpoint files are unchanged: retraining into the same model dir and
    then uploading a corpus must reload the NEW weights from disk, never
    silently serve the stale in-memory tower."""
    import numpy as np

    from instacart_next_order_recommendation_tpu.api.app import create_app
    from instacart_next_order_recommendation_tpu.api.http import TestClient
    from instacart_next_order_recommendation_tpu.models import load_tower

    monkeypatch.setenv("FEEDBACK_DB_PATH", str(tmp_path / "fb.db"))
    corpus = _corpus(1)
    mdir = make_tiny_model_dir(tmp_path, corpus, seed=0)
    corpus_path = tmp_path / "corpus.json"
    corpus_path.write_text(json.dumps(corpus))

    app = create_app(model_dir=mdir, corpus_path=corpus_path)
    with TestClient(app) as client:
        # Same-files upload: the fast path may reuse the live encoder.
        r = client.post("/admin/corpus", json={"corpus": _corpus(2)})
        assert r.status_code == 200
        rec1 = app.state["recommender"]
        enc_reused = getattr(rec1, "_rec", rec1).encoder
        # "Retrain" into the SAME dir (different seed -> different weights;
        # bump mtimes to guarantee a signature change even on coarse
        # filesystems).
        time.sleep(0.01)
        (tmp_path / "model").rename(tmp_path / "model_old")
        mdir2 = make_tiny_model_dir(tmp_path, corpus, seed=9)
        assert mdir2 == mdir
        new_params, _, _ = load_tower(mdir)

        r = client.post("/admin/corpus", json={"corpus": _corpus(3)})
        assert r.status_code == 200
        rec2 = app.state["recommender"]
        enc_after = getattr(rec2, "_rec", rec2).encoder
        assert enc_after is not enc_reused, "stale encoder reused after retrain"
        # And the weights actually match the new checkpoint.
        import jax

        leaf_new = np.asarray(jax.tree.leaves(new_params)[0])
        leaf_live = np.asarray(jax.tree.leaves(enc_after.params)[0])
        np.testing.assert_array_equal(leaf_live, leaf_new)


def test_model_signature_detects_same_mtime_same_size_rewrite(tmp_path):
    """mtime+size collisions must not fool the staleness signature: a
    retrain that overwrites a checkpoint with equal-sized files inside the
    same timestamp tick still changes the content probe (r4 advisor)."""
    import os

    from instacart_next_order_recommendation_tpu.serve.recommender import (
        model_signature,
    )

    mdir = tmp_path / "model"
    mdir.mkdir()
    f = mdir / "params.msgpack"
    f.write_bytes(b"A" * 4096)
    st = f.stat()
    sig1 = model_signature(mdir)

    f.write_bytes(b"B" * 4096)  # same size, different weights
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns))  # pin mtime: collide
    st2 = f.stat()
    assert (st2.st_mtime_ns, st2.st_size) == (st.st_mtime_ns, st.st_size)
    assert model_signature(mdir) != sig1

"""Adversarial: corpus/model hot-swap racing live /recommend traffic.

The swap is a single atomic assignment into app.state; a request must
always be served by a CONSISTENT recommender — every returned product id
must belong to one corpus generation, never a mix, and no request may 500
mid-swap. Uses a real tiny tower (no mocks) so the whole serve path
(tokenize -> encode -> index -> rank) runs under the race.
"""

import json
import threading
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

    app = create_app(model_dir=mdir, corpus_path=corpus_path)
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
                g += 1
                if g > 6:
                    break

        threads = [threading.Thread(target=requester, args=(i,)) for i in range(4)]
        sw = threading.Thread(target=swapper)
        for t in threads:
            t.start()
        sw.start()
        sw.join(timeout=120)
        # One explicit post-swap request before stopping traffic: the r4
        # hot-swap fast path (live-encoder reuse + device-resident
        # embeddings) finishes all five swaps in well under a second, so
        # concurrent requesters may legitimately only ever observe the
        # first and/or last generations.
        r = client.post("/recommend", json={"user_context": "Organic Milk", "top_k": 5})
        assert r.status_code == 200
        final_gens = {int(x["product_id"][0]) for x in r.json()["recommendations"]}
        assert final_gens == {6}, f"final state must serve the last corpus: {final_gens}"
        generations_seen |= final_gens
        stop.set()
        for t in threads:
            t.join(timeout=30)

        assert not errors, errors[:5]
        # Traffic spanned swaps: more than one corpus generation answered.
        assert len(generations_seen) >= 2, generations_seen

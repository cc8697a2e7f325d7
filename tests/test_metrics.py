"""IR metric parity tests against hand-computed values and the array fast path.

The expected values encode the reference formulas
(/root/reference/src/baselines/metrics.py) computed by hand.
"""

import math

import numpy as np
import pytest

from instacart_next_order_recommendation_tpu.eval.metrics import (
    compute_ir_metrics,
    compute_ir_metrics_from_arrays,
)


def test_all_metrics_single_query_exact():
    # relevant doc "b" is ranked 2nd of 4
    rankings = {"q1": ["a", "b", "c", "d"]}
    relevant = {"q1": {"b"}}
    m = compute_ir_metrics(rankings, relevant)
    assert m["accuracy_at_1"] == 0.0
    assert m["accuracy_at_3"] == 1.0
    assert m["accuracy_at_5"] == 1.0
    assert m["accuracy_at_10"] == 1.0
    assert m["recall_at_10"] == 1.0
    assert m["mrr_at_10"] == pytest.approx(0.5)
    # DCG = 1/log2(3); IDCG = 1/log2(2) = 1
    assert m["ndcg_at_10"] == pytest.approx(1.0 / math.log2(3))
    # AP = (1/2) / min(1, 4) = 0.5
    assert m["map_at_100"] == pytest.approx(0.5)


def test_queries_without_relevants_excluded():
    rankings = {"q1": ["a", "b"], "q2": ["a", "b"]}
    relevant = {"q1": {"a"}, "q2": set()}
    m = compute_ir_metrics(rankings, relevant)
    # q2 must not dilute the averages
    assert m["accuracy_at_1"] == 1.0
    assert m["mrr_at_10"] == 1.0


def test_empty_input_returns_zeros():
    m = compute_ir_metrics({}, {})
    assert all(v == 0.0 for v in m.values())


def test_recall_partial():
    rankings = {"q": ["a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k"]}
    relevant = {"q": {"a", "k", "z"}}  # only "a" is in top-10; |relevant| = 3
    m = compute_ir_metrics(rankings, relevant)
    assert m["recall_at_10"] == pytest.approx(1.0 / 3.0)


def test_ndcg_reference_semantics_two_hits():
    # hits at ranks 1 and 3 in top-10: DCG = 1 + 1/log2(4); ideal = ranks 1,2
    rankings = {"q": ["r1", "x", "r2", "y"]}
    relevant = {"q": {"r1", "r2", "r_unretrieved"}}
    m = compute_ir_metrics(rankings, relevant)
    dcg = 1.0 + 1.0 / math.log2(4)
    idcg = 1.0 + 1.0 / math.log2(3)
    assert m["ndcg_at_10"] == pytest.approx(dcg / idcg)


def test_map_divides_by_min_relevant_and_ranked():
    # 2 relevant, both retrieved at ranks 1 and 2 of a 3-long ranking
    rankings = {"q": ["a", "b", "c"]}
    relevant = {"q": {"a", "b"}}
    m = compute_ir_metrics(rankings, relevant)
    # AP = (1/1 + 2/2) / min(2, 3) = 1.0
    assert m["map_at_100"] == pytest.approx(1.0)


def test_array_path_matches_dict_path(rng):
    n_queries, n_corpus, k = 64, 500, 100
    corpus_ids = [str(i) for i in range(n_corpus)]
    scores = rng.standard_normal((n_queries, n_corpus))
    ranked_idx = np.argsort(-scores, axis=1)[:, :k]

    query_ids = [f"q{i}" for i in range(n_queries)]
    relevant = {}
    for i, q in enumerate(query_ids):
        n_rel = int(rng.integers(0, 8))
        relevant[q] = set(str(int(j)) for j in rng.choice(n_corpus, size=n_rel, replace=False))

    rankings = {
        q: [corpus_ids[j] for j in ranked_idx[i]] for i, q in enumerate(query_ids)
    }
    m_dict = compute_ir_metrics(rankings, relevant)
    m_arr = compute_ir_metrics_from_arrays(ranked_idx, query_ids, relevant, corpus_ids)
    for key in m_dict:
        assert m_arr[key] == pytest.approx(m_dict[key], abs=1e-12), key


def test_array_metrics_corpus_narrower_than_ten():
    """Rankings with fewer than 10 columns (corpus < 10 docs) must not crash
    the array path; values must match the dict-API oracle."""
    import numpy as np

    from instacart_next_order_recommendation_tpu.eval.metrics import (
        compute_ir_metrics,
        compute_ir_metrics_from_arrays,
    )

    corpus_ids = [f"d{i}" for i in range(8)]
    query_ids = ["q0", "q1"]
    relevant = {"q0": {"d3"}, "q1": {"d0", "d7"}}
    ranked = np.array([[3, 1, 0, 2, 4, 5, 6, 7], [1, 2, 0, 3, 4, 5, 6, 7]])
    got = compute_ir_metrics_from_arrays(ranked, query_ids, relevant, corpus_ids)
    rankings = {
        q: [corpus_ids[j] for j in ranked[i]] for i, q in enumerate(query_ids)
    }
    want = compute_ir_metrics(rankings, relevant)
    for key, val in want.items():
        assert abs(got[key] - val) < 1e-9, key

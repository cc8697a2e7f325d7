"""Data-prep contract tests.

Two layers of checking:
1. Hand-computed expected strings on a micro dataset (explicit contract).
2. Full-artifact parity against the reference implementation executed as a
   test oracle on the same synthetic CSVs (skipped when /root/reference is
   not mounted).
"""

import json
import sys
from pathlib import Path

import pandas as pd
import pytest

from instacart_next_order_recommendation_tpu.data import (
    InstacartDataPrep,
    strip_next_order_from_context,
)
from instacart_next_order_recommendation_tpu.data.synthetic import generate_instacart_csvs

REFERENCE_ROOT = Path("/root/reference")


def _write_micro_dataset(data_dir: Path) -> None:
    data_dir.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(
        {
            "product_id": [1, 2, 3],
            "product_name": ["Organic Milk", "Whole Wheat Bread", "Banana"],
            "aisle_id": [10, 11, 12],
            "department_id": [20, 21, 22],
        }
    ).to_csv(data_dir / "products.csv", index=False)
    pd.DataFrame({"aisle_id": [10, 11, 12], "aisle": ["milk", "bread", "fresh fruits"]}).to_csv(
        data_dir / "aisles.csv", index=False
    )
    pd.DataFrame(
        {"department_id": [20, 21, 22], "department": ["dairy eggs", "bakery", "produce"]}
    ).to_csv(data_dir / "departments.csv", index=False)
    # user 1: two prior orders (101, 102) then target order 103
    pd.DataFrame(
        {
            "order_id": [101, 102, 103],
            "user_id": [1, 1, 1],
            "eval_set": ["prior", "prior", "train"],
            "order_number": [1, 2, 3],
            "order_dow": [4, 1, 2],
            "order_hour_of_day": [14, 9, 8],
            "days_since_prior_order": [float("nan"), 7.0, 3.0],
        }
    ).to_csv(data_dir / "orders.csv", index=False)
    pd.DataFrame(
        {
            "order_id": [101, 101, 102],
            "product_id": [1, 2, 3],
            "add_to_cart_order": [1, 2, 1],
            "reordered": [0, 0, 0],
        }
    ).to_csv(data_dir / "order_products__prior.csv", index=False)
    pd.DataFrame(
        {
            "order_id": [103, 103],
            "product_id": [1, 3],
            "add_to_cart_order": [1, 2],
            "reordered": [1, 0],
        }
    ).to_csv(data_dir / "order_products__train.csv", index=False)


class TestMicroContract:
    @pytest.fixture(scope="class")
    def artifacts(self, tmp_path_factory):
        base = tmp_path_factory.mktemp("micro")
        data_dir = base / "data"
        _write_micro_dataset(data_dir)
        prep = InstacartDataPrep(
            data_dir=data_dir, output_dir=base / "out", eval_frac=0.5, eval_serve_time=True
        )
        return prep.prepare(), prep

    def test_product_text_template(self, artifacts):
        (_, _, _, eval_corpus, _), _ = artifacts
        assert eval_corpus["1"] == "Product: Organic Milk. Aisle: milk. Department: dairy eggs."
        assert eval_corpus["3"] == "Product: Banana. Aisle: fresh fruits. Department: produce."

    def test_context_string_exact(self, artifacts):
        (train_ds, _, _, _, _), _ = artifacts
        # Order 103's context: order 101 (no days -> "w4h14"), order 102 ("+7d w1h9"),
        # then the target's Next clause (+3d w2h8). Single eval order -> all pairs eval.
        # eval_frac=0.5 with 1 order -> max(1, 0) = 1 eval order, so train is empty
        # and pairs live in the eval split. Check via eval_queries instead.
        assert len(train_ds) == 0

    def test_eval_query_strips_next(self, artifacts):
        (_, _, eval_queries, _, _), _ = artifacts
        expected_full = "[w4h14] Organic Milk, Whole Wheat Bread; [+7d w1h9] Banana. Next: +3d w2h8"
        assert eval_queries["103"] == strip_next_order_from_context(expected_full)
        assert eval_queries["103"] == "[w4h14] Organic Milk, Whole Wheat Bread; [+7d w1h9] Banana."

    def test_relevant_docs(self, artifacts):
        (_, _, _, _, relevant), _ = artifacts
        assert relevant == {"103": ["1", "3"]}

    def test_output_dir_naming(self, artifacts):
        _, prep = artifacts
        assert prep.effective_output_dir().name == "p5_mp20_ef0.5"

    def test_artifact_files_written(self, artifacts):
        _, prep = artifacts
        out = prep.effective_output_dir()
        for fname in ("eval_queries.json", "eval_corpus.json", "eval_relevant_docs.json", "data_prep_params.json"):
            assert (out / fname).exists()
        assert (out / "train_dataset").exists()


def test_max_product_names_cap(tmp_path):
    data_dir = tmp_path / "data"
    _write_micro_dataset(data_dir)
    prep = InstacartDataPrep(
        data_dir=data_dir, output_dir=tmp_path / "out", max_product_names=1, eval_frac=0.5
    )
    _, _, eval_queries, _, _ = prep.prepare()
    # cap=1: only the first product of the first prior order survives
    assert eval_queries["103"] == "[w4h14] Organic Milk."


def test_no_prior_orders_placeholder(tmp_path):
    data_dir = tmp_path / "data"
    _write_micro_dataset(data_dir)
    # restrict history to none by using max_prior_orders=0
    prep = InstacartDataPrep(
        data_dir=data_dir, output_dir=tmp_path / "out", max_prior_orders=0, eval_frac=0.5
    )
    _, _, eval_queries, _, _ = prep.prepare()
    assert eval_queries["103"] == "(no prior orders)."


@pytest.mark.skipif(not REFERENCE_ROOT.exists(), reason="reference repo not mounted")
class TestReferenceParity:
    """Run the reference pipeline as an oracle on identical synthetic CSVs."""

    @pytest.fixture(scope="class")
    def both_outputs(self, tmp_path_factory):
        base = tmp_path_factory.mktemp("parity")
        data_dir = generate_instacart_csvs(base / "data", n_users=40, n_products=80, seed=7)

        ours = InstacartDataPrep(data_dir=data_dir, output_dir=base / "ours", eval_frac=0.2)
        ours_out = ours.prepare()

        sys.path.insert(0, str(REFERENCE_ROOT))
        try:
            from src.data.prepare_instacart_sbert import InstacartDataLoader

            ref = InstacartDataLoader(
                data_dir=data_dir, output_dir=base / "ref", eval_frac=0.2
            )
            ref_out = ref.prepare()
        finally:
            sys.path.remove(str(REFERENCE_ROOT))
            for mod in [m for m in sys.modules if m == "src" or m.startswith("src.")]:
                del sys.modules[mod]
        return ours_out, ref_out

    def test_eval_queries_identical(self, both_outputs):
        (_, _, eq_ours, _, _), (_, _, eq_ref, _, _) = both_outputs
        assert eq_ours == eq_ref

    def test_eval_corpus_identical_incl_order(self, both_outputs):
        (_, _, _, ec_ours, _), (_, _, _, ec_ref, _) = both_outputs
        assert list(ec_ours.items()) == list(ec_ref.items())

    def test_relevant_docs_identical(self, both_outputs):
        (_, _, _, _, er_ours), (_, _, _, _, er_ref) = both_outputs
        assert er_ours == er_ref

    def test_train_pairs_identical(self, both_outputs):
        (tr_ours, ev_ours, _, _, _), (tr_ref, ev_ref, _, _, _) = both_outputs
        assert tr_ours["anchor"] == tr_ref["anchor"]
        assert tr_ours["positive"] == tr_ref["positive"]
        if ev_ref is not None:
            assert ev_ours["anchor"] == ev_ref["anchor"]
            assert ev_ours["positive"] == ev_ref["positive"]


def test_time_prefix_hour_formats():
    """String hours render verbatim (zfilled upstream); numeric hours as int
    (reference :254-255, :199-200)."""
    import numpy as np

    tp = InstacartDataPrep._time_prefix
    assert tp(float("nan"), 4, "04") == "w4h04"
    assert tp(7.0, 1, "09") == "+7d w1h09"
    assert tp(float("nan"), 4, 14) == "w4h14"
    assert tp(3.0, 2, np.int64(8)) == "+3d w2h8"


def test_max_prior_orders_window(tmp_path):
    """Only the most recent N prior orders enter the context."""
    data_dir = tmp_path / "data"
    _write_micro_dataset(data_dir)
    prep = InstacartDataPrep(
        data_dir=data_dir, output_dir=tmp_path / "out", max_prior_orders=1, eval_frac=0.5
    )
    _, _, eval_queries, _, _ = prep.prepare()
    # only order 102 (the most recent prior) remains
    assert eval_queries["103"] == "[+7d w1h9] Banana."

"""Real-data runbook (scripts/real_data_run.py): prereq checks + e2e flow.

The full Kaggle dataset can't ship with the repo, so the runbook is
exercised end to end on synthetic Instacart-schema CSVs with a synthesized
sentence-transformers-format warm-start checkpoint — the exact flow a user
runs with the real artifacts in place (``make real-data``).
"""

import json

import pytest

from scripts.real_data_run import REQUIRED_CSVS, check_prerequisites, format_table, main


class TestPrerequisites:
    def test_missing_everything(self, tmp_path):
        problems = check_prerequisites(tmp_path / "nodata", tmp_path / "nomodel")
        assert len(problems) == 2
        assert "does not exist" in problems[0]

    def test_missing_csvs_enumerated(self, tmp_path):
        data = tmp_path / "data"
        data.mkdir()
        (data / "orders.csv").write_text("order_id\n")
        problems = check_prerequisites(data, tmp_path / "nomodel")
        missing = [p for p in problems if p.startswith("missing CSV")]
        assert len(missing) == len(REQUIRED_CSVS) - 1

    def test_model_dir_contents_checked(self, tmp_path):
        data = tmp_path / "data"
        data.mkdir()
        for name in REQUIRED_CSVS:
            (data / name).write_text("x\n")
        model = tmp_path / "model"
        model.mkdir()
        (model / "config.json").write_text("{}")
        problems = check_prerequisites(data, model)
        assert any("weights" in p for p in problems)
        assert any("vocab.txt" in p for p in problems)

    def test_check_mode_exit_codes(self, tmp_path, capsys):
        rc = main(["--check", "--data-dir", str(tmp_path / "no"), "--base-model", str(tmp_path / "no2")])
        assert rc == 1
        assert "NOT READY" in capsys.readouterr().out


def test_format_table_merges_history():
    history = [
        {"epoch": 1, "ndcg_at_10": 0.1, "recall_at_10": 0.05},
        {"epoch": 2, "ndcg_at_10": 0.2, "recall_at_10": 0.07},
    ]
    table = format_table(history)
    assert "0.200 / 0.139" in table  # ours E2 vs reference E2 ndcg
    assert "— / 0.153" in table  # epochs we didn't run show a dash


@pytest.mark.slow
def test_runbook_end_to_end_tiny(tmp_path, capsys):
    """Full runbook flow: CSVs + ST-format checkpoint -> REAL_RESULTS.md.

    The warm-start checkpoint is written in the sentence-transformers
    ``0.auto_model.``-prefixed state-dict format (the format the reference's
    training output uses, /root/reference/src/training/train_sbert.py:139-142),
    so this also exercises that loader branch through the real training path.
    """
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    from instacart_next_order_recommendation_tpu.data.synthetic import (
        generate_instacart_csvs,
    )

    data_dir = generate_instacart_csvs(
        tmp_path / "data", n_users=60, n_products=80, seed=0
    )

    # Tiny BERT checkpoint in ST format with a vocab covering the synthetic
    # product vocabulary (training tokenizes with the checkpoint's vocab).
    words = sorted(
        {
            w.lower().strip(".,:;()")
            for line in (data_dir / "products.csv").read_text().splitlines()[1:]
            for w in line.replace(",", " ").split()
        }
        | {"product", "aisle", "department", "next", "w", "d", "h"}
    )
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"] + words + [f"##{w}" for w in words]
    hf_cfg = BertConfig(
        vocab_size=len(vocab),
        hidden_size=16,
        num_hidden_layers=1,
        num_attention_heads=2,
        intermediate_size=32,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    model = BertModel(hf_cfg)
    model_dir = tmp_path / "minilm"
    model_dir.mkdir()
    (model_dir / "config.json").write_text(hf_cfg.to_json_string())
    sd = {f"0.auto_model.{k}": v for k, v in model.state_dict().items()}
    torch.save(sd, model_dir / "pytorch_model.bin")
    (model_dir / "vocab.txt").write_text("\n".join(vocab) + "\n")

    rc = main(
        [
            "--data-dir", str(data_dir),
            "--base-model", str(model_dir),
            "--workdir", str(tmp_path / "ws"),
            "--epochs", "1",
            "--train-batch-size", "16",
            "--max-seq-length", "32",
            "--steps-per-dispatch", "1",
            "--results", str(tmp_path / "REAL_RESULTS.md"),
        ]
    )
    assert rc == 0
    report = (tmp_path / "REAL_RESULTS.md").read_text()
    assert "ndcg_at_10" in report and "/ 0.153" in report
    history = json.loads((tmp_path / "ws" / "model" / "eval_history.json").read_text())
    assert history[0]["epoch"] == 1 and "ndcg_at_10" in history[0]
    # Full published report from ONE invocation: both baseline rows (vs the
    # reference's README.md:283-292 numbers) and the collapse verdict.
    assert "Content-based (untrained tower) (ours / ref)" in report
    assert "Item-item CF (ours / ref)" in report and "/ 0.148" in report
    assert "Collapse diagnostics" in report
    assert "corpus mean pairwise cos-sim" in report

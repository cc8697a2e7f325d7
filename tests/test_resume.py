"""Checkpoint/resume: training continues from the last epoch checkpoint."""

import dataclasses
import json

import pytest

import instacart_next_order_recommendation_tpu.train.trainer as trainer_mod
from instacart_next_order_recommendation_tpu.data import InstacartDataPrep
from instacart_next_order_recommendation_tpu.data.synthetic import generate_instacart_csvs
from instacart_next_order_recommendation_tpu.train import TrainConfig, TwoTowerTrainer


@pytest.fixture()
def tiny_preset(monkeypatch):
    tiny = dataclasses.replace(
        trainer_mod.MINILM_L6,
        hidden_size=32,
        num_layers=1,
        num_heads=4,
        intermediate_size=64,
        compute_dtype="float32",
    )
    monkeypatch.setitem(trainer_mod._PRESETS, "minilm-l6", tiny)
    return tiny


def test_resume_continues_from_checkpoint(tmp_path, tiny_preset):
    data_dir = generate_instacart_csvs(tmp_path / "data", n_users=40, n_products=60, seed=9)
    prep = InstacartDataPrep(data_dir=data_dir, output_dir=tmp_path / "p", eval_frac=0.25)
    prep.prepare()

    base_cfg = {
        "processed_dir": str(prep.effective_output_dir()),
        "output_dir": str(tmp_path / "model"),
        "max_seq_length": 32,
        "epochs": 1,
        "train_batch_size": 8,
        "eval_batch_size": 16,
        "vocab_size": 500,
        "run_information_retrieval_evaluator": False,
    }
    # First run: 1 epoch.
    TwoTowerTrainer(TrainConfig(base_cfg)).train()
    state1 = json.loads(
        (tmp_path / "model" / "checkpoint-epoch1" / "train_state.json").read_text()
    )
    assert state1["epoch"] == 1

    # Resume with epochs=3: must start at epoch 2 and end with 3 history rows.
    result = TwoTowerTrainer(
        TrainConfig({**base_cfg, "epochs": 3, "resume": True})
    ).train()
    epochs_run = [h["epoch"] for h in result["history"]]
    assert epochs_run == [1, 2, 3]
    assert (tmp_path / "model" / "checkpoint-epoch3").exists()
    assert (tmp_path / "model" / "final").exists()
    # keep-2 retention
    ckpts = sorted(p.name for p in (tmp_path / "model").glob("checkpoint-epoch*"))
    assert len(ckpts) == 2


def test_resume_restores_optimizer_state_exactly(tmp_path, tiny_preset):
    """A resumed run must continue from the SAME optimizer state: training
    epochs 1..2 straight through and training epoch 1 then resuming for
    epoch 2 must produce identical parameters (bitwise, modulo nothing —
    same seed stream, same data order, same AdamW moments)."""
    import numpy as np

    from instacart_next_order_recommendation_tpu.models import load_tower

    data_dir = generate_instacart_csvs(tmp_path / "data", n_users=40, n_products=60, seed=3)
    prep = InstacartDataPrep(data_dir=data_dir, output_dir=tmp_path / "p", eval_frac=0.25)
    prep.prepare()

    def cfg(out, epochs, resume=False):
        return TrainConfig(
            {
                "processed_dir": str(prep.effective_output_dir()),
                "output_dir": str(tmp_path / out),
                "max_seq_length": 32,
                "epochs": epochs,
                "train_batch_size": 8,
                "eval_batch_size": 16,
                "vocab_size": 500,
                "run_information_retrieval_evaluator": False,
                "resume": resume,
            }
        )

    TwoTowerTrainer(cfg("straight", 2)).train()
    TwoTowerTrainer(cfg("resumed", 1)).train()
    TwoTowerTrainer(cfg("resumed", 2, resume=True)).train()

    p_straight, _, _ = load_tower(tmp_path / "straight" / "checkpoint-epoch2")
    p_resumed, _, _ = load_tower(tmp_path / "resumed" / "checkpoint-epoch2")
    import jax

    leaves_s = jax.tree.leaves(p_straight)
    leaves_r = jax.tree.leaves(p_resumed)
    assert len(leaves_s) == len(leaves_r)
    for a, b in zip(leaves_s, leaves_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)


def test_resume_with_no_checkpoint_starts_fresh(tmp_path, tiny_preset):
    """resume: true against an empty output dir must train from scratch, not
    crash (first deployment of a retrain-loop config)."""
    data_dir = generate_instacart_csvs(tmp_path / "data", n_users=40, n_products=60, seed=5)
    prep = InstacartDataPrep(data_dir=data_dir, output_dir=tmp_path / "p", eval_frac=0.25)
    prep.prepare()
    result = TwoTowerTrainer(
        TrainConfig(
            {
                "processed_dir": str(prep.effective_output_dir()),
                "output_dir": str(tmp_path / "model"),
                "max_seq_length": 32,
                "epochs": 1,
                "train_batch_size": 8,
                "eval_batch_size": 16,
                "vocab_size": 500,
                "run_information_retrieval_evaluator": False,
                "resume": True,
            }
        )
    ).train()
    assert [h["epoch"] for h in result["history"]] == [1]


def test_resume_adopts_checkpoint_rng_impl(tmp_path, tiny_preset, monkeypatch, caplog):
    """train_state.json records the dropout key stream; a resumed run with no
    explicit ITOR_DROPOUT_RNG must adopt the checkpoint's stream rather than
    the current default (the stream is part of the trajectory)."""
    import logging

    data_dir = generate_instacart_csvs(tmp_path / "data", n_users=40, n_products=60, seed=7)
    prep = InstacartDataPrep(data_dir=data_dir, output_dir=tmp_path / "p", eval_frac=0.25)
    prep.prepare()

    base_cfg = {
        "processed_dir": str(prep.effective_output_dir()),
        "output_dir": str(tmp_path / "model"),
        "max_seq_length": 32,
        "epochs": 1,
        "train_batch_size": 8,
        "eval_batch_size": 16,
        "vocab_size": 500,
        "run_information_retrieval_evaluator": False,
    }
    # First run pinned to threefry (the cross-version-stable stream).
    monkeypatch.setenv("ITOR_DROPOUT_RNG", "threefry")
    TwoTowerTrainer(TrainConfig(base_cfg)).train()
    state = json.loads(
        (tmp_path / "model" / "checkpoint-epoch1" / "train_state.json").read_text()
    )
    assert state["rng_impl"] == "threefry"

    # Resume WITHOUT the env var: must adopt threefry from the checkpoint
    # (and record it again), not fall back to the rbg default.
    monkeypatch.delenv("ITOR_DROPOUT_RNG")
    with caplog.at_level(logging.INFO):
        TwoTowerTrainer(
            TrainConfig({**base_cfg, "epochs": 2, "resume": True})
        ).train()
    assert "adopting the checkpoint's rng_impl=threefry" in caplog.text
    state2 = json.loads(
        (tmp_path / "model" / "checkpoint-epoch2" / "train_state.json").read_text()
    )
    assert state2["rng_impl"] == "threefry"

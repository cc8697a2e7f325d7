"""End-to-end training test on synthetic data (tiny tower, CPU mesh).

Covers the full slice: data prep -> tokenizer training -> MNRL training over
the 8-device mesh -> per-epoch IR eval -> checkpointing -> final export.
Asserts that training actually learns (loss drops, NDCG@10 beats the
untrained tower) — the functional parity bar of the reference pipeline.
"""

import json

import numpy as np
import pytest

from instacart_next_order_recommendation_tpu.data import InstacartDataPrep
from instacart_next_order_recommendation_tpu.data.batching import no_duplicates_batches
from instacart_next_order_recommendation_tpu.data.synthetic import generate_instacart_csvs
from instacart_next_order_recommendation_tpu.eval.evaluator import RetrievalEvaluator
from instacart_next_order_recommendation_tpu.models.text_encoder import TextEncoder
from instacart_next_order_recommendation_tpu.train import TrainConfig, TwoTowerTrainer


class TestNoDuplicatesSampler:
    def test_batches_have_no_duplicate_texts(self):
        anchors = [f"a{i % 7}" for i in range(50)]
        positives = [f"p{i % 11}" for i in range(50)]
        for idx in no_duplicates_batches(anchors, positives, 4, seed=0):
            batch_a = [anchors[i] for i in idx]
            batch_p = [positives[i] for i in idx]
            assert len(set(batch_a)) == len(batch_a)
            assert len(set(batch_p)) == len(batch_p)

    def test_drop_last(self):
        anchors = [f"a{i}" for i in range(10)]
        positives = [f"p{i}" for i in range(10)]
        batches = list(no_duplicates_batches(anchors, positives, 4, seed=0))
        assert all(len(b) == 4 for b in batches)
        assert len(batches) == 2  # 10 // 4, last ragged batch dropped

    def test_epoch_changes_order(self):
        anchors = [f"a{i}" for i in range(16)]
        positives = [f"p{i}" for i in range(16)]
        b0 = np.concatenate(list(no_duplicates_batches(anchors, positives, 4, 0, epoch=0)))
        b1 = np.concatenate(list(no_duplicates_batches(anchors, positives, 4, 0, epoch=1)))
        assert not np.array_equal(b0, b1)

    def test_matches_original_list_concat_algorithm(self):
        """The r5 pointer+carry rewrite (O(N) per epoch instead of O(N²/B)
        list copies) must yield the IDENTICAL batch sequence as the original
        formulation — training trajectories are seed-pinned."""

        def original(anchors, positives, batch_size, seed, epoch=0):
            rng = np.random.default_rng(seed + epoch)
            remaining = list(rng.permutation(len(anchors)))
            while len(remaining) >= batch_size:
                batch, seen, deferred = [], set(), []
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
                    return
                remaining = deferred + remaining[cut:]
                yield np.asarray(batch)

        rng = np.random.default_rng(5)
        # Heavy duplication (mod-k texts) exercises the carry path hard.
        for n, bs, amod, pmod in ((300, 16, 9, 23), (257, 8, 5, 257), (64, 64, 64, 64)):
            anchors = [f"a{int(rng.integers(amod))}" for _ in range(n)]
            positives = [f"p{int(rng.integers(pmod))}" for _ in range(n)]
            got = list(no_duplicates_batches(anchors, positives, bs, seed=1, epoch=2))
            want = list(original(anchors, positives, bs, seed=1, epoch=2))
            assert len(got) == len(want)
            for g, w in zip(got, want):
                np.testing.assert_array_equal(g, w)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    base = tmp_path_factory.mktemp("train_e2e")
    data_dir = generate_instacart_csvs(base / "data", n_users=120, n_products=150, seed=3)
    prep = InstacartDataPrep(data_dir=data_dir, output_dir=base / "processed", eval_frac=0.2)
    prep.prepare()

    cfg = TrainConfig(
        {
            "processed_dir": str(prep.effective_output_dir()),
            "output_dir": str(base / "model"),
            "model_name": "minilm-l6",
            "max_seq_length": 64,
            "epochs": 4,
            "train_batch_size": 8,  # global 64 over 8 CPU devices
            "eval_batch_size": 32,
            "learning_rate": 1.0e-3,
            "vocab_size": 2000,
            "logging_steps": 5,
        }
    )
    # Shrink the tower so the CPU test stays fast.
    import dataclasses

    import instacart_next_order_recommendation_tpu.train.trainer as trainer_mod

    tiny = dataclasses.replace(
        trainer_mod.MINILM_L6,
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        intermediate_size=128,
        compute_dtype="float32",
    )
    old = trainer_mod._PRESETS["minilm-l6"]
    trainer_mod._PRESETS["minilm-l6"] = tiny
    try:
        trainer = TwoTowerTrainer(cfg)
        result = trainer.train()
    finally:
        trainer_mod._PRESETS["minilm-l6"] = old
    return base, cfg, result, prep


def test_training_loss_decreases(trained):
    _, _, result, _ = trained
    hist = result["history"]
    assert len(hist) == 4
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]


def test_trained_beats_untrained(trained):
    base, cfg, result, prep = trained
    out = prep.effective_output_dir()
    eval_queries = json.loads((out / "eval_queries.json").read_text())
    eval_corpus = json.loads((out / "eval_corpus.json").read_text())
    eval_relevant = {
        k: set(v) for k, v in json.loads((out / "eval_relevant_docs.json").read_text()).items()
    }
    evaluator = RetrievalEvaluator(eval_queries, eval_corpus, eval_relevant, batch_size=32)

    encoder = TextEncoder.load(result["final_dir"])
    trained_metrics = evaluator(encoder)

    # Untrained tower: same config/tokenizer, fresh params.
    import jax

    from instacart_next_order_recommendation_tpu.models import init_params

    untrained = encoder.with_params(init_params(encoder.config, jax.random.key(123)))
    untrained_metrics = evaluator(untrained)

    assert trained_metrics["ndcg_at_10"] > untrained_metrics["ndcg_at_10"]
    assert trained_metrics["recall_at_10"] > untrained_metrics["recall_at_10"]
    # sanity: eval history recorded metrics per epoch
    assert "ndcg_at_10" in trained[2]["history"][0]


def test_checkpoint_layout(trained):
    base, cfg, result, _ = trained
    out = cfg.output_dir
    assert (out / "final" / "params.msgpack").exists()
    assert (out / "final" / "vocab.txt").exists()
    assert (out / "eval_history.json").exists()
    ckpts = list(out.glob("checkpoint-epoch*"))
    assert 1 <= len(ckpts) <= 2  # save_total_limit
    ck = ckpts[-1]
    assert (ck / "opt_state.msgpack").exists()
    assert (ck / "train_state.json").exists()


def test_steps_per_dispatch_equivalence(tmp_path, monkeypatch):
    """K-step scan dispatch equals K single-step dispatches (no dropout)."""
    import dataclasses
    import json

    import numpy as np

    import instacart_next_order_recommendation_tpu.train.trainer as tm
    from instacart_next_order_recommendation_tpu.data import InstacartDataPrep
    from instacart_next_order_recommendation_tpu.data.synthetic import (
        generate_instacart_csvs,
    )
    from instacart_next_order_recommendation_tpu.models import load_tower

    tiny = dataclasses.replace(
        tm.MINILM_L6,
        hidden_size=32,
        num_layers=1,
        num_heads=4,
        intermediate_size=64,
        compute_dtype="float32",
        hidden_dropout=0.0,
    )
    monkeypatch.setitem(tm._PRESETS, "minilm-l6", tiny)

    data_dir = generate_instacart_csvs(tmp_path / "d", n_users=30, n_products=50, seed=2)
    prep = InstacartDataPrep(data_dir=data_dir, output_dir=tmp_path / "p", eval_frac=0.25)
    prep.prepare()

    finals = {}
    for spd in (1, 2):
        out = tmp_path / f"m{spd}"
        cfg = tm.TrainConfig(
            {
                "processed_dir": str(prep.effective_output_dir()),
                "output_dir": str(out),
                "max_seq_length": 32,
                "epochs": 1,
                "train_batch_size": 4,
                "vocab_size": 400,
                "run_information_retrieval_evaluator": False,
                "steps_per_dispatch": spd,
            }
        )
        tm.TwoTowerTrainer(cfg).train()
        params, _, _ = load_tower(out / "final")
        finals[spd] = params

    import jax

    for a, b in zip(jax.tree.leaves(finals[1]), jax.tree.leaves(finals[2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_warm_start_from_own_checkpoint(tmp_path, monkeypatch):
    """model_name pointing at a saved checkpoint dir continues fine-tuning."""
    import dataclasses

    import instacart_next_order_recommendation_tpu.train.trainer as tm
    from instacart_next_order_recommendation_tpu.data import InstacartDataPrep
    from instacart_next_order_recommendation_tpu.data.synthetic import (
        generate_instacart_csvs,
    )

    tiny = dataclasses.replace(
        tm.MINILM_L6,
        hidden_size=32,
        num_layers=1,
        num_heads=4,
        intermediate_size=64,
        compute_dtype="float32",
    )
    monkeypatch.setitem(tm._PRESETS, "minilm-l6", tiny)
    data_dir = generate_instacart_csvs(tmp_path / "d", n_users=30, n_products=50, seed=4)
    prep = InstacartDataPrep(data_dir=data_dir, output_dir=tmp_path / "p", eval_frac=0.25)
    prep.prepare()

    base_cfg = {
        "processed_dir": str(prep.effective_output_dir()),
        "max_seq_length": 32,
        "epochs": 1,
        "train_batch_size": 4,
        "vocab_size": 400,
        "run_information_retrieval_evaluator": False,
    }
    r1 = tm.TwoTowerTrainer(
        tm.TrainConfig({**base_cfg, "output_dir": str(tmp_path / "m1")})
    ).train()
    r2 = tm.TwoTowerTrainer(
        tm.TrainConfig(
            {**base_cfg, "output_dir": str(tmp_path / "m2"), "model_name": r1["final_dir"]}
        )
    ).train()
    assert (tmp_path / "m2" / "final" / "params.msgpack").exists()


def test_max_seq_length_clamped_to_position_table(tmp_path, monkeypatch):
    """A train config asking for more sequence than the tower's position
    table must clamp (not silently gather out of bounds on device)."""
    import dataclasses

    import instacart_next_order_recommendation_tpu.train.trainer as tm

    tiny = dataclasses.replace(
        tm.MINILM_L6,
        hidden_size=32,
        num_layers=1,
        num_heads=4,
        intermediate_size=64,
        max_position=16,
        compute_dtype="float32",
    )
    monkeypatch.setitem(tm._PRESETS, "minilm-l6", tiny)
    trainer = tm.TwoTowerTrainer(
        tm.TrainConfig({"output_dir": str(tmp_path), "max_seq_length": 256})
    )
    _, config, _ = trainer._build_model(["Product: Organic Milk. Aisle: milk."])
    assert config.max_seq_length == 16


def test_gradient_accumulation_trains(tmp_path, monkeypatch):
    """gradient_accumulation_steps > 1 (optax.MultiSteps inside the jitted
    step) must train end to end with a sane LR trajectory."""
    import dataclasses

    import instacart_next_order_recommendation_tpu.train.trainer as tm
    from instacart_next_order_recommendation_tpu.data import InstacartDataPrep
    from instacart_next_order_recommendation_tpu.data.synthetic import (
        generate_instacart_csvs,
    )

    tiny = dataclasses.replace(
        tm.MINILM_L6,
        hidden_size=32,
        num_layers=1,
        num_heads=4,
        intermediate_size=64,
        compute_dtype="float32",
    )
    monkeypatch.setitem(tm._PRESETS, "minilm-l6", tiny)
    data_dir = generate_instacart_csvs(tmp_path / "d", n_users=80, n_products=60, seed=5)
    prep = InstacartDataPrep(data_dir=data_dir, output_dir=tmp_path / "p", eval_frac=0.2)
    prep.prepare()
    result = tm.TwoTowerTrainer(
        tm.TrainConfig(
            {
                "processed_dir": str(prep.effective_output_dir()),
                "output_dir": str(tmp_path / "m"),
                "max_seq_length": 32,
                "epochs": 2,
                "train_batch_size": 2,
                "data_parallel": 2,
                "gradient_accumulation_steps": 2,
                "vocab_size": 500,
                "run_information_retrieval_evaluator": False,
            }
        )
    ).train()
    losses = [h["train_loss"] for h in result["history"]]
    assert all(np.isfinite(l) for l in losses)
    assert (tmp_path / "m" / "final" / "params.msgpack").exists()


def test_checkpoint_retention_keeps_best(tmp_path):
    """keep-N pruning must never delete the best-by-NDCG checkpoint — the
    end-of-run export loads it (reference load_best_model_at_end)."""
    import dataclasses

    import jax

    import instacart_next_order_recommendation_tpu.train.trainer as tm
    from instacart_next_order_recommendation_tpu.models import init_params
    from instacart_next_order_recommendation_tpu.tokenizer import WordPieceTokenizer

    cfg = tm.TrainConfig({"output_dir": str(tmp_path), "save_total_limit": 1})
    trainer = tm.TwoTowerTrainer(cfg)
    tower = dataclasses.replace(
        tm.MINILM_L6, hidden_size=32, num_layers=1, num_heads=4,
        intermediate_size=64, vocab_size=40, max_position=32,
    )
    params = init_params(tower, jax.random.key(0))
    tok = WordPieceTokenizer.train(["milk bread"], vocab_size=40, min_frequency=1)
    import optax

    opt_state = optax.adamw(1e-4).init(params)

    history = []
    ndcgs = {1: 0.9, 2: 0.2, 3: 0.1}  # best is epoch 1
    for epoch in (1, 2, 3):
        history.append({"epoch": epoch, tm.BEST_METRIC: ndcgs[epoch]})
        trainer._save_epoch_checkpoint(epoch, params, opt_state, tower, tok, history)

    names = {p.name for p in tmp_path.glob("checkpoint-epoch*")}
    assert "checkpoint-epoch1" in names  # best retained
    assert "checkpoint-epoch3" in names  # latest retained
    assert "checkpoint-epoch2" not in names  # pruned by keep-1


def test_shipped_large_batch_recipe_parses():
    """configs/train_large_batch.yaml is the validated r4 flagship recipe
    (docs/VALIDATION.md Round 4: B=512, lr 3e-4, best NDCG@10 0.4076) —
    guard the shipped values so a drive-by edit can't silently decouple the
    config from the documented validation."""
    from pathlib import Path

    from instacart_next_order_recommendation_tpu.constants import PROJECT_ROOT

    cfg = TrainConfig.load(Path(PROJECT_ROOT) / "configs" / "train_large_batch.yaml")
    assert cfg.train_batch_size == 512
    assert cfg.learning_rate == pytest.approx(3e-4)
    # r5 temperature sweep for the 512-way pool: 30 -> 0.4133/0.4100 across
    # seeds, 50 -> 0.4182/0.4234, 70 -> 0.4192 (docs/VALIDATION.md "MNRL
    # temperature") — 50 ships; the B=64 recipe keeps the reference's 30.
    assert cfg.loss_scale == 50.0
    # remat must stay UNSET so _resolve_remat's auto policy applies: the
    # validated flagship runs (docs/VALIDATION.md r5) trained with remat
    # auto-OFF (the fused backward stores only layer inputs); a literal
    # `remat: true` here would force +3% step time back on.
    assert cfg.remat is None
    assert cfg.epochs == 8  # cosine horizon covers the peak (0.4182 at E5)


def test_resolve_remat_policy(monkeypatch, tmp_path):
    """_resolve_remat: explicit config wins; small batches never remat; at
    B>=256 remat engages only when the fused backward can NOT take the
    tower (docs/VALIDATION.md r5, ROADMAP item 1)."""
    from types import SimpleNamespace

    from instacart_next_order_recommendation_tpu import ops as ops_pkg
    from instacart_next_order_recommendation_tpu.train.trainer import TwoTowerTrainer

    minilm = (384, 12, 1536)  # hidden, heads, inter — fused-bwd-supported

    def resolve(batch, remat=None, shape=minilm, seq=128):
        stub = SimpleNamespace(cfg=SimpleNamespace(remat=remat, train_batch_size=batch))
        return TwoTowerTrainer._resolve_remat(stub, *shape, seq)

    # Explicit setting always wins.
    assert resolve(512, remat=True) is True
    assert resolve(512, remat=False) is False
    # Small batches never remat.
    assert resolve(64) is False
    # On this CPU test backend Pallas is off -> fused backward unavailable
    # -> the conservative B>=256 auto-remat stands.
    monkeypatch.delenv("ITOR_FORCE_PALLAS", raising=False)
    ops_pkg.use_pallas.cache_clear()
    try:
        assert resolve(512) is True
        # With the kernels force-enabled the fused backward takes the
        # MiniLM tower at S=128 and auto resolves to NO remat.
        monkeypatch.setenv("ITOR_FORCE_PALLAS", "1")
        ops_pkg.use_pallas.cache_clear()
        assert resolve(512) is False
        # A tower the fused backward cannot fully take keeps remat on
        # even with kernels enabled (non-128-aligned hidden size).
        assert resolve(512, shape=(300, 12, 1200)) is True
    finally:
        monkeypatch.delenv("ITOR_FORCE_PALLAS", raising=False)
        ops_pkg.use_pallas.cache_clear()

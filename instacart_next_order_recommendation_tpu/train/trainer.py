"""Two-tower contrastive trainer.

TPU-native rebuild of the reference training pipeline
(/root/reference/src/training/train_sbert.py): loads the processed (anchor,
positive) datasets and IR artifacts, trains the shared tower with
MultipleNegativesRankingLoss (scale 30), AdamW + cosine schedule with 10%
warmup, NO_DUPLICATES batching with drop_last, per-epoch IR evaluation, epoch
checkpoints with keep-2 retention, best-by-NDCG@10 selection, and a
``final/`` export.

Parallelism: one ``jax.jit`` train step over the global mesh. The batch is
sharded over the ``data`` axis and params are replicated; the MNRL logits
matrix ``Q @ P^T`` is computed on the GLOBAL batch, so XLA inserts the
positive-embedding all-gather over ICI automatically — cross-device in-batch
negatives without any hand-written collective (SURVEY.md §2.2).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import shutil
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization
from jax.sharding import NamedSharding, PartitionSpec as P

from instacart_next_order_recommendation_tpu.constants import (
    DATA_PREP_PARAMS_FILENAME,
    DEFAULT_CONFIG_TRAIN,
    DEFAULT_OUTPUT_DIR,
    DEFAULT_PROCESSED_DIR,
    EVAL_CORPUS_FILENAME,
    EVAL_DATASET_SUBDIR,
    EVAL_QUERIES_FILENAME,
    EVAL_RELEVANT_DOCS_FILENAME,
    FINAL_SUBDIR,
    TRAIN_DATASET_SUBDIR,
)
from instacart_next_order_recommendation_tpu.data.batching import (
    no_duplicates_batches,
    steps_per_epoch,
)
from instacart_next_order_recommendation_tpu.eval.evaluator import RetrievalEvaluator
from instacart_next_order_recommendation_tpu.models import (
    MINILM_L6,
    MPNET_BASE_CLASS,
    TowerConfig,
    encode,
    init_params,
    load_tower,
    save_tower,
)
from instacart_next_order_recommendation_tpu.models.text_encoder import TextEncoder
from instacart_next_order_recommendation_tpu.ops import mnrl_loss
from instacart_next_order_recommendation_tpu.parallel import MeshConfig, build_mesh
from instacart_next_order_recommendation_tpu.parallel.mesh import (
    maybe_initialize_distributed,
)
from instacart_next_order_recommendation_tpu.tokenizer import (
    WordPieceTokenizer,
    bucket_length,
)
from instacart_next_order_recommendation_tpu.utils import (
    resolve_processed_dir,
    setup_colored_logging,
)
from instacart_next_order_recommendation_tpu.utils.config import (
    load_yaml_config,
    resolve_project_path,
)

logger = logging.getLogger(__name__)

_PRESETS = {"minilm-l6": MINILM_L6, "mpnet-base": MPNET_BASE_CLASS}

BEST_METRIC = "ndcg_at_10"  # reference selects by cosine_ndcg@10 (:219-220)

# Recognized dropout key streams (ITOR_DROPOUT_RNG / train_state.json
# "rng_impl"). Order is the broadcast wire code for multi-host resume.
_RNG_IMPLS = ("rbg", "threefry", "unsafe_rbg")


def _tower_digest(tower_cfg, tokenizer) -> bytes:
    """sha256 over (architecture config, vocab, pad id): the inputs that must
    be bit-identical across processes for multi-host training to be sane."""
    import hashlib

    h = hashlib.sha256()
    h.update(json.dumps(tower_cfg.to_dict(), sort_keys=True).encode())
    if tokenizer is not None:
        for token, idx in sorted(tokenizer.vocab.items(), key=lambda kv: kv[1]):
            h.update(f"{idx}:{token}\n".encode())
        h.update(str(tokenizer.pad_id).encode())
    return h.digest()


class TrainConfig:
    """Typed training configuration (same YAML keys as the reference plus
    TPU-native extensions: model preset/warm-start dir, vocab size, mesh)."""

    def __init__(self, raw: dict):
        self.processed_dir = resolve_project_path(raw.get("processed_dir"), DEFAULT_PROCESSED_DIR)
        self.output_dir = resolve_project_path(raw.get("output_dir"), DEFAULT_OUTPUT_DIR)
        # model: preset name ("minilm-l6"/"mpnet-base") or path to a checkpoint
        # dir (ours or HF format) for a warm start.
        self.model_name = str(raw.get("model_name", "minilm-l6"))
        self.max_seq_length = int(raw.get("max_seq_length", 256))
        self.epochs = int(raw.get("epochs", 5))
        self.train_batch_size = int(raw.get("train_batch_size", 64))
        self.eval_batch_size = int(raw.get("eval_batch_size", 64))
        self.gradient_accumulation_steps = int(raw.get("gradient_accumulation_steps", 1))
        self.learning_rate = float(raw.get("learning_rate", 5e-5))
        self.loss_scale = float(raw.get("loss_scale", 30.0))
        self.weight_decay = float(raw.get("weight_decay", 0.0))
        self.run_information_retrieval_evaluator = bool(
            raw.get("run_information_retrieval_evaluator", True)
        )
        self.vocab_size = int(raw.get("vocab_size", 30000))
        self.seed = int(raw.get("seed", 42))
        self.data_parallel = raw.get("data_parallel")  # None = all devices
        self.model_parallel = int(raw.get("model_parallel", 1))
        self.save_total_limit = int(raw.get("save_total_limit", 2))
        self.logging_steps = int(raw.get("logging_steps", 100))
        self.resume = bool(raw.get("resume", False))
        # Optimizer steps executed per device dispatch (lax.scan over stacked
        # batches). >1 amortizes per-dispatch latency — the dominant per-step
        # cost on tunneled/remote TPU setups.
        self.steps_per_dispatch = int(raw.get("steps_per_dispatch", 1))
        # Train-step formulation: "auto" picks shard_map for dp-only meshes
        # and GSPMD when tensor parallelism is on; "shard_map" forces the
        # explicit-collectives step (Megatron TP against local shards, keeps
        # Pallas kernels available on multi-device meshes); "gspmd" forces
        # the single-jit step.
        self.train_step_mode = str(raw.get("train_step_mode", "auto"))
        if self.train_step_mode not in ("auto", "gspmd", "shard_map"):
            raise ValueError(
                f"train_step_mode must be auto|gspmd|shard_map, got {self.train_step_mode!r}"
            )
        # Layer rematerialization; None = auto (resolved per tower in
        # _resolve_remat once the architecture is known): on for large
        # per-device batches where stored attention probabilities would
        # blow HBM, EXCEPT when the fused-layer backward takes the tower —
        # its custom_vjp already stores only layer inputs (flash-style
        # recompute), so remat would just re-run the forward kernel for
        # nothing (measured r5: +3% step time at B=512/S=256).
        self.remat = raw.get("remat")

    @classmethod
    def load(cls, config_path: Path | None = None) -> "TrainConfig":
        return cls(load_yaml_config(config_path, DEFAULT_CONFIG_TRAIN))


class TwoTowerTrainer:
    """Runs the full training pipeline. See module docstring."""

    def __init__(self, config: TrainConfig):
        from instacart_next_order_recommendation_tpu.utils.cache import (
            enable_compilation_cache,
        )

        self.cfg = config
        # Persist train-step/eval compiles across runs (idempotent, best
        # effort). Until now only the serve path enabled this (TextEncoder),
        # so a fresh training process re-paid the full cold compile — minutes
        # per program through a remote compile service.
        enable_compilation_cache()
        maybe_initialize_distributed()
        self.mesh = build_mesh(
            MeshConfig(data_parallel=config.data_parallel, model_parallel=config.model_parallel)
        )
        self.dp = self.mesh.shape["data"]

    # ------------------------------------------------------------------ data

    def _load_processed(self):
        from datasets import load_from_disk

        processed_dir, msg = resolve_processed_dir(self.cfg.processed_dir, DEFAULT_PROCESSED_DIR)
        if msg:
            logger.info("%s", msg)
        self.processed_dir = processed_dir
        train_ds = load_from_disk(str(processed_dir / TRAIN_DATASET_SUBDIR))
        self.eval_pairs = None
        if (processed_dir / EVAL_DATASET_SUBDIR).exists():
            eval_ds = load_from_disk(str(processed_dir / EVAL_DATASET_SUBDIR))
            # list(): bulk-decode the lazy Arrow Columns (see the anchors
            # materialization note in train()).
            self.eval_pairs = (list(eval_ds["anchor"]), list(eval_ds["positive"]))
        with open(processed_dir / EVAL_QUERIES_FILENAME) as f:
            eval_queries = json.load(f)
        with open(processed_dir / EVAL_CORPUS_FILENAME) as f:
            eval_corpus = json.load(f)
        with open(processed_dir / EVAL_RELEVANT_DOCS_FILENAME) as f:
            eval_relevant = {k: set(v) for k, v in json.load(f).items()}
        logger.info(
            "[1/5] train pairs: %d, queries: %d, corpus: %d",
            len(train_ds),
            len(eval_queries),
            len(eval_corpus),
        )
        return train_ds, eval_queries, eval_corpus, eval_relevant

    # ------------------------------------------------------------------ model

    def _resolve_remat(self, hidden: int, num_heads: int, inter: int,
                       seq: int) -> bool:
        """Auto remat policy (see TrainConfig.remat). Conservative: any
        tower the fused backward can't fully take at this (geometry, seq)
        keeps the B>=256 auto-remat — for those, XLA's saved activations
        (incl. [B, heads, S, S] probabilities) genuinely blow HBM
        (measured: mpnet-class at B=512 OOMs without remat)."""
        if self.cfg.remat is not None:
            return bool(self.cfg.remat)
        if self.cfg.train_batch_size < 256:
            return False
        from instacart_next_order_recommendation_tpu.models.encoder import (
            _fused_layer_enabled,
        )
        from instacart_next_order_recommendation_tpu.ops import fused_layer

        fused_bwd = (
            _fused_layer_enabled()
            and fused_layer._env_on("ITOR_FUSED_BWD")
            and fused_layer.supports(hidden, num_heads, max(16, seq - seq % 16))
            and fused_layer.bwd_supports(hidden, inter, seq, wgrads=True)
        )
        if fused_bwd:
            logger.info(
                "  remat auto-off: fused backward stores only layer inputs"
            )
        return not fused_bwd

    def _build_model(self, corpus_texts_for_vocab):
        name = self.cfg.model_name
        preset = _PRESETS.get(name)
        key = jax.random.key(self.cfg.seed)

        def _bounded_seq_len(tower_max_position: int) -> int:
            # max_seq_length cannot exceed the position-embedding table:
            # XLA clamps out-of-bounds gathers silently, which would encode
            # every position past the table with the last row. Matches
            # sentence-transformers, which bounds max_seq_length by the
            # model's max position.
            if self.cfg.max_seq_length > tower_max_position:
                logger.warning(
                    "max_seq_length %d exceeds the tower's max_position %d; clamping",
                    self.cfg.max_seq_length,
                    tower_max_position,
                )
                return tower_max_position
            return self.cfg.max_seq_length
        if preset is not None:
            tokenizer = WordPieceTokenizer.train(
                corpus_texts_for_vocab, vocab_size=self.cfg.vocab_size
            )
            import dataclasses

            seq_b = _bounded_seq_len(preset.max_position)
            config = dataclasses.replace(
                preset,
                vocab_size=tokenizer.vocab_size,
                max_seq_length=seq_b,
                remat=self._resolve_remat(
                    preset.hidden_size, preset.num_heads,
                    preset.intermediate_size, seq_b,
                ),
            )
            params = init_params(config, key)
            logger.info(
                "[2/5] model preset %s from scratch (vocab %d)", name, tokenizer.vocab_size
            )
        else:
            params, config, tokenizer = load_tower(name)
            if tokenizer is None:
                raise FileNotFoundError(f"warm-start dir {name} has no vocab.txt")
            import dataclasses

            seq_b = _bounded_seq_len(config.max_position)
            config = dataclasses.replace(
                config,
                max_seq_length=seq_b,
                remat=self._resolve_remat(
                    config.hidden_size, config.num_heads,
                    config.intermediate_size, seq_b,
                ),
            )
            logger.info("[2/5] warm start from %s", name)
        # Propagate the clamp to every downstream consumer of
        # cfg.max_seq_length (tokenization, bucket choice, TextEncoder,
        # eval-loss batches) — clamping only the tower config would let a
        # longer-than-table sequence reach encode() and raise.
        self.cfg.max_seq_length = config.max_seq_length
        return params, config, tokenizer

    # ------------------------------------------------------------------ optimizer

    def _build_optimizer(self, total_steps: int):
        warmup = int(0.1 * total_steps)  # reference: 10% warmup (:215-217)
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=self.cfg.learning_rate,
            warmup_steps=max(1, warmup),
            decay_steps=max(2, total_steps),
            end_value=0.0,
        )
        tx = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=self.cfg.weight_decay)
        if self.cfg.gradient_accumulation_steps > 1:
            tx = optax.MultiSteps(tx, self.cfg.gradient_accumulation_steps)
        return tx, schedule

    # ------------------------------------------------------------------ train step

    def _make_train_step(self, tower_cfg: TowerConfig, tx):
        """Build the jitted train step.

        Two equivalent formulations (tested against each other):

        - **GSPMD** (default; required for tensor parallelism): one jit over
          the mesh, batch sharded on ``data``, params sharded per the TP
          rules; MNRL computes the GLOBAL logits matrix so XLA inserts the
          positive all-gather and gradient psum itself.
        - **shard_map** (dp and dp x tp): the step runs per-device on LOCAL
          shapes with explicit collectives — ``all_gather`` (negatives,
          inside mnrl_loss), ``pmean`` over ``data`` (grads), and for tp > 1
          the Megatron tp_enter/tp_exit psums over ``model`` inside the tower
          (models/encoder.py, parallel/tp.py). Pallas kernels see local
          shapes here, so the fused attention/pool kernels stay active on
          multi-chip TPU meshes (a pallas_call is opaque to the GSPMD
          partitioner). ``auto`` picks it for dp-only meshes; set
          ``train_step_mode: shard_map`` to use it with tensor parallelism.
        """
        from instacart_next_order_recommendation_tpu.parallel import (
            opt_state_specs,
            param_shardings,
            param_specs,
        )

        rep = NamedSharding(self.mesh, P())
        dat = NamedSharding(self.mesh, P("data"))
        p_shard = param_shardings(self.mesh, tower_cfg)
        tp = self.mesh.shape["model"]
        if self.cfg.train_step_mode == "auto":
            use_shard_map = self.dp > 1 and tp == 1
        else:
            use_shard_map = self.cfg.train_step_mode == "shard_map"

        n_scan = self.cfg.steps_per_dispatch

        def scan_steps(one_step):
            """Wrap a single-step fn into a lax.scan over stacked batches.

            ``batch`` arrays gain a leading [steps_per_dispatch] axis; the
            step key is folded per sub-step. Returns the last loss.
            """
            if n_scan == 1:
                return one_step

            def multi(params, opt_state, batch, step_key):
                keys = jax.random.split(step_key, n_scan)

                def body(carry, xs):
                    p, o = carry
                    b, k = xs
                    p, o, loss = one_step(p, o, b, k)
                    return (p, o), loss

                (params, opt_state), losses = jax.lax.scan(
                    body, (params, opt_state), (batch, keys)
                )
                return params, opt_state, losses[-1]

            return multi

        if use_shard_map:
            from jax import shard_map

            model_axis = "model" if tp > 1 else None

            def local_step(params, opt_state, batch, step_key):
                a_ids, a_mask, p_ids, p_mask = batch  # local [B/dp, S] shards
                # Decorrelate dropout across data shards ONLY: model-axis
                # devices hold shards of the same example and must draw
                # identical dropout masks.
                step_key = jax.random.fold_in(step_key, jax.lax.axis_index("data"))

                def loss_fn(p):
                    ka, kp = jax.random.split(step_key)
                    qa = encode(p, a_ids, a_mask, tower_cfg, dropout_key=ka, model_axis=model_axis)
                    qp = encode(p, p_ids, p_mask, tower_cfg, dropout_key=kp, model_axis=model_axis)
                    return mnrl_loss(
                        qa, qp, scale=self.cfg.loss_scale, axis_name="data"
                    )

                loss, grads = jax.value_and_grad(loss_fn)(params)
                loss = jax.lax.pmean(loss, "data")
                # Grads of TP shards are shard-local; grads of replicated
                # params come out FULL and identical across the model axis
                # (tp_enter psums the activation cotangents) — only the data
                # axis needs reducing.
                grads = jax.lax.pmean(grads, "data")
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss

            p_specs = param_specs(tower_cfg, tensor_parallel=tp > 1)
            params_shape = jax.eval_shape(
                lambda: init_params(tower_cfg, jax.random.key(0))
            )
            o_specs = opt_state_specs(jax.eval_shape(tx.init, params_shape), p_specs)
            batch_spec = P(None, "data") if n_scan > 1 else P("data")
            mapped = shard_map(
                scan_steps(local_step),
                mesh=self.mesh,
                in_specs=(p_specs, o_specs, (batch_spec,) * 4, P()),
                out_specs=(p_specs, o_specs, P()),
                check_vma=False,
            )
            return ("shard_map", jax.jit(mapped, donate_argnums=(0, 1))), p_shard

        def gspmd_step(params, opt_state, batch, step_key):
            a_ids, a_mask, p_ids, p_mask = batch

            def loss_fn(p):
                ka, kp = jax.random.split(step_key)
                qa = encode(p, a_ids, a_mask, tower_cfg, dropout_key=ka)
                qp = encode(p, p_ids, p_mask, tower_cfg, dropout_key=kp)
                # Global-batch MNRL: sharded embeddings, XLA all-gathers.
                return mnrl_loss(qa, qp, scale=self.cfg.loss_scale)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        dat_b = (
            NamedSharding(self.mesh, P(None, "data")) if n_scan > 1 else dat
        )
        train_step = partial(
            jax.jit,
            in_shardings=(p_shard, None, (dat_b,) * 4, rep),
            out_shardings=(p_shard, None, rep),
            donate_argnums=(0, 1),
        )(scan_steps(gspmd_step))

        return ("gspmd", train_step), p_shard

    # ------------------------------------------------------------------ checkpoints

    def _sorted_checkpoints(self) -> list:
        return sorted(
            self.cfg.output_dir.glob("checkpoint-epoch*"),
            key=lambda p: int(p.name.rsplit("epoch", 1)[1]),
        )

    def _save_epoch_checkpoint(
        self, epoch, params, opt_state, tower_cfg, tokenizer, history, rng_impl="rbg"
    ):
        ckpt_dir = self.cfg.output_dir / f"checkpoint-epoch{epoch}"
        save_tower(ckpt_dir, params, tower_cfg, tokenizer)
        host_opt = jax.tree.map(np.asarray, opt_state)
        (ckpt_dir / "opt_state.msgpack").write_bytes(serialization.to_bytes(host_opt))
        # rng_impl is recorded so a resumed run stays on the checkpoint's
        # dropout key stream even if the ITOR_DROPOUT_RNG default changes
        # between runs (the stream is part of the trajectory).
        (ckpt_dir / "train_state.json").write_text(
            json.dumps({"epoch": epoch, "history": history, "rng_impl": rng_impl})
        )
        # keep-N retention (reference save_total_limit=2, :236) — but never
        # prune the best-so-far checkpoint: the end-of-run export loads it
        # (reference load_best_model_at_end retains it the same way), and
        # deleting it would silently export last-epoch params as "best".
        ckpts = self._sorted_checkpoints()
        keep = {p.name for p in ckpts[-self.cfg.save_total_limit :]}
        scored = [h for h in history if BEST_METRIC in h]
        if scored:
            best = max(scored, key=lambda h: h[BEST_METRIC])["epoch"]
            keep.add(f"checkpoint-epoch{best}")
        for old in ckpts:
            if old.name not in keep:
                shutil.rmtree(old, ignore_errors=True)
        return ckpt_dir

    def _find_resume_checkpoint(self):
        ckpts = self._sorted_checkpoints()
        return ckpts[-1] if ckpts else None

    # ------------------------------------------------------------------ run

    def train(self) -> dict:
        """Run training; returns {"history": [...], "best_epoch": int}."""
        cfg = self.cfg
        # Multi-host: every process computes identical replicated state, but
        # only process 0 touches the filesystem (checkpoints, history, final
        # export) — on a shared FS concurrent writers would corrupt each
        # other, and on per-host disks the copies would silently diverge.
        is_main = jax.process_index() == 0
        if is_main:
            cfg.output_dir.mkdir(parents=True, exist_ok=True)

        train_ds, eval_queries, eval_corpus, eval_relevant = self._load_processed()
        # Materialize the columns ONCE: datasets>=5 returns a lazy Arrow
        # Column whose per-item __getitem__ pays an Arrow fetch — the
        # no-duplicates sampler touches ~2 items per scanned sample per
        # batch, which at reference scale (1.08M pairs, B=64) measured
        # ~2 s of host time per 8-step dispatch (ITOR_LOOP_TIMING) while
        # the chip idled. list() is one bulk decode.
        anchors: list[str] = list(train_ds["anchor"])
        positives: list[str] = list(train_ds["positive"])

        self._log_params()
        vocab_texts = list(eval_corpus.values()) + anchors[:50_000]
        params, tower_cfg, tokenizer = self._build_model(vocab_texts)

        # Pre-tokenize once (host); per-batch padding to a fixed global bucket.
        logger.info("[3/5] tokenizing %d pairs...", len(anchors))
        t0 = time.time()

        def tokenize_all(texts: list[str]) -> list[tuple[np.ndarray, np.ndarray]]:
            # Chunked batch tokenization hits the C++ fast path; chunks stay
            # at their own bucketed width until the global bucket is known
            # (preallocating [N, max_seq_length] would be ~2x the footprint
            # whenever the corpus maxes out below the cap).
            chunks = []
            chunk = 8192
            for lo in range(0, len(texts), chunk):
                ids, mask = tokenizer.encode_batch(
                    texts[lo : lo + chunk], max_seq_length=cfg.max_seq_length
                )
                chunks.append((ids, mask.sum(axis=1)))
            return chunks

        a_chunks = tokenize_all(anchors)
        p_chunks = tokenize_all(positives)
        max_len = max(
            (int(lens.max()) for _, lens in a_chunks + p_chunks if len(lens)),
            default=2,
        )
        self.seq_len = bucket_length(max_len, cfg.max_seq_length)

        def pack(chunks, n: int) -> tuple[np.ndarray, np.ndarray]:
            # One padded [N, seq_len] id matrix + lengths vector per tower:
            # per-epoch batch assembly becomes a single fancy-index (the old
            # ragged-list storage cost a 324k-iteration Python re-pad loop
            # EVERY epoch, ~3 s/epoch on a 2-core host).
            ids_all = np.full((n, self.seq_len), tokenizer.pad_id, np.int32)
            len_all = np.zeros(n, np.int64)
            lo = 0
            for ids, lens in chunks:
                w = min(ids.shape[1], self.seq_len)
                ids_all[lo : lo + len(ids), :w] = ids[:, :w]
                len_all[lo : lo + len(ids)] = lens
                lo += len(ids)
            return ids_all, len_all

        a_ids_all, a_len_all = pack(a_chunks, len(anchors))
        p_ids_all, p_len_all = pack(p_chunks, len(positives))
        del a_chunks, p_chunks
        logger.info(
            "  tokenized in %.1fs; padded seq len %d", time.time() - t0, self.seq_len
        )

        global_batch = cfg.train_batch_size * self.dp
        n_steps_epoch = steps_per_epoch(len(anchors), global_batch)
        # The schedule horizon counts OPTIMIZER steps: optax.MultiSteps
        # advances the inner adamw (and its schedule) once per
        # gradient_accumulation_steps micro-batches, so the horizon is the
        # micro-step count divided by — not multiplied by — the accumulation
        # factor (the reference folds accumulation into effective batch the
        # same way, train_sbert.py:213-217).
        accum = max(1, cfg.gradient_accumulation_steps)
        total_steps = max(2, cfg.epochs * n_steps_epoch // accum)
        tx, schedule = self._build_optimizer(total_steps)
        (step_mode, train_step), p_shard = self._make_train_step(tower_cfg, tx)
        logger.info("  train step mode: %s", step_mode)
        # Place params per the sharding rules; optimizer state inherits the
        # layout through the jitted init (zeros_like propagates shardings).
        params = jax.device_put(params, p_shard)

        evaluator = None
        if cfg.run_information_retrieval_evaluator:
            evaluator = RetrievalEvaluator(
                eval_queries, eval_corpus, eval_relevant, batch_size=cfg.eval_batch_size
            )
        encoder = TextEncoder(
            params, tower_cfg, tokenizer, cfg.max_seq_length, mesh=self.mesh
        )

        opt_state = jax.jit(tx.init)(params)
        start_epoch = 1
        history: list[dict] = []
        resume_rng_impl: str | None = None  # checkpoint's recorded key stream

        if cfg.resume:
            if jax.process_count() > 1:
                # Only process 0 writes checkpoints (see is_main above), so
                # on per-host disks only it can FIND one. It reads and
                # broadcasts the state; every process resumes identically —
                # without this, non-main hosts would restart at epoch 1 with
                # fresh params and the replicated state would silently
                # diverge across the pod.
                from jax.experimental import multihost_utils

                ckpt = self._find_resume_checkpoint() if is_main else None
                last_epoch = 0
                rng_code = -1
                if is_main and ckpt is not None:
                    state = json.loads((ckpt / "train_state.json").read_text())
                    last_epoch = int(state["epoch"])
                    if state.get("rng_impl") in _RNG_IMPLS:
                        rng_code = _RNG_IMPLS.index(state["rng_impl"])
                last_epoch = int(
                    multihost_utils.broadcast_one_to_all(np.int32(last_epoch))
                )
                rng_code = int(
                    multihost_utils.broadcast_one_to_all(np.int32(rng_code))
                )
                if rng_code >= 0:
                    resume_rng_impl = _RNG_IMPLS[rng_code]
                if last_epoch > 0:
                    if is_main:
                        params, tower_cfg, tokenizer = load_tower(ckpt)
                        opt_state = serialization.from_bytes(
                            jax.tree.map(np.asarray, opt_state),
                            (ckpt / "opt_state.msgpack").read_bytes(),
                        )
                        history = state.get("history", [])
                    params = multihost_utils.broadcast_one_to_all(params)
                    opt_state = multihost_utils.broadcast_one_to_all(opt_state)
                    # Params/opt_state are broadcast, but tokenizer/tower_cfg
                    # are NOT: process 0 now holds the checkpoint's while
                    # every other process keeps the freshly built ones. If
                    # they differ (config edited between runs, vocab rebuilt
                    # differently), pad_id/tokenization silently diverge
                    # across the pod — fail loudly instead by asserting a
                    # digest of (tower_cfg, vocab, pad_id) matches process 0.
                    digest = _tower_digest(tower_cfg, tokenizer)
                    main_digest = bytes(
                        multihost_utils.broadcast_one_to_all(
                            np.frombuffer(digest, dtype=np.uint8)
                        )
                    )
                    if digest != main_digest:
                        raise RuntimeError(
                            "Resume mismatch: this process's tokenizer/tower "
                            "config differs from the checkpoint's on process 0 "
                            "(config or vocab changed between runs). Restart "
                            "without --resume or restore matching inputs."
                        )
                    start_epoch = last_epoch + 1
                    logger.info("Resuming from epoch %d (broadcast from process 0)", start_epoch)
            else:
                ckpt = self._find_resume_checkpoint()
                if ckpt is not None:
                    params, tower_cfg, tokenizer = load_tower(ckpt)
                    opt_state = serialization.from_bytes(
                        jax.tree.map(np.asarray, opt_state), (ckpt / "opt_state.msgpack").read_bytes()
                    )
                    state = json.loads((ckpt / "train_state.json").read_text())
                    start_epoch = state["epoch"] + 1
                    history = state.get("history", [])
                    if state.get("rng_impl") in _RNG_IMPLS:
                        resume_rng_impl = state["rng_impl"]
                    logger.info("Resuming from %s (epoch %d)", ckpt.name, start_epoch)

        logger.info(
            "[4/5] training: %d epochs x %d steps, global batch %d (dp=%d), seq %d",
            cfg.epochs,
            n_steps_epoch,
            global_batch,
            self.dp,
            self.seq_len,
        )

        # Dropout key stream. "rbg" (XLA RngBitGenerator -> the TPU hardware
        # PRNG) generates the 24 per-step [B, S, H] mask tensors in ~4.4 ms
        # vs ~14.6 ms for the default threefry at B=512 (measured v5e,
        # chained+readback) — threefry's counter math was 9% of the whole
        # train step. Both the fused-kernel and unfused paths draw from this
        # same stream, so the fused/unfused trajectory-equality contract is
        # unaffected; only the bit pattern vs earlier threefry runs changes
        # (within the measured seed-variance band, docs/VALIDATION.md).
        # ITOR_DROPOUT_RNG=threefry restores the old stream exactly.
        #
        # Reproducibility caveat: rbg rides XLA's RngBitGenerator, whose bit
        # output is NOT guaranteed stable across JAX/XLA versions or
        # backends; threefry IS. Seed-pinned validation runs that must
        # reproduce bit-identically across toolchain upgrades should set
        # ITOR_DROPOUT_RNG=threefry (see the knob table in ARCHITECTURE.md).
        env_rng = os.getenv("ITOR_DROPOUT_RNG")
        rng_impl = (env_rng or "rbg").strip().lower() or "rbg"
        if rng_impl not in _RNG_IMPLS:
            raise ValueError(
                f"ITOR_DROPOUT_RNG={rng_impl!r}: expected one of {_RNG_IMPLS}"
            )
        # A resumed run must stay on the checkpoint's recorded key stream —
        # silently switching mid-run would change the dropout trajectory.
        # An explicit env override wins (with a loud warning); otherwise the
        # checkpoint's stream is adopted.
        if resume_rng_impl is not None and resume_rng_impl != rng_impl:
            if env_rng is not None:
                logger.warning(
                    "Resuming with ITOR_DROPOUT_RNG=%s but the checkpoint "
                    "recorded rng_impl=%s — the dropout stream changes at "
                    "the resume boundary.", rng_impl, resume_rng_impl,
                )
            else:
                logger.info(
                    "Resume: adopting the checkpoint's rng_impl=%s "
                    "(current default is %s)", resume_rng_impl, rng_impl,
                )
                rng_impl = resume_rng_impl
        # JAX's registry name for threefry is "threefry2x32"; the knob and
        # train_state.json use the short name.
        base_key = jax.random.key(
            cfg.seed, impl={"threefry": "threefry2x32"}.get(rng_impl, rng_impl)
        )
        global_step = (start_epoch - 1) * n_steps_epoch

        col = np.arange(self.seq_len)[None, :]

        def assemble_np(idx: np.ndarray) -> list[np.ndarray]:
            # Vectorized: two fancy-indexes + two broadcast compares per
            # batch (the padded matrices were built once at tokenize time).
            out = []
            for ids_all, len_all in (
                (a_ids_all, a_len_all), (p_ids_all, p_len_all)
            ):
                out += [
                    ids_all[idx],
                    (col < len_all[idx][:, None]).astype(np.int32),
                ]
            return out

        def assemble(idx: np.ndarray):
            return tuple(jnp.asarray(x) for x in assemble_np(idx))

        def assemble_group(group: list[np.ndarray]):
            # ONE host-side stack + ONE transfer per tensor. The obvious
            # formulation — assemble each micro-batch to device, then
            # jnp.stack — costs 4*n_scan small device_put RPCs plus 4
            # device stacks per dispatch; through the RPC tunnel that
            # measured 554 ms/dispatch vs 3.3 ms for this form (170x) and
            # silently host-bounded reference-scale training (B=64,
            # 1.08M pairs: 3.2 steps/s with the chip mostly idle).
            parts = [assemble_np(idx) for idx in group]
            return tuple(
                jnp.asarray(np.stack([p[j] for p in parts])) for j in range(4)
            )

        profile_dir = os.getenv("ITOR_PROFILE_DIR")
        profiling = False
        # ITOR_LOOP_TIMING=1: log per-dispatch host-phase means every 25
        # dispatches (assemble/transfer, key fold, step submission, wall) —
        # the instrument that caught the r5 host-bound loop at reference
        # scale. Near-zero overhead when off.
        loop_timing = (os.getenv("ITOR_LOOP_TIMING", "") or "").strip() in ("1", "true")
        lt_acc = [0.0, 0.0, 0.0, 0.0, 0]
        lt_last = [0.0]

        import itertools

        n_scan = cfg.steps_per_dispatch

        for epoch in range(start_epoch, cfg.epochs + 1):
            epoch_start = time.time()
            losses = []
            batch_iter = no_duplicates_batches(
                anchors, positives, global_batch, cfg.seed, epoch
            )
            step = 0
            while True:
                group = list(itertools.islice(batch_iter, n_scan))
                if len(group) < n_scan:
                    break  # drop ragged trailing group (drop_last semantics)
                # Device-trace the first few steps when ITOR_PROFILE_DIR is set.
                if profile_dir and epoch == start_epoch:
                    if step == 1:
                        jax.profiler.start_trace(profile_dir)
                        profiling = True
                    elif step >= 6 and profiling:
                        jax.block_until_ready(params)
                        jax.profiler.stop_trace()
                        profiling = False
                t_a = time.perf_counter() if loop_timing else 0.0
                if n_scan == 1:
                    batch = assemble(group[0])
                else:
                    batch = assemble_group(group)
                t_b = time.perf_counter() if loop_timing else 0.0
                step_key = jax.random.fold_in(base_key, global_step)
                t_c = time.perf_counter() if loop_timing else 0.0
                params, opt_state, loss = train_step(params, opt_state, batch, step_key)
                global_step += n_scan
                if loop_timing:
                    t_d = time.perf_counter()
                    lt_acc[0] += t_b - t_a  # assemble + transfers
                    lt_acc[1] += t_c - t_b  # fold_in
                    lt_acc[2] += t_d - t_c  # train_step submission
                    lt_acc[3] += t_d - lt_last[0] if lt_last[0] else 0.0
                    lt_last[0] = t_d
                    lt_acc[4] += 1
                    if lt_acc[4] >= 25:
                        logger.info(
                            "  loop timing/dispatch: assemble %.0f ms, fold_in"
                            " %.0f ms, submit %.0f ms, wall %.0f ms",
                            *(1e3 * lt_acc[j] / lt_acc[4] for j in range(4)),
                        )
                        lt_acc[:] = [0.0, 0.0, 0.0, 0.0, 0]
                # Keep every step's loss ON DEVICE (scalars); the epoch mean
                # below is one stacked reduction + one transfer. Pulling each
                # loss to host would add a round trip per step, and sampling
                # only logging steps would report a sparse, early-biased mean.
                losses.append(loss)
                if step % max(1, cfg.logging_steps // n_scan) == 0:
                    lr = float(schedule(min(global_step // accum, total_steps - 1)))
                    logger.info(
                        "  epoch %d step %d loss %.4f lr %.2e",
                        epoch,
                        step * n_scan,
                        float(loss),
                        lr,
                    )
                step += 1

            if profiling:  # epoch ended before the stop-step was reached
                jax.block_until_ready(params)
                jax.profiler.stop_trace()
                profiling = False

            if step == 0:
                logger.warning(
                    "epoch %d yielded NO full batches: %d pairs cannot fill a "
                    "no-duplicates batch of %d (too few distinct anchors/"
                    "positives). Lower train_batch_size or add data — the "
                    "model is NOT training.",
                    epoch,
                    len(anchors),
                    global_batch,
                )

            entry = {
                "epoch": epoch,
                "train_loss": float(jnp.mean(jnp.stack(losses))) if losses else None,
                "epoch_seconds": time.time() - epoch_start,
            }
            eval_loss = self._eval_loss(params, tower_cfg, tokenizer, global_batch)
            if eval_loss is not None:
                entry["eval_loss"] = eval_loss
                logger.info("  epoch %d eval_loss %.4f", epoch, eval_loss)
            if evaluator is not None:
                metrics = evaluator(encoder.with_params(params))
                entry.update(metrics)
                logger.info(
                    "  epoch %d eval: ndcg@10 %.4f recall@10 %.4f mrr@10 %.4f acc@10 %.4f",
                    epoch,
                    metrics["ndcg_at_10"],
                    metrics["recall_at_10"],
                    metrics["mrr_at_10"],
                    metrics["accuracy_at_10"],
                )
            history.append(entry)
            if is_main:
                self._save_epoch_checkpoint(
                    epoch, params, opt_state, tower_cfg, tokenizer, history,
                    rng_impl=rng_impl,
                )
                (cfg.output_dir / "eval_history.json").write_text(json.dumps(history, indent=2))

        # Best-checkpoint selection by NDCG@10 (reference :219-220, :238-239).
        best_epoch = cfg.epochs
        if evaluator is not None and history:
            scored = [h for h in history if BEST_METRIC in h]
            if scored:
                best_epoch = max(scored, key=lambda h: h[BEST_METRIC])["epoch"]
        final_dir = cfg.output_dir / FINAL_SUBDIR
        if is_main:
            best_ckpt = self.cfg.output_dir / f"checkpoint-epoch{best_epoch}"
            if best_ckpt.exists():
                params, tower_cfg, tokenizer = load_tower(best_ckpt)
                logger.info("Loaded best checkpoint (epoch %d by %s)", best_epoch, BEST_METRIC)
            save_tower(final_dir, params, tower_cfg, tokenizer)
            best_entry = next((h for h in history if h["epoch"] == best_epoch), None)
            (cfg.output_dir / "best.json").write_text(
                json.dumps(
                    {"best_epoch": best_epoch, "metric": BEST_METRIC, "entry": best_entry},
                    indent=2,
                )
            )
            logger.info("[5/5] Done. Model saved to %s", final_dir)
        return {"history": history, "best_epoch": best_epoch, "final_dir": str(final_dir)}

    def _eval_loss(
        self, params, tower_cfg, tokenizer, batch_size: int, max_batches: int = 8
    ) -> float | None:
        """Deterministic MNRL loss on the held-out pair split (reference
        evaluates loss on eval_dataset via its HF trainer)."""
        if self.eval_pairs is None:
            return None
        anchors, positives = self.eval_pairs
        if len(anchors) < batch_size:
            return None
        if not hasattr(self, "_eval_loss_fn"):
            cfg_scale = self.cfg.loss_scale

            @jax.jit
            def loss_fn(p, a_ids, a_mask, p_ids, p_mask):
                qa = encode(p, a_ids, a_mask, tower_cfg)
                qp = encode(p, p_ids, p_mask, tower_cfg)
                return mnrl_loss(qa, qp, scale=cfg_scale)

            self._eval_loss_fn = loss_fn
        if not hasattr(self, "_eval_loss_batches"):
            batches = []
            for bi, idx in enumerate(
                no_duplicates_batches(anchors, positives, batch_size, seed=0)
            ):
                if bi >= max_batches:
                    break
                a_ids, a_mask = tokenizer.encode_batch(
                    [anchors[i] for i in idx],
                    max_seq_length=self.cfg.max_seq_length,
                    pad_to=self.seq_len,
                )
                p_ids, p_mask = tokenizer.encode_batch(
                    [positives[i] for i in idx],
                    max_seq_length=self.cfg.max_seq_length,
                    pad_to=self.seq_len,
                )
                batches.append((a_ids, a_mask, p_ids, p_mask))
            self._eval_loss_batches = batches
        losses = [
            float(self._eval_loss_fn(params, *(jnp.asarray(x) for x in b)))
            for b in self._eval_loss_batches
        ]
        return float(np.mean(losses)) if losses else None

    def _log_params(self):
        params_path = getattr(self, "processed_dir", self.cfg.processed_dir) / DATA_PREP_PARAMS_FILENAME
        if params_path.exists():
            logger.info("data prep params: %s", params_path.read_text())


def main() -> None:
    parser = argparse.ArgumentParser(description="Train the two-tower model")
    parser.add_argument("--config", type=Path, default=None, help="Path to YAML config")
    args = parser.parse_args()
    from instacart_next_order_recommendation_tpu.utils.dotenv import load_dotenv

    load_dotenv()
    setup_colored_logging(quiet_loggers=["jax", "datasets", "urllib3"])
    trainer = TwoTowerTrainer(TrainConfig.load(args.config))
    trainer.train()


if __name__ == "__main__":
    main()

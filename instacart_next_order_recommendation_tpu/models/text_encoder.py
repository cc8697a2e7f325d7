"""TextEncoder: batched text -> unit-norm embeddings with static shapes.

The TPU-native analog of ``SentenceTransformer.encode(...,
normalize_embeddings=True)`` used throughout the reference
(/root/reference/src/inference/serve_recommendations.py:195-213,
src/baselines/content_based.py:30-36). Batches are padded to length buckets
and a fixed batch size so each (seq_len, batch) shape compiles exactly once.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from instacart_next_order_recommendation_tpu.models.encoder import (
    Params,
    TowerConfig,
    encode,
)
from instacart_next_order_recommendation_tpu.tokenizer import WordPieceTokenizer


def encode_from_ids(params, ids, *, config: TowerConfig, pad_id: int):
    """Tower forward from token ids alone (mask derived from pad positions).

    The tokenizer never emits ``pad_id`` for real tokens, so
    ``ids != pad_id`` IS the attention mask — computing it on device keeps
    the mask off the host->device wire.
    """
    mask = (ids != pad_id).astype(jnp.int32)
    return encode(params, ids.astype(jnp.int32), mask, config)


# Bounded: production sees 1-2 architectures, but config-sweeping tests and
# notebooks would otherwise grow an unbounded global cache of traced
# programs. Eviction is safe — live TextEncoder instances hold their own
# reference via self._jitted.
@functools.lru_cache(maxsize=32)
def _encode_jit(config, pad_id: int):
    """One jitted encode program per (tower architecture, pad id)."""
    return jax.jit(partial(encode_from_ids, config=config, pad_id=pad_id))


class TextEncoder:
    """Callable tower over text: tokenization + jitted forward + normalization."""

    def __init__(
        self,
        params: Params,
        config: TowerConfig,
        tokenizer: WordPieceTokenizer,
        max_seq_length: int | None = None,
        mesh=None,
    ):
        """``mesh`` (optional): shard encode batches over its ``data`` axis —
        data-parallel corpus/query encoding for multi-device training eval."""
        from instacart_next_order_recommendation_tpu.utils.cache import (
            enable_compilation_cache,
        )

        enable_compilation_cache()
        self.params = params
        self.config = config
        self.tokenizer = tokenizer
        self.max_seq_length = max_seq_length or config.max_seq_length
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None and mesh.shape.get("data", 1) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._batch_sharding = NamedSharding(mesh, P("data"))
        # The wire carries ONLY token ids (int16 when the vocab fits): the
        # attention mask is fully determined by pad positions, so it is
        # recomputed on device instead of transferred. Host->device bandwidth
        # is the scarce resource on tunneled TPU setups — this halves (or
        # quarters, with int16) the per-batch upload.
        self.wire_dtype = np.int16 if tokenizer.vocab_size <= np.iinfo(np.int16).max else np.int32
        # Process-global jit keyed by (config, pad_id): params are ordinary
        # call arguments, so every TextEncoder instance over the same tower
        # architecture shares one traced program and its loaded executables —
        # /admin/model hot swaps and repeated loads skip the re-trace.
        self._jitted = _encode_jit(self.config, tokenizer.pad_id)
        self._aot = None
        if self._batch_sharding is None:
            from instacart_next_order_recommendation_tpu.serve.aot import AotStore

            self._aot = AotStore.from_env()

    def _run_encode(self, ids_d):
        if self._aot is None:
            return self._jitted(self.params, ids_d)
        # Pin everything that changes the program or its arg shapes (same
        # contract as the fused-pipeline key, serve/pipeline.py): vocab sizes
        # the embedding table; heads/intermediate/dtype change the graph even
        # at identical param shapes; pad_id is baked into the mask compute.
        c = self.config
        key = (
            f"encode_{c.num_layers}x{c.hidden_size}h{c.num_heads}"
            f"i{c.intermediate_size}v{c.vocab_size}_p{self.tokenizer.pad_id}"
            f"_{c.compute_dtype}_{np.dtype(self.wire_dtype).name}"
            f"_b{ids_d.shape[0]}_s{ids_d.shape[1]}"
        )
        return self._aot.run(key, self._jitted, (self.params, ids_d))

    @classmethod
    def load(cls, model_dir: Path | str, max_seq_length: int | None = None) -> "TextEncoder":
        from instacart_next_order_recommendation_tpu.models.checkpoint import load_tower

        params, config, tokenizer = load_tower(model_dir)
        if tokenizer is None:
            raise FileNotFoundError(f"No vocab.txt in {model_dir}")
        return cls(params, config, tokenizer, max_seq_length)

    def encode_device(
        self,
        texts: Sequence[str],
        pad_batch_to: int | None = None,
        keep_padding: bool = False,
    ) -> jax.Array:
        """Encode one batch, returning the device array WITHOUT host sync.

        Dispatch is async: callers can pipeline tokenization/upload of the
        next batch against device compute and defer the host transfer (each
        host<->device round trip costs real latency on tunneled setups).

        ``keep_padding=True`` returns all ``pad_batch_to`` rows (pad rows are
        garbage at the tail) so a downstream consumer keeps the bucketed
        batch shape — slicing to ``len(texts)`` would hand it a raw-sized
        array that compiles a fresh program per distinct size.
        """
        if self._batch_sharding is not None:
            dp = self._batch_sharding.mesh.shape["data"]
            rows = pad_batch_to or len(texts)
            pad_batch_to = -(-rows // dp) * dp
        ids, _ = self.tokenizer.encode_batch(
            texts, max_seq_length=self.max_seq_length, pad_batch_to=pad_batch_to
        )
        ids_d = jnp.asarray(ids.astype(self.wire_dtype))
        if self._batch_sharding is not None:
            ids_d = jax.device_put(ids_d, self._batch_sharding)
        emb = self._run_encode(ids_d)
        if keep_padding or emb.shape[0] == len(texts):
            # Skip the no-op slice: it is its own (tiny) compiled program,
            # and zero-compile AOT serving means the first request must not
            # invoke the compiler at all.
            return emb
        return emb[: len(texts)]

    def encode(
        self,
        texts: Sequence[str],
        batch_size: int = 64,
        show_progress: bool = False,
        num_threads: int = 4,
        sort_by_length: bool = True,
    ) -> np.ndarray:
        """Encode texts to a [len(texts), hidden] float32 unit-norm matrix.

        Batches are dispatched asynchronously and synced at the end; for large
        inputs a small thread pool overlaps tokenization and per-batch
        host<->device transfer latency (significant on tunneled TPU setups).

        ``sort_by_length`` groups similar-length texts into the same batch so
        each batch pads to the smallest length bucket that fits it — one long
        text no longer forces a whole batch to seq 256. Output order is
        unchanged (results are permuted back); per-text embeddings are
        batchmate-independent (padding is masked in attention and pooling).
        """
        if sort_by_length and len(texts) > batch_size:
            order = np.argsort([len(t) for t in texts], kind="stable")
            sorted_out = self.encode(
                [texts[i] for i in order],
                batch_size=batch_size,
                show_progress=show_progress,
                num_threads=num_threads,
                sort_by_length=False,
            )
            out = np.empty_like(sorted_out)
            out[order] = sorted_out
            return out
        n_batches = (len(texts) + batch_size - 1) // batch_size
        out = np.empty((len(texts), self.config.hidden_size), dtype=np.float32)

        def run(bi: int) -> tuple[int, np.ndarray]:
            lo, hi = bi * batch_size, min((bi + 1) * batch_size, len(texts))
            emb = self.encode_device(texts[lo:hi], pad_batch_to=batch_size)
            return lo, np.asarray(emb, dtype=np.float32)

        if num_threads > 1 and n_batches > 2:
            # Warm the jit cache single-threaded first (avoids duplicate
            # concurrent compiles of the same shape).
            lo, arr = run(0)
            out[lo : lo + len(arr)] = arr
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(num_threads) as ex:
                for lo, arr in ex.map(run, range(1, n_batches)):
                    out[lo : lo + len(arr)] = arr
                    if show_progress:
                        print(f"\r  encode {lo + len(arr)}/{len(texts)}", end="", flush=True)
        else:
            for bi in range(n_batches):
                lo, arr = run(bi)
                out[lo : lo + len(arr)] = arr
                if show_progress and (bi % 50 == 0 or bi == n_batches - 1):
                    print(f"\r  encode {lo + len(arr)}/{len(texts)}", end="", flush=True)
        if show_progress:
            print()
        return out

    def encode_resident(
        self,
        texts: Sequence[str],
        batch_size: int = 1024,
        sort_by_length: bool = True,
        num_threads: int = 4,
    ) -> jax.Array:
        """Encode texts into a DEVICE-resident [n, hidden] matrix (input order).

        Catalog/index builds consume embeddings on device, so pulling them to
        host is pure waste — at 50k x 384 f32 that's ~73MB over the wire, the
        dominant cost of an index build on tunneled TPU setups. This path
        uploads only token ids, concatenates on device, and un-permutes the
        length-sort on device. Use ``np.asarray`` on the result only where a
        host copy is genuinely needed (disk cache).

        The per-chunk work (C++ tokenization, int16 id upload, dispatch) is
        PIPELINED over a small thread pool: the serial loop paid ~3 tunnel
        round trips per chunk back-to-back (r3 bench: catalog encode ran 6x
        below the chip's encoder throughput, 13.7k products/s e2e vs 83k
        device-side), while ``num_threads`` chunks in flight overlap
        tokenize/upload/dispatch latency. Dispatches are async either way —
        the final concatenate is the only sync point.
        """
        n = len(texts)
        if n == 0:
            return jnp.zeros((0, self.config.hidden_size), jnp.float32)
        if self._batch_sharding is not None:
            # Bucketed rows must divide the data axis (encode_device applies
            # the same rounding) or the device_put below rejects the shard.
            dp = self._batch_sharding.mesh.shape["data"]
            batch_size = -(-batch_size // dp) * dp
        if sort_by_length and n > batch_size:
            order = np.argsort([len(t) for t in texts], kind="stable")
        else:
            order = np.arange(n)

        def run(lo: int) -> jax.Array:
            batch = [texts[order[i]] for i in range(lo, min(lo + batch_size, n))]
            ids, _ = self.tokenizer.encode_batch(
                batch, max_seq_length=self.max_seq_length, pad_batch_to=batch_size
            )
            ids_d = jnp.asarray(ids.astype(self.wire_dtype))
            if self._batch_sharding is not None:
                ids_d = jax.device_put(ids_d, self._batch_sharding)
            return self._run_encode(ids_d)

        los = list(range(0, n, batch_size))
        # First chunk single-threaded: warms the jit cache so concurrent
        # chunks never compile the same program twice.
        chunks: list = [run(los[0])]
        if len(los) > 2 and num_threads > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(num_threads) as ex:
                chunks.extend(ex.map(run, los[1:]))  # map preserves order
        else:
            chunks.extend(run(lo) for lo in los[1:])
        emb = jnp.concatenate(chunks, axis=0)[:n] if len(chunks) > 1 else chunks[0][:n]
        if not np.array_equal(order, np.arange(n)):
            inv = np.empty(n, np.int32)
            inv[order] = np.arange(n, dtype=np.int32)
            emb = jnp.take(emb, jnp.asarray(inv), axis=0)
        return emb

    def with_params(self, params: Params) -> "TextEncoder":
        """Cheap view with updated params (training eval reuses the jit cache)."""
        new = TextEncoder.__new__(TextEncoder)
        new.__dict__.update(self.__dict__)
        new.params = params
        return new

"""Profile the serve hot path: where do the milliseconds go?

Measures, on the real chip:
  (a) pure device fused encode+topk throughput (resident ids, back-to-back)
  (b) host tokenization throughput
  (c) end-to-end pipelined throughput vs thread count / batch size

Not part of the test suite; a perf scratchpad (kept for reproducibility).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

# Allow running as `python scripts/<name>.py` from any cwd.
_repo_root = str(Path(__file__).resolve().parents[1])
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)
from bench import build_catalog_texts, build_query_texts, CATALOG_SIZE, TOP_K


def main() -> None:
    import dataclasses
    import jax
    import jax.numpy as jnp

    from instacart_next_order_recommendation_tpu.models import MINILM_L6, init_params
    from instacart_next_order_recommendation_tpu.models.text_encoder import TextEncoder
    from instacart_next_order_recommendation_tpu.index import ShardedCatalogIndex
    from instacart_next_order_recommendation_tpu.serve.pipeline import FusedServePipeline
    from instacart_next_order_recommendation_tpu.tokenizer import WordPieceTokenizer
    from instacart_next_order_recommendation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    catalog_texts = build_catalog_texts(CATALOG_SIZE, rng)
    query_texts = build_query_texts(8192, catalog_texts, rng)
    tokenizer = WordPieceTokenizer.train(catalog_texts, vocab_size=30_000)
    config = dataclasses.replace(MINILM_L6, vocab_size=tokenizer.vocab_size)
    params = init_params(config, jax.random.key(0))
    encoder = TextEncoder(params, config, tokenizer, max_seq_length=256)
    catalog_emb = encoder.encode_resident(catalog_texts, batch_size=1024)
    index = ShardedCatalogIndex(catalog_emb, mesh=None)
    fused = FusedServePipeline(params, config, index._catalog, CATALOG_SIZE, pad_id=tokenizer.pad_id)

    # token length distribution
    lens = [len(tokenizer.encode(t)) for t in query_texts[:512]]
    print(f"query token lens: p50={np.percentile(lens,50):.0f} p90={np.percentile(lens,90):.0f} max={max(lens)}")

    # (b) host tokenization throughput
    t0 = time.time()
    ids_all, _ = tokenizer.encode_batch(query_texts[:4096], max_seq_length=256)
    tok_s = time.time() - t0
    print(f"tokenize: {4096/tok_s:.0f} q/s single-thread (batch shape {ids_all.shape})")

    # (a) pure device throughput at several batch/seq shapes
    for B in (256, 512, 1024):
        for S in (64, 128):
            ids = np.asarray(ids_all[:B, :S])
            ids_d = jnp.asarray(ids.astype(fused.wire_dtype))
            fn = fused._fn(TOP_K)
            jax.block_until_ready(fn(params, ids_d, fused.catalog))
            n_it = 20
            t0 = time.time()
            outs = [fn(params, ids_d, fused.catalog) for _ in range(n_it)]
            jax.block_until_ready(outs)
            dt = time.time() - t0
            print(f"device fused B={B} S={S}: {B*n_it/dt:.0f} q/s ({dt/n_it*1000:.2f} ms/batch)")

    # (c) end-to-end pipelined: vary threads and batch
    from concurrent.futures import ThreadPoolExecutor

    sorted_queries = sorted(query_texts, key=len)

    for B in (256, 512):
        def serve_batch(lo: int, B=B) -> int:
            batch = sorted_queries[lo : lo + B]
            ids, mask = tokenizer.encode_batch(batch, max_seq_length=256, pad_batch_to=B)
            packed, k = fused.topk_device(ids, mask, TOP_K)
            np.asarray(packed)
            return len(batch)

        for lo in range(0, len(sorted_queries), B):
            serve_batch(lo)  # warm
        for nt in (2, 4, 8):
            with ThreadPoolExecutor(nt) as ex:
                t0 = time.time()
                n = sum(ex.map(serve_batch, range(0, len(sorted_queries), B)))
                dt = time.time() - t0
            print(f"e2e B={B} threads={nt}: {n/dt:.0f} q/s")


if __name__ == "__main__":
    main()

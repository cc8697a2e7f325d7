"""Encoder + train-step MFU measurements behind docs/PERFORMANCE.md.

Measures, on the real chip, the fused encode at the serve seq buckets, the
XLA pure-GEMM chain at identical dims (the MXU roofline for this tower),
and the unfused XLA tower — with tunnel-proof timing: R data-dependent
dispatches queued back-to-back, one readback, minus the measured
dispatch+readback RTT floor (naive `block_until_ready` timing reads ~0
through remote-execution tunnels).

``--train`` instead measures the full TRAIN step (two-tower fwd + MNRL +
bwd + AdamW — the hot loop the reference delegates to HF Trainer,
/root/reference/src/training/train_sbert.py:128-137) at the given batch
sizes, both with the fused-layer forward (bwd = XLA recompute through the
jnp reference path) and with the fused layer disabled (pure XLA fwd+bwd) —
the measured accept/reject for a hand-written fused backward. Train steps
chain naturally (each step consumes the previous step's params), so no
artificial data dependency is needed.

Run: python scripts/bench_mfu.py [batch] [--seq N]
     python scripts/bench_mfu.py --train [batch ...] [--seq N]

``--seq`` pins the sequence length (default 128). The reference's training
recipe is seq 256 (/root/reference/configs/train.yaml:12), so the train
table must include S=256 rows — at that shape the fully-fused backward's
VMEM gate is the binding constraint (see bwd_supports / PERFORMANCE.md).
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

_repo_root = str(Path(__file__).resolve().parents[1])
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)

V5E_BF16_PEAK_TFLOPS = 197.0


def _parse_seq(default: int = 128) -> int:
    """Consume ``--seq N`` from argv (before the positional batch scan)."""
    if "--seq" in sys.argv:
        i = sys.argv.index("--seq")
        val = int(sys.argv[i + 1])
        del sys.argv[i : i + 2]
        return val
    return default


def main() -> None:
    import jax
    import jax.numpy as jnp

    from instacart_next_order_recommendation_tpu.models import MINILM_L6, init_params
    from instacart_next_order_recommendation_tpu.models.encoder import encode
    from instacart_next_order_recommendation_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    seq_arg = _parse_seq()
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    R = 32
    cfg = dataclasses.replace(MINILM_L6, vocab_size=12000)
    params = init_params(cfg, jax.random.key(0))
    h, inter, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    rng = np.random.default_rng(0)

    f_nop = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros(())
    float(f_nop(x0))
    rtts = []
    for _ in range(15):
        t0 = time.perf_counter()
        float(f_nop(x0))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"dispatch+readback RTT floor: {rtt*1e3:.2f} ms")

    def bench(label, step, flops, reps=3):
        c = step(jnp.zeros((), jnp.float32))
        float(np.asarray(c))  # compile + warm
        ts = []
        for _ in range(reps):
            c = jnp.zeros((), jnp.float32)
            t0 = time.perf_counter()
            for _ in range(R):
                c = step(c)
            float(np.asarray(c))
            ts.append(time.perf_counter() - t0)
        per = (float(np.median(ts)) - rtt) / R
        tf = flops / per / 1e12
        print(
            f"{label}: {per*1e3:6.2f} ms -> {tf:6.1f} TFLOP/s "
            f"({100*tf/V5E_BF16_PEAK_TFLOPS:4.1f}% of v5e bf16 peak), {B/per:7.0f} ex/s"
        )

    # Fused encode at the serve seq buckets (+ the requested --seq).
    for S in sorted({32, 64, 128, seq_arg}):
        ids = jnp.asarray(rng.integers(4, 11000, size=(B, S)), jnp.int32)
        mask = jnp.ones((B, S), jnp.int32)
        flops = L * (2 * B * S * (4 * h * h + 2 * h * inter) + 4 * B * S * S * h)
        enc_jit = jax.jit(lambda p, i, m: encode(p, i, m, cfg))

        def step(c, _enc=enc_jit, _ids=ids, _mask=mask):
            e = _enc(params, _ids + (c.astype(jnp.int32) % 2), _mask)
            return e[0, 0].astype(jnp.float32) * 1e-6

        bench(f"fused encode S={S:<4}", step, flops)

    # XLA pure-GEMM chain at the tower's dims: the realistic MXU ceiling.
    S = 128
    xx = jnp.asarray(rng.standard_normal((B * S, h)), jnp.bfloat16)
    Ws = tuple(
        jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
        for s in ((L, h, 3 * h), (L, 3 * h, h), (L, h, inter), (L, inter, h))
    )

    @jax.jit
    def gemm_chain(x, Ws, c):
        x = x + c.astype(jnp.bfloat16)

        def body(c2, w):
            y = c2
            for wi in w:
                y = jax.lax.dot_general(
                    y, wi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
            return y, None

        y, _ = jax.lax.scan(body, x, Ws)
        return y

    def step2(c):
        y = gemm_chain(xx, Ws, c)
        return y[0, 0].astype(jnp.float32) * 1e-6

    gemm_flops = L * 2 * B * S * (3 * h * h + 3 * h * h + 2 * h * inter)
    bench("XLA GEMM chain S=128", step2, gemm_flops)

    # Unfused XLA tower (fused-layer kernel disabled).
    import os

    os.environ["ITOR_DISABLE_FUSED_LAYER"] = "1"
    ids = jnp.asarray(rng.integers(4, 11000, size=(B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    flops = L * (2 * B * S * (4 * h * h + 2 * h * inter) + 4 * B * S * S * h)
    enc_unfused = jax.jit(lambda p, i, m: encode(p, i, m, cfg))

    def step3(c):
        e = enc_unfused(params, ids + (c.astype(jnp.int32) % 2), mask)
        return e[0, 0].astype(jnp.float32) * 1e-6

    bench("unfused XLA  S=128  ", step3, flops)
    os.environ.pop("ITOR_DISABLE_FUSED_LAYER", None)


def train_main() -> None:
    import os

    import jax
    import jax.numpy as jnp
    import optax

    from instacart_next_order_recommendation_tpu.models import MINILM_L6, init_params
    from instacart_next_order_recommendation_tpu.models.encoder import encode
    from instacart_next_order_recommendation_tpu.ops import mnrl_loss
    from instacart_next_order_recommendation_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    S = _parse_seq()
    batches = [int(a) for a in sys.argv[2:] if a.isdigit()] or [64, 512]
    R = 16
    # --mpnet: measure the mpnet-base-class tower (H=768, 12 layers) — its
    # weights exceed the fused backward's VMEM model (bwd_supports), so this
    # is the measured cost of the recompute-vjp fallback on large towers.
    if "--mpnet" in sys.argv:
        from instacart_next_order_recommendation_tpu.models import MPNET_BASE_CLASS

        cfg = dataclasses.replace(MPNET_BASE_CLASS, vocab_size=12000)
        print("model: mpnet-base-class (H=768, 12 layers)")
    else:
        cfg = dataclasses.replace(MINILM_L6, vocab_size=12000)
    if ("--remat" in sys.argv) or ("--mpnet" in sys.argv and max(batches) >= 256):
        # Mirror the trainer (TwoTowerTrainer._resolve_remat): auto-remat at
        # batch >= 256 applies to towers the fused backward can't take —
        # mpnet at B>=512 exhausts HBM without it. MiniLM-class towers get
        # remat auto-off since r5 (the fused backward's custom_vjp stores
        # only layer inputs), matching this bench's no-remat default rows;
        # opt in with --remat.
        cfg = dataclasses.replace(cfg, remat=True)
        print("layer remat: on (trainer default at B>=256)")
    h, inter, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    rng = np.random.default_rng(0)

    f_nop = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros(())
    float(f_nop(x0))
    rtts = []
    for _ in range(15):
        t0 = time.perf_counter()
        float(f_nop(x0))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"dispatch+readback RTT floor: {rtt*1e3:.2f} ms")

    tx = optax.adamw(2e-4, weight_decay=0.01)

    def build_step(config):
        # dropout_key selects the differentiable fused-layer path
        # (fused_encoder_layer_train's custom_vjp recompute backward) —
        # exactly the trainer's loss (train/trainer.py loss_fn).
        def loss_fn(params, a_ids, p_ids, mask, key):
            ka, kp = jax.random.split(key)
            a = encode(params, a_ids, mask, config, dropout_key=ka)
            p = encode(params, p_ids, mask, config, dropout_key=kp)
            return mnrl_loss(a, p, scale=30.0)

        @jax.jit
        def step(params, opt_state, a_ids, p_ids, mask, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, a_ids, p_ids, mask, key)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    for disable_fused in (False, True):
        if disable_fused:
            os.environ["ITOR_DISABLE_FUSED_LAYER"] = "1"
        # The fused path honors ITOR_FUSED_BWD / ITOR_FUSED_BWD_WGRAD: by
        # default both are on, i.e. the fully-fused Pallas bwd with in-kernel
        # weight-grad accumulation — on multi-device meshes it runs
        # shard-local with one psum per weight-grad partial (r4).
        # Labels reuse the kernel's own knob parser AND its VMEM gate
        # (fused_layer._env_on / bwd_supports) so the row names the form
        # that actually dispatches — e.g. ITOR_FUSED_BWD=FALSE is labeled
        # recompute, and mpnet-base (whose weights exceed the bwd kernel's
        # VMEM model) is labeled recompute even with the knobs default-on.
        from instacart_next_order_recommendation_tpu.ops.fused_layer import (
            _env_on,
            bwd_supports,
        )

        fits_wgrads = bwd_supports(h, inter, S, 2, wgrads=True)

        def form_label(B: int) -> str:
            # The split gate is batch-dependent ([B, H] LN partials), so
            # the dispatched form — and therefore the label — is per-row.
            fits_split = bwd_supports(h, inter, S, 2, wgrads=False, batch=B)
            if disable_fused:
                return "unfused XLA fwd+bwd"
            if not _env_on("ITOR_FUSED_BWD") or not (fits_wgrads or fits_split):
                label = "fused fwd + recompute bwd"
                if _env_on("ITOR_FUSED_BWD"):
                    label += " (VMEM gate)"
                return label
            if not (_env_on("ITOR_FUSED_BWD_WGRAD") and fits_wgrads):
                return "fused fwd + split fused bwd"
            if jax.device_count() > 1:
                # Since r4 the fully-fused form partitions along batch on
                # multi-device meshes too (per-shard wgrad partials + psum).
                return "fused fwd + fully-fused bwd (multi-dev)"
            return "fused fwd + fully-fused bwd"

        for B in batches:
            label_k = form_label(B)
            params = init_params(cfg, jax.random.key(0))
            opt_state = jax.jit(tx.init)(params)
            a_ids = jnp.asarray(rng.integers(4, 11000, size=(B, S)), jnp.int32)
            p_ids = jnp.asarray(rng.integers(4, 11000, size=(B, S)), jnp.int32)
            mask = jnp.ones((B, S), jnp.int32)
            # Same dropout-stream impl as the trainer (rbg by default).
            key = jax.random.key(
                7, impl=os.getenv("ITOR_DROPOUT_RNG", "rbg").strip() or "rbg"
            )
            step = build_step(cfg)
            t0 = time.perf_counter()
            try:
                params, opt_state, loss = step(params, opt_state, a_ids, p_ids, mask, key)
                float(loss)  # compile + warm
            except Exception as exc:  # noqa: BLE001 - e.g. HBM OOM at B=512 unfused
                print(f"{label_k:<28} B={B:<4} S={S}: FAILED ({type(exc).__name__}: "
                      f"{str(exc).splitlines()[0][:120]})")
                continue
            print(f"  [{label_k} B={B}] compile+first step {time.perf_counter()-t0:.1f}s")
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(R):
                    params, opt_state, loss = step(params, opt_state, a_ids, p_ids, mask, key)
                float(loss)  # one readback fences the chain
                ts.append(time.perf_counter() - t0)
            per = (float(np.median(ts)) - rtt) / R
            # FLOPs: 2 tower forwards; bwd ~= 2x fwd (3x total, standard
            # fwd:bwd accounting); AdamW/loss negligible at these dims.
            fwd = L * (2 * B * S * (4 * h * h + 2 * h * inter) + 4 * B * S * S * h)
            flops = 2 * 3 * fwd
            tf = flops / per / 1e12
            print(
                f"{label_k:<28} B={B:<4} S={S}: {per*1e3:7.2f} ms/step -> "
                f"{tf:6.1f} TFLOP/s ({100*tf/V5E_BF16_PEAK_TFLOPS:4.1f}% of "
                f"v5e bf16 peak), {B/per:7.0f} pairs/s"
            )
    os.environ.pop("ITOR_DISABLE_FUSED_LAYER", None)


if __name__ == "__main__":
    if "--train" in sys.argv:
        train_main()
    else:
        main()

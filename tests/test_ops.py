"""Pallas kernel parity tests (interpret mode on CPU) against jnp oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instacart_next_order_recommendation_tpu.ops.attention import (
    _attention_pallas,
    multi_head_attention_reference,
)
from instacart_next_order_recommendation_tpu.ops.mnrl import mnrl_loss
from instacart_next_order_recommendation_tpu.ops.pool_norm import (
    masked_mean_pool_l2norm_pallas,
    masked_mean_pool_l2norm_reference,
)
from instacart_next_order_recommendation_tpu.ops.topk import (
    cosine_topk_pallas,
    cosine_topk_reference,
)


def _random_qkv(rng, b=2, h=4, s=32, d=16):
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    lengths = rng.integers(1, s + 1, size=b)
    mask = jnp.asarray((np.arange(s)[None, :] < lengths[:, None]).astype(np.int32))
    return q, k, v, mask


class TestAttention:
    def test_pallas_matches_reference(self, rng):
        q, k, v, mask = _random_qkv(rng)
        ref = multi_head_attention_reference(q, k, v, mask, scale=0.25)
        out = _attention_pallas(q, k, v, mask, 0.25, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_padding_does_not_leak(self, rng):
        # Changing values at masked key positions must not change outputs.
        q, k, v, mask = _random_qkv(rng, b=1, s=16)
        ref = multi_head_attention_reference(q, k, v, mask, scale=0.25)
        k2 = k.at[:, :, -1, :].set(999.0) if int(mask[0, -1]) == 0 else k
        v2 = v.at[:, :, -1, :].set(999.0) if int(mask[0, -1]) == 0 else v
        out = multi_head_attention_reference(q, k2, v2, mask, scale=0.25)
        n = int(mask.sum())
        np.testing.assert_allclose(
            np.asarray(out[:, :, :n]), np.asarray(ref[:, :, :n]), atol=1e-5
        )

    def test_gradients_flow(self, rng):
        q, k, v, mask = _random_qkv(rng, b=1, h=2, s=8, d=4)

        def loss(q_, k_, v_):
            return jnp.sum(_attention_pallas(q_, k_, v_, mask, 0.5, True) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        ref_grads = jax.grad(
            lambda q_, k_, v_: jnp.sum(
                multi_head_attention_reference(q_, k_, v_, mask, 0.5) ** 2
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
        for g, rg in zip(grads, ref_grads):
            np.testing.assert_allclose(np.asarray(g), np.asarray(rg), atol=1e-4)


class TestPoolNorm:
    def test_pallas_matches_reference(self, rng):
        hidden = jnp.asarray(rng.standard_normal((8, 24, 32)), jnp.float32)
        lengths = rng.integers(1, 25, size=8)
        mask = jnp.asarray((np.arange(24)[None, :] < lengths[:, None]).astype(np.int32))
        ref = masked_mean_pool_l2norm_reference(hidden, mask)
        out = masked_mean_pool_l2norm_pallas(hidden, mask, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_unit_norm_and_mask_semantics(self, rng):
        hidden = jnp.asarray(rng.standard_normal((2, 6, 16)), jnp.float32)
        mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], jnp.int32)
        out = masked_mean_pool_l2norm_reference(hidden, mask)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-6)
        # masked positions don't contribute
        hidden2 = hidden.at[0, 3:].set(123.0)
        out2 = masked_mean_pool_l2norm_reference(hidden2, mask)
        np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(out[0]), atol=1e-6)


class TestCosineTopK:
    @pytest.mark.parametrize("n,k,block_n", [(500, 10, 128), (130, 32, 128)])
    def test_pallas_matches_reference(self, rng, n, k, block_n):
        d = 64
        q = rng.standard_normal((4, d)).astype(np.float32)
        c = rng.standard_normal((n, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        ref_s, ref_i = cosine_topk_reference(jnp.asarray(q), jnp.asarray(c), k)
        out_s, out_i = cosine_topk_pallas(
            jnp.asarray(q), jnp.asarray(c), k, block_n=block_n, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref_s), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out_i), np.asarray(ref_i))

    def test_matches_full_argsort_semantics(self, rng):
        # Exactness vs the reference's "full argsort then take top-k".
        q = rng.standard_normal((2, 16)).astype(np.float32)
        c = rng.standard_normal((300, 16)).astype(np.float32)
        scores = q @ c.T
        expect = np.argsort(-scores, axis=1, kind="stable")[:, :7]
        _, out_i = cosine_topk_pallas(jnp.asarray(q), jnp.asarray(c), 7, block_n=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(out_i), expect)

    def test_tie_break_lowest_index(self):
        q = jnp.ones((1, 4), jnp.float32)
        c = jnp.concatenate([jnp.ones((5, 4)), jnp.zeros((3, 4))], axis=0)
        _, idx = cosine_topk_pallas(q, c, 3, block_n=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx[0]), [0, 1, 2])

    def test_candidate_mask_pallas_matches_reference(self, rng):
        d, n, k = 32, 300, 9
        q = rng.standard_normal((3, d)).astype(np.float32)
        c = rng.standard_normal((n, d)).astype(np.float32)
        mask = (rng.random(n) < 0.3).astype(np.int32)
        ref_s, ref_i = cosine_topk_reference(
            jnp.asarray(q), jnp.asarray(c), k, candidate_mask=jnp.asarray(mask)
        )
        out_s, out_i = cosine_topk_pallas(
            jnp.asarray(q),
            jnp.asarray(c),
            k,
            block_n=128,
            interpret=True,
            candidate_mask=jnp.asarray(mask),
        )
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref_s), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out_i), np.asarray(ref_i))
        assert all(mask[j] == 1 for j in np.asarray(out_i).ravel())


class TestMNRL:
    def test_loss_value_manual(self):
        # Two orthonormal pairs: logits = scale * I
        q = jnp.eye(2, 4, dtype=jnp.float32)
        p = jnp.eye(2, 4, dtype=jnp.float32)
        loss = mnrl_loss(q, p, scale=30.0)
        # CE with logit 30 vs 0: log(exp(30)+exp(0)) - 30
        expect = float(np.log(np.exp(30.0) + np.exp(0.0)) - 30.0)
        assert float(loss) == pytest.approx(expect, abs=1e-6)

    def test_loss_decreases_when_positives_align(self, rng):
        d = 8
        q = rng.standard_normal((16, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        p_aligned = q.copy()
        p_random = rng.standard_normal((16, d)).astype(np.float32)
        p_random /= np.linalg.norm(p_random, axis=1, keepdims=True)
        l_good = float(mnrl_loss(jnp.asarray(q), jnp.asarray(p_aligned), scale=10.0))
        l_bad = float(mnrl_loss(jnp.asarray(q), jnp.asarray(p_random), scale=10.0))
        assert l_good < l_bad

    def test_cross_device_gather_matches_global_batch(self, rng):
        # shard_map over 8 CPU devices must equal the single-device global loss.
        from jax.sharding import Mesh, PartitionSpec as P
        from jax import shard_map

        n_dev = jax.device_count()
        assert n_dev == 8
        b_total, d = 32, 16
        q = rng.standard_normal((b_total, d)).astype(np.float32)
        p = rng.standard_normal((b_total, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        p /= np.linalg.norm(p, axis=1, keepdims=True)

        global_loss = float(mnrl_loss(jnp.asarray(q), jnp.asarray(p), scale=20.0))

        mesh = Mesh(np.array(jax.devices()), ("data",))

        def local_loss(q_shard, p_shard):
            loss = mnrl_loss(q_shard, p_shard, scale=20.0, axis_name="data")
            return jax.lax.pmean(loss, "data")

        sharded = shard_map(
            local_loss, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P()
        )
        out = float(sharded(jnp.asarray(q), jnp.asarray(p)))
        assert out == pytest.approx(global_loss, rel=1e-5)


class TestTopKLargeK:
    def test_k_exceeding_block_falls_back_exact(self, rng):
        # k > block_n: per-block extraction would be inexact; must take the
        # dense fallback and stay exact.
        q = rng.standard_normal((2, 16)).astype(np.float32)
        c = rng.standard_normal((1000, 16)).astype(np.float32)
        s, i = cosine_topk_pallas(jnp.asarray(q), jnp.asarray(c), 200, block_n=128, interpret=True)
        expect = np.argsort(-(q @ c.T), axis=1, kind="stable")[:, :200]
        np.testing.assert_array_equal(np.asarray(i), expect)


class TestPartitionedOps:
    """custom_partitioning rules: Pallas ops under jit-GSPMD on a multi-device
    mesh must shard along batch (no operand replication) and stay exact."""

    def _mesh(self):
        from jax.sharding import Mesh

        return Mesh(np.array(jax.devices()), ("data",))

    def test_attention_fwd_partitioned(self, rng):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from instacart_next_order_recommendation_tpu.ops.attention import (
            _attn_fwd_partitioned,
        )

        mesh = self._mesh()
        q, k, v, mask = _random_qkv(rng, b=16)
        sh = NamedSharding(mesh, P("data"))
        qs, ks, vs, ms = (jax.device_put(x, sh) for x in (q, k, v, mask))
        fn = jax.jit(_attn_fwd_partitioned(0.25, True))
        out = fn(qs, ks, vs, ms)
        assert out.sharding.spec == P("data")
        ref = multi_head_attention_reference(q, k, v, mask, 0.25)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        # The fwd partitions along batch: no collectives in the compiled module.
        hlo = fn.lower(qs, ks, vs, ms).compile().as_text()
        assert "all-gather" not in hlo and "all-reduce" not in hlo

    def test_attention_grad_partitioned(self, rng):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from instacart_next_order_recommendation_tpu.ops.attention import (
            _attention_pallas,
        )

        mesh = self._mesh()
        q, k, v, mask = _random_qkv(rng, b=8)
        sh = NamedSharding(mesh, P("data"))
        qs, ks, vs, ms = (jax.device_put(x, sh) for x in (q, k, v, mask))

        def loss(q, k, v, mask):
            return jnp.sum(_attention_pallas(q, k, v, mask, 0.25, True) ** 2)

        def ref_loss(q, k, v, mask):
            return jnp.sum(multi_head_attention_reference(q, k, v, mask, 0.25) ** 2)

        got = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks, vs, ms)
        want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v, mask)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-4)

    def test_pool_norm_partitioned(self, rng):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from instacart_next_order_recommendation_tpu.ops.pool_norm import (
            _pool_partitioned,
        )

        mesh = self._mesh()
        hidden = jnp.asarray(rng.standard_normal((16, 24, 32)), jnp.float32)
        mask = (jnp.arange(24)[None, :] < 17).astype(jnp.int32) * jnp.ones((16, 1), jnp.int32)
        sh = NamedSharding(mesh, P("data"))
        hs, ms = jax.device_put(hidden, sh), jax.device_put(mask, sh)
        fn = jax.jit(_pool_partitioned(True))
        out = fn(hs, ms)
        assert out.sharding.spec == P("data")
        ref = masked_mean_pool_l2norm_reference(hidden, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

"""Shared masked self-attention op: backend resolution + numerics.

The einsum path is the numerical authority (it is what every CPU parity
test exercises through the models).  The flash path must match it on TPU;
that comparison lives in the MATCHA_TESTS_TPU tier below because the
Pallas flash kernel only compiles on TPU backends.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.ops.attention import masked_self_attention, resolve_backend

ON_TPU = os.environ.get("MATCHA_TESTS_TPU") == "1"


def _ref_attention(q, k, v, key_valid):
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = np.einsum("bhqd,bhkd->bhqk", q, k).astype(np.float64) * scale
    logits = np.where(key_valid[:, None, None, :] > 0, logits, -np.inf)
    w = np.exp(logits - logits.max(axis=-1, keepdims=True))
    w = w / w.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", w, v)


class TestResolveBackend:
    def test_explicit_backends_pass_through(self):
        assert resolve_backend("einsum", (1, 1, 256, 64)) == "einsum"
        assert resolve_backend("flash", (1, 1, 256, 64)) == "flash"

    def test_unknown_backend_raises(self):
        with pytest.raises(ValueError):
            resolve_backend("sdpa", (1, 1, 256, 64))

    def test_auto_off_tpu_is_einsum(self):
        if jax.default_backend() == "tpu":
            pytest.skip("CPU-mesh assertion")
        assert resolve_backend("auto", (1, 1, 512, 64)) == "einsum"

    def test_auto_rejects_unaligned_shapes(self):
        # regardless of backend, a 100-long seq or odd head dim must not
        # pick the flash kernel
        assert resolve_backend("auto", (1, 1, 1100, 64)) == "einsum"
        assert resolve_backend("auto", (1, 1, 2048, 50)) == "einsum"

    def test_auto_short_seq_is_einsum_everywhere(self):
        # below the measured crossover (1024) XLA's fused einsum wins on
        # TPU too — auto must never pick flash there
        assert resolve_backend("auto", (16, 5, 512, 64)) == "einsum"
        assert resolve_backend("auto", (16, 5, 256, 64)) == "einsum"

    @pytest.mark.skipif(not ON_TPU, reason="TPU-backend resolution")
    def test_auto_long_seq_on_tpu_is_flash(self):
        assert resolve_backend("auto", (16, 5, 1024, 64)) == "flash"
        assert resolve_backend("auto", (4, 6, 2048, 48)) == "flash"


class TestEinsumNumerics:
    def test_matches_numpy_reference_with_padding(self):
        rng = np.random.default_rng(0)
        b, h, t, d = 2, 3, 16, 8
        q = rng.standard_normal((b, h, t, d)).astype(np.float32)
        k = rng.standard_normal((b, h, t, d)).astype(np.float32)
        v = rng.standard_normal((b, h, t, d)).astype(np.float32)
        valid = np.zeros((b, t), np.float32)
        valid[0, :10] = 1.0
        valid[1, :] = 1.0

        out = masked_self_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(valid), backend="einsum",
        )
        ref = _ref_attention(q, k, v, valid)
        # TPU f32 matmuls run at the default (bf16-passes) precision
        # (measured max gap 7e-3 vs the f64 oracle); CPU einsum is exact
        # to f32
        atol = 1e-2 if jax.default_backend() == "tpu" else 1e-5
        np.testing.assert_allclose(np.asarray(out), ref, atol=atol)

    def test_padded_rows_are_finite(self):
        # padded QUERY rows still attend valid keys — no all-masked softmax
        q = jnp.ones((1, 1, 4, 8))
        valid = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
        out = masked_self_attention(q, q, q, valid, backend="einsum")
        assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.skipif(not ON_TPU, reason="flash kernel compiles on TPU only")
class TestFlashParityOnTPU:
    @pytest.mark.parametrize(
        "shape",
        [
            (2, 5, 256, 64),   # decoder short bucket (explicit-flash only)
            (2, 6, 128, 48),   # encoder short bucket (explicit-flash only)
            (2, 5, 1024, 64),  # decoder long bucket — auto picks flash here
            (2, 6, 2048, 48),  # encoder long bucket — auto picks flash here
        ],
    )
    def test_flash_matches_einsum(self, shape):
        rng = np.random.default_rng(1)
        b, h, t, d = shape
        q, k, v = (
            jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
            for _ in range(3)
        )
        valid = np.ones((b, t), np.float32)
        valid[0, t // 2:] = 0.0
        valid = jnp.asarray(valid)

        out_e = masked_self_attention(q, k, v, valid, backend="einsum")
        out_f = masked_self_attention(q, k, v, valid, backend="flash")
        # compare only valid rows: the flash kernel zeroes fully-masked
        # padded query rows while einsum gives them (masked-out) garbage
        # both paths run the same default TPU matmul precision — measured
        # max gap 4.5e-5 at (2,5,256,64), bit-identical at (2,6,128,48),
        # 1.1e-3 at T>=1024 (bf16-pass matmul noise grows with the
        # softmax reduction length)
        m = np.asarray(valid)[:, None, :, None]
        np.testing.assert_allclose(
            np.asarray(out_e) * m, np.asarray(out_f) * m, atol=2e-3
        )

    def test_flash_inside_shard_map(self):
        """The meshed SERVING path dispatches the flash kernel per shard via
        shard_map (inference.py _shard_mapped) — prove that composition
        compiles and matches einsum on hardware with a 1-device mesh."""
        from jax.sharding import Mesh, PartitionSpec as P

        rng = np.random.default_rng(3)
        b, h, t, d = 2, 5, 1024, 64
        q, k, v = (
            jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
            for _ in range(3)
        )
        valid = np.ones((b, t), np.float32)
        valid[0, t // 2:] = 0.0
        valid = jnp.asarray(valid)

        mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
        fn = jax.jit(
            jax.shard_map(
                lambda *a: masked_self_attention(*a, backend="flash"),
                mesh=mesh,
                in_specs=(P("data"),) * 4,
                out_specs=P("data"),
                check_vma=False,
            )
        )
        out_f = fn(q, k, v, valid)
        out_e = masked_self_attention(q, k, v, valid, backend="einsum")
        m = np.asarray(valid)[:, None, :, None]
        np.testing.assert_allclose(
            np.asarray(out_e) * m, np.asarray(out_f) * m, atol=2e-3
        )

    def test_flash_gradients_match(self):
        rng = np.random.default_rng(2)
        b, h, t, d = 1, 2, 128, 64
        q, k, v = (
            jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
            for _ in range(3)
        )
        valid = jnp.ones((b, t), jnp.float32)

        def loss(backend, *args):
            return jnp.sum(
                jnp.square(masked_self_attention(*args, valid, backend=backend))
            )

        ge = jax.grad(lambda *a: loss("einsum", *a), argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(lambda *a: loss("flash", *a), argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(ge, gf):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-2, rtol=1e-2
            )

"""Pallas flash attention vs reference XLA attention (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvoc_tpu.ops.attention import flash_attention


def _ref(q, k, v):
    d = q.shape[-1]
    s = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("sq,sk", [(256, 256), (300, 300), (130, 257)])
def test_flash_matches_reference(rng, sq, sk):
    b, h, d = 2, 3, 8
    q = rng.standard_normal((b, h, sq, d), dtype=np.float32)
    k = rng.standard_normal((b, h, sk, d), dtype=np.float32)
    v = rng.standard_normal((b, h, sk, d), dtype=np.float32)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        block_q=128, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), _ref(q, k, v), atol=2e-5)


def test_flash_env_blocks_non_divisor(rng, monkeypatch):
    """MVOC_FLASH_BLOCK_Q/K force aligned blocks that need NOT divide the
    sequence (padding + seq_k masking handle the remainder) — the 720p
    A/B hook where _pick_block's divisors (480/960) are MXU-misaligned."""
    b, h, d = 1, 2, 16
    q = rng.standard_normal((b, h, 450, d), dtype=np.float32)
    k = rng.standard_normal((b, h, 1200, d), dtype=np.float32)
    v = rng.standard_normal((b, h, 1200, d), dtype=np.float32)
    monkeypatch.setenv("MVOC_FLASH_BLOCK_Q", "128")
    monkeypatch.setenv("MVOC_FLASH_BLOCK_K", "512")  # 1200 pads to 1536
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), _ref(q, k, v), atol=2e-5)


def test_flash_bf16_io(rng):
    b, h, sq, d = 1, 2, 256, 8
    q = rng.standard_normal((b, h, sq, d), dtype=np.float32)
    out = flash_attention(
        jnp.asarray(q, dtype=jnp.bfloat16),
        jnp.asarray(q, dtype=jnp.bfloat16),
        jnp.asarray(q, dtype=jnp.bfloat16),
        block_q=128, block_k=128, interpret=True,
    )
    assert out.dtype == jnp.bfloat16
    ref = _ref(q, q, q)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), ref, atol=0.06, rtol=0.05
    )


def test_flash_cross_attention_short_k(rng):
    """Cross-attention shape (long q, 145 context tokens): the auto block_k
    pads the single K block to the 128-lane tile and masks the remainder."""
    b, h, sq, sk, d = 1, 2, 256, 145, 8
    q = rng.standard_normal((b, h, sq, d), dtype=np.float32)
    k = rng.standard_normal((b, h, sk, d), dtype=np.float32)
    v = rng.standard_normal((b, h, sk, d), dtype=np.float32)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True)
    np.testing.assert_allclose(np.asarray(out), _ref(q, k, v), atol=2e-5)

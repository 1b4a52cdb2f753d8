"""Multi-chip sharding on the virtual 8-device CPU mesh: the sharded UNet
forward must compile, run, and match the single-device result."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvoc_tpu.models.unet_i2vgen import I2VGenXLUNet, UNetConfig
from mvoc_tpu.parallel import mesh as pm


def test_make_mesh_shapes():
    m = pm.make_mesh(8)
    assert m.shape[pm.SEQ_AXIS] * m.shape[pm.MODEL_AXIS] == 8
    m1 = pm.make_mesh(1)
    assert dict(m1.shape) == {pm.SEQ_AXIS: 1, pm.MODEL_AXIS: 1}


def test_sharded_unet_matches_single_device(rng):
    cfg = UNetConfig.tiny()
    model = I2VGenXLUNet(cfg)
    B, F, H, W = 2, 8, 8, 8  # F divisible by the seq axis (4)
    d = cfg.cross_attention_dim

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32))

    inputs = dict(
        sample=mk(B, F, H, W, 4),
        timestep=jnp.asarray([500] * B),
        fps=jnp.asarray([8] * B),
        image_latents_first=mk(B, F, H, W, 4),
        image_latents=mk(B, F, H, W, 4),
        image_embeddings=mk(B, F, d),
        encoder_hidden_states=mk(B, 7, d),
    )
    params = model.init(jax.random.key(0), **inputs)
    ref = np.asarray(model.apply(params, **inputs))

    mesh = pm.make_mesh(8)
    sharded_params = pm.shard_params(params, mesh)
    sharded_inputs = dict(inputs)
    for k in ("sample", "image_latents_first", "image_latents"):
        sharded_inputs[k] = pm.shard_video(inputs[k], mesh)

    with mesh:
        out = jax.jit(lambda p, kw: model.apply(p, **kw))(sharded_params, sharded_inputs)
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)

    # TP actually sharded something: at least one kernel is split over model axis
    specs = jax.tree_util.tree_leaves(
        jax.tree.map(lambda x: x.sharding.spec, sharded_params)
    )
    assert any(pm.MODEL_AXIS in str(s) for s in specs), "no TP sharding applied"


def test_ring_attention_matches_full(rng):
    """Ring attention over the 8-device mesh == plain sdpa, exactly (online
    softmax is exact, not approximate)."""
    from mvoc_tpu.models.layers import sdpa
    from mvoc_tpu.ops.ring_attention import ring_sdpa

    heads, d = 2, 8
    B, S = 3, 64  # long-video frame axis, divisible by the seq axis

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32))

    q, k, v = mk(B, S, heads * d), mk(B, S, heads * d), mk(B, S, heads * d)
    ref = np.asarray(sdpa(q, k, v, heads))

    m = pm.make_mesh(8, seq=8)
    out = np.asarray(ring_sdpa(q, k, v, heads, m, axis_name=pm.SEQ_AXIS))
    np.testing.assert_allclose(out, ref, atol=2e-5)

    # also on a 2-wide ring inside a mixed (seq, model) mesh
    m2 = pm.make_mesh(8, seq=2)
    out2 = np.asarray(ring_sdpa(q, k, v, heads, m2, axis_name=pm.SEQ_AXIS))
    np.testing.assert_allclose(out2, ref, atol=2e-5)


def test_ulysses_attention_matches_full(rng):
    """Ulysses (all-to-all head exchange) == plain sdpa on the 8-device mesh."""
    from mvoc_tpu.models.layers import sdpa
    from mvoc_tpu.ops.ring_attention import ring_sdpa

    heads, d = 8, 4  # heads divisible by the seq axis
    B, S = 2, 32

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32))

    q, k, v = mk(B, S, heads * d), mk(B, S, heads * d), mk(B, S, heads * d)
    ref = np.asarray(sdpa(q, k, v, heads))
    m = pm.make_mesh(8, seq=8)
    out = np.asarray(ring_sdpa(q, k, v, heads, m, axis_name=pm.SEQ_AXIS,
                               method="ulysses"))
    np.testing.assert_allclose(out, ref, atol=2e-5)

    m2 = pm.make_mesh(8, seq=2)
    out2 = np.asarray(ring_sdpa(q, k, v, heads, m2, axis_name=pm.SEQ_AXIS,
                                method="ulysses"))
    np.testing.assert_allclose(out2, ref, atol=2e-5)

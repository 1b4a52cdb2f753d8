"""I2VGen-XL UNet: tiny-config forward, PnP injection branch semantics.

This box has ONE cpu core, so every eager forward costs ~30s and every init
~90s: the whole file shares a single init and runs the minimum number of
forwards.  jit coverage for the UNet comes from the pipeline tests (the
inversion/composite loops lax.scan-compile the same apply).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvoc_tpu import pnp as pnp_lib
from mvoc_tpu.models.unet_i2vgen import I2VGenXLUNet, UNetConfig

N_OBJ = 2
B = N_OBJ + 3  # [bg, obj1, obj2, uncond, cond] — the PnP branch batch
F, H, W = 2, 8, 8


def _mask_state(gates=True):
    masks = np.zeros((N_OBJ, F, H, W), np.float32)
    masks[0, :, : H // 2] = 1.0
    masks[1, :, :, : W // 2] = 1.0
    resolutions = [(H, W), (H // 2, W // 2), (H // 4, W // 4)]
    pyramid = {k: jnp.asarray(v) for k, v in pnp_lib.build_mask_pyramid(masks, resolutions).items()}
    g = jnp.asarray(bool(gates))
    return pnp_lib.PnPState(
        masks=pyramid, gate_spatial=g, gate_temporal=g, gate_conv=g,
        inject_background=True,
    )


@pytest.fixture(scope="module")
def unet():
    cfg = UNetConfig.tiny()
    model = I2VGenXLUNet(cfg)
    rng = np.random.default_rng(1)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32))

    inputs = dict(
        sample=mk(B, F, H, W, 4),
        timestep=jnp.asarray([500] * B),
        fps=jnp.asarray([8] * B),
        image_latents_first=mk(B, F, H, W, 4),
        image_latents=mk(B, F, H, W, 4),
        image_embeddings=mk(B, F, cfg.cross_attention_dim),
        encoder_hidden_states=mk(B, 7, cfg.cross_attention_dim),
    )
    params = model.init(jax.random.key(0), **inputs)
    out_plain = np.asarray(model.apply(params, **inputs))
    return cfg, model, params, inputs, out_plain


def test_forward_shape_finite(unet):
    _, _, _, _, out = unet
    assert out.shape == (B, F, H, W, 4)
    assert np.isfinite(out).all()


def test_pnp_injection_changes_edit_branches_only(unet):
    cfg, model, params, inputs, out_plain = unet
    out_pnp = np.asarray(model.apply(params, **inputs, pnp=_mask_state()))
    # source branches (bg + objects) are never written to
    np.testing.assert_allclose(out_pnp[: N_OBJ + 1], out_plain[: N_OBJ + 1], atol=1e-5)
    # edit branches must change
    assert np.abs(out_pnp[N_OBJ + 1 :] - out_plain[N_OBJ + 1 :]).max() > 1e-4
    # the out-conv injection is the final op => uncond == cond exactly
    np.testing.assert_allclose(out_pnp[B - 2], out_pnp[B - 1], atol=1e-6)


def test_pnp_gates_off_is_noop(unet):
    cfg, model, params, inputs, out_plain = unet
    out_off = np.asarray(model.apply(params, **inputs, pnp=_mask_state(gates=False)))
    np.testing.assert_allclose(out_off, out_plain, atol=1e-6)


def test_odd_resolution_forward(unet):
    """90x160-equivalent: sizes NOT divisible by 8 exercise the explicit
    upsample-size path (reference pipeline_i2vgen_xl.py:156-164, 328-329)."""
    cfg, model, params, _, _ = unet
    rng = np.random.default_rng(2)
    h, w = 10, 14

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32))

    out = model.apply(
        params,
        sample=mk(1, F, h, w, 4),
        timestep=jnp.asarray([3]),
        fps=jnp.asarray([8]),
        image_latents_first=mk(1, F, h, w, 4),
        image_latents=mk(1, F, h, w, 4),
        image_embeddings=mk(1, F, cfg.cross_attention_dim),
        encoder_hidden_states=mk(1, 7, cfg.cross_attention_dim),
    )
    assert out.shape == (1, F, h, w, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_multi_frame_guidance_changes_output(unet):
    """multi_frame_guidance=True uses per-frame CLIP embeds + per-frame
    image-latent context tokens (reference: pipeline_i2vgen_xl.py:150-151,
    211-212, hardcoded False at the composite call site :1697)."""
    cfg, model, params, inputs, out_plain = unet
    out_mfg = np.asarray(model.apply(params, **inputs, multi_frame_guidance=True))
    assert out_mfg.shape == out_plain.shape
    # per-frame conditioning differs from broadcast-frame-0 conditioning
    assert np.abs(out_mfg - out_plain).max() > 1e-5
    # ... unless every frame's conditioning equals frame 0's
    same = dict(inputs)
    same["image_embeddings"] = jnp.broadcast_to(
        inputs["image_embeddings"][:, :1], inputs["image_embeddings"].shape)
    same["image_latents"] = jnp.broadcast_to(
        inputs["image_latents"][:, :1], inputs["image_latents"].shape)
    a = np.asarray(model.apply(params, **same, multi_frame_guidance=True))
    b = np.asarray(model.apply(params, **same, multi_frame_guidance=False))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_two_pass_capture_consume_equals_fused(unet):
    """Two-pass execution (capture source features, then run edit branches
    with mode='consume') must produce EXACTLY the fused 5-branch result for
    the edit branches — the math is identical, only the batching differs.
    Verified for both inject_background settings."""
    import dataclasses

    cfg, model, params, inputs, _ = unet

    for inject_bg in (True, False):
        pnp = dataclasses.replace(_mask_state(), inject_background=inject_bg)
        fused = np.asarray(model.apply(params, **inputs, pnp=pnp))

        src_inputs = {
            k: (v[: N_OBJ + 1] if hasattr(v, "ndim") and v.ndim >= 1 and
                v.shape[0] == B else v)
            for k, v in inputs.items()
        }
        edit_inputs = {
            k: (v[N_OBJ + 1 :] if hasattr(v, "ndim") and v.ndim >= 1 and
                v.shape[0] == B else v)
            for k, v in inputs.items()
        }
        # pass A: sources only, capture raw features
        src_eps, variables = model.apply(
            params, **src_inputs, pnp_capture=True, mutable=["pnp_features"])
        feats = {k: v[0] for k, v in variables["pnp_features"].items()}
        assert "out_conv" in feats and any(k.startswith("spatial_") for k in feats)

        # pass B: edit branches with consume-mode PnP
        pnp_consume = dataclasses.replace(pnp, mode="consume", features=feats)
        edit_eps = np.asarray(model.apply(params, **edit_inputs, pnp=pnp_consume))

        np.testing.assert_allclose(
            edit_eps, fused[N_OBJ + 1 :], atol=2e-5,
            err_msg=f"two-pass mismatch (inject_background={inject_bg})")
        # source branches also match (no injection applies to them)
        np.testing.assert_allclose(np.asarray(src_eps), fused[: N_OBJ + 1], atol=2e-5)


def test_precomposited_two_pass_equals_fused(unet):
    """Pre-composited capture (one branch-equivalent per site: inj =
    base*W + S) must match the fused result up to fp reassociation, for
    both inject_background settings."""
    import dataclasses

    cfg, model, params, inputs, _ = unet

    for inject_bg in (True, False):
        pnp = dataclasses.replace(_mask_state(), inject_background=inject_bg)
        fused = np.asarray(model.apply(params, **inputs, pnp=pnp))

        src_inputs = {
            k: (v[: N_OBJ + 1] if hasattr(v, "ndim") and v.ndim >= 1 and
                v.shape[0] == B else v)
            for k, v in inputs.items()
        }
        edit_inputs = {
            k: (v[N_OBJ + 1 :] if hasattr(v, "ndim") and v.ndim >= 1 and
                v.shape[0] == B else v)
            for k, v in inputs.items()
        }
        # pass A with pnp -> PRE-COMPOSITED capture
        _, variables = model.apply(
            params, **src_inputs, pnp=pnp, pnp_capture=True,
            mutable=["pnp_features"])
        feats = {k: v[0] for k, v in variables["pnp_features"].items()}
        # each feature is ONE branch-equivalent (S), not N+1
        sq, sk = feats["spatial_3_0"]
        assert sq.shape[0] == F  # F rows, not (N+1)*F

        pnp_consume = dataclasses.replace(pnp, mode="consume_pre", features=feats)
        edit_eps = np.asarray(model.apply(params, **edit_inputs, pnp=pnp_consume))
        np.testing.assert_allclose(
            edit_eps, fused[N_OBJ + 1 :], atol=5e-5,
            err_msg=f"precomposited mismatch (inject_background={inject_bg})")


def test_temporal_natural_layout_matches(unet):
    """temporal_natural_layout=True (frame-major tokens, sdpa_frames) ==
    the transposed-layout forward: identical params, same math, only the
    tensor layout differs.  Also equal with PnP armed (edit sites fall back
    to the transposed layout there)."""
    cfg, model, params, inputs, out_plain = unet
    cfg_nat = dataclasses.replace(cfg, temporal_natural_layout=True)
    model_nat = I2VGenXLUNet(cfg_nat)

    out_nat = np.asarray(model_nat.apply(params, **inputs))
    np.testing.assert_allclose(out_nat, out_plain, atol=2e-4)

    pnp = _mask_state(gates=True)
    ref = np.asarray(model.apply(params, **inputs, pnp=pnp))
    nat = np.asarray(model_nat.apply(params, **inputs, pnp=pnp))
    np.testing.assert_allclose(nat, ref, atol=2e-4)


def test_temporal_natural_layout_two_pass(unet):
    """Natural layout through the two-pass capture/consume path == the
    default-layout two-pass path (same captured composite, different token
    layout at temporal sites)."""
    cfg, model, params, inputs, out_plain = unet
    cfg_nat = dataclasses.replace(cfg, temporal_natural_layout=True)
    model_nat = I2VGenXLUNet(cfg_nat)
    pnp = _mask_state(gates=True)

    def run_two_pass(m):
        src = {k: (v[: N_OBJ + 1] if hasattr(v, "shape") and v.shape[:1] == (B,) else v)
               for k, v in inputs.items()}
        edit = {k: (v[N_OBJ + 1:] if hasattr(v, "shape") and v.shape[:1] == (B,) else v)
                for k, v in inputs.items()}
        _, variables = m.apply(
            params, **src, pnp=pnp, pnp_capture=True, mutable=["pnp_features"])
        feats = {k: v[0] for k, v in variables["pnp_features"].items()}
        pnp_c = dataclasses.replace(pnp, mode="consume_pre", features=feats)
        return np.asarray(m.apply(params, **edit, pnp=pnp_c))

    ref = run_two_pass(model)
    nat = run_two_pass(model_nat)
    np.testing.assert_allclose(nat, ref, atol=2e-4)


def test_partial_depth_encoder_reuse_exact_on_same_inputs():
    """encoder_reuse_depth=k: the cache holds only down blocks k.. + mid
    (smaller pytree); splicing it back on IDENTICAL inputs while recomputing
    the shallow blocks must reproduce the plain forward exactly."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from mvoc_tpu.models.unet_i2vgen import I2VGenXLUNet, UNetConfig

    cfg = UNetConfig.tiny()
    model = I2VGenXLUNet(cfg)
    rng = np.random.default_rng(13)
    B, F, LAT = 2, 2, 8
    d = cfg.cross_attention_dim
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    kw = dict(
        sample=mk(B, F, LAT, LAT, 4),
        timestep=jnp.asarray([500] * B), fps=jnp.asarray([8] * B),
        image_latents_first=mk(B, F, LAT, LAT, 4),
        image_latents=mk(B, F, LAT, LAT, 4),
        image_embeddings=mk(B, F, d),
        encoder_hidden_states=mk(B, 7, d),
    )
    params = model.init(jax.random.key(0), **kw)
    ref = np.asarray(model.apply(params, **kw))

    _, full_cache = model.apply(params, **kw, return_encoder=True)
    full_leaves = sum(x.size for x in jax.tree_util.tree_leaves(full_cache))

    for depth in (1, 2):
        eps, cache = model.apply(params, **kw, return_encoder=True,
                                 encoder_reuse_depth=depth)
        np.testing.assert_allclose(np.asarray(eps), ref, atol=1e-6)
        part_leaves = sum(x.size for x in jax.tree_util.tree_leaves(cache))
        assert part_leaves < full_leaves, (
            f"depth {depth} cache not smaller: {part_leaves} vs {full_leaves}")
        out = model.apply(params, **kw, cached_encoder=cache,
                          encoder_reuse_depth=depth)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6,
                                   err_msg=f"depth {depth}")

"""Backbone-agnostic PnP site maps (pnp.SiteMap / UNetConfig.site_map).

The injection placement is a parameter of the UNet, not a constant: the
same tiny backbone runs with a *different* site map under the same
capture/consume machinery (VERDICT r4 directive 9; docs/BACKBONE_PNP.md).
One shared init; forwards are ~30 s each on this 1-core host, so the
module runs the minimum number.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvoc_tpu import pnp as pnp_lib
from mvoc_tpu.models.unet_i2vgen import I2VGenXLUNet, UNetConfig

N_OBJ = 2
B = N_OBJ + 3
F, H, W = 2, 8, 8

# a deliberately different placement: one spatial-attention site at
# up_blocks[2] layer 0, one temp-conv site at up_blocks[1] layer 1,
# and NO out-conv site
CUSTOM = pnp_lib.SiteMap.make(
    spatial_attn={2: (0,)},
    temp_conv={1: (1,)},
    out_conv=False,
)


def test_sitemap_accessors_and_default_map():
    s = pnp_lib.I2VGEN_SITES
    assert s.spatial_at(1) == (1, 2) and s.spatial_at(2) == (0, 1, 2)
    assert s.spatial_at(0) == () and s.resnet_at(3) == (0, 1, 2)
    assert s.temporal_at(3) == (0, 1, 2) and s.temp_conv_at(3) == (0, 1, 2)
    assert s.out_conv is True
    assert s.block_indices() == {1, 2, 3}
    # hashable (UNet configs ride through jit closures) + legacy dict views
    hash(s)
    assert pnp_lib.SPATIAL_ATTN_SITES == {1: (1, 2), 2: (0, 1, 2), 3: (0, 1, 2)}
    assert pnp_lib.RESNET_SITES == {3: (0, 1, 2)}
    # custom map
    assert CUSTOM.spatial_at(2) == (0,) and CUSTOM.spatial_at(3) == ()
    assert CUSTOM.temp_conv_at(1) == (1,) and CUSTOM.resnet_at(3) == ()
    assert CUSTOM.block_indices() == {1, 2}


def _mask_state(gates=True):
    masks = np.zeros((N_OBJ, F, H, W), np.float32)
    masks[0, :, : H // 2] = 1.0
    masks[1, :, :, : W // 2] = 1.0
    resolutions = [(H, W), (H // 2, W // 2), (H // 4, W // 4)]
    pyramid = {k: jnp.asarray(v)
               for k, v in pnp_lib.build_mask_pyramid(masks, resolutions).items()}
    g = jnp.asarray(bool(gates))
    return pnp_lib.PnPState(
        masks=pyramid, gate_spatial=g, gate_temporal=g, gate_conv=g,
        inject_background=True,
    )


@pytest.fixture(scope="module")
def custom_unet():
    cfg = dataclasses.replace(UNetConfig.tiny(), site_map=CUSTOM)
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
    return cfg, model, params, inputs


def test_capture_records_exactly_the_custom_sites(custom_unet):
    cfg, model, params, inputs = custom_unet
    src = {k: (v[: N_OBJ + 1] if hasattr(v, "shape") and v.shape[:1] == (B,) else v)
           for k, v in inputs.items()}
    _, variables = model.apply(
        params, **src, pnp_capture=True, mutable=["pnp_features"])
    feats = set(variables["pnp_features"])
    assert feats == {"spatial_2_0", "tconv_1_1"}, feats  # and NO out_conv


def test_custom_map_injects_and_consume_matches_fused(custom_unet):
    """The same capture/consume plumbing drives the custom placement:
    fused injection changes only the edit branches, and two-pass
    pre-composited capture/consume reproduces the fused result exactly."""
    cfg, model, params, inputs = custom_unet
    plain = np.asarray(model.apply(params, **inputs))
    pnp = _mask_state()
    fused = np.asarray(model.apply(params, **inputs, pnp=pnp))
    # sources untouched; edits changed
    np.testing.assert_allclose(fused[: N_OBJ + 1], plain[: N_OBJ + 1], atol=1e-5)
    assert np.abs(fused[N_OBJ + 1:] - plain[N_OBJ + 1:]).max() > 1e-5

    src = {k: (v[: N_OBJ + 1] if hasattr(v, "shape") and v.shape[:1] == (B,) else v)
           for k, v in inputs.items()}
    edit = {k: (v[N_OBJ + 1:] if hasattr(v, "shape") and v.shape[:1] == (B,) else v)
            for k, v in inputs.items()}
    _, variables = model.apply(
        params, **src, pnp=pnp, pnp_capture=True, mutable=["pnp_features"])
    feats = {k: v[0] for k, v in variables["pnp_features"].items()}
    pnp_c = dataclasses.replace(pnp, mode="consume_pre", features=feats)
    edit_eps = np.asarray(model.apply(params, **edit, pnp=pnp_c))
    np.testing.assert_allclose(edit_eps, fused[N_OBJ + 1:], atol=5e-5)


def test_params_shared_across_site_maps(custom_unet):
    """The site map changes only the injection wiring, never the params:
    default-map apply runs on the custom-map init (and differs from the
    custom-map PnP result only through the injection sites)."""
    cfg, model, params, inputs = custom_unet
    default_model = I2VGenXLUNet(dataclasses.replace(cfg, site_map=None))
    pnp = _mask_state()
    out_default = np.asarray(default_model.apply(params, **inputs, pnp=pnp))
    out_custom = np.asarray(model.apply(params, **inputs, pnp=pnp))
    assert out_default.shape == out_custom.shape
    # different placements -> different edit-branch outputs
    assert np.abs(out_default[N_OBJ + 1:] - out_custom[N_OBJ + 1:]).max() > 1e-5

"""Weight-converter tests.

The CLIP towers get REAL golden parity: a tiny torch HF CLIPTextModel /
CLIPVisionModelWithProjection is instantiated, its state_dict converted
with the production key maps, and the flax output compared numerically to
the torch output.  (diffusers is not installed in this image, so UNet/VAE
conversion is covered structurally by verify_tree in convert.load_pipeline
and exercised against the real checkpoint layout at load time.)
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mvoc_tpu.models import convert
from mvoc_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextModel,
    CLIPVisionConfig,
    CLIPVisionModelWithProjection,
)

TINY_TEXT = dict(
    vocab_size=99, hidden_size=16, intermediate_size=32, num_hidden_layers=2,
    num_attention_heads=2, max_position_embeddings=12, hidden_act="gelu",
)
TINY_VISION = dict(
    hidden_size=16, intermediate_size=32, num_hidden_layers=2,
    num_attention_heads=2, image_size=28, patch_size=14, projection_dim=8,
    hidden_act="gelu",
)


def _to_np_sd(model):
    return {k: v.detach().to(torch.float32).numpy() for k, v in model.state_dict().items()}


def test_clip_text_conversion_parity():
    from transformers import CLIPTextConfig as HFTextConfig
    from transformers import CLIPTextModel as HFTextModel

    torch.manual_seed(0)
    hf = HFTextModel(HFTextConfig(**TINY_TEXT)).eval()
    ids = torch.randint(0, 99, (2, 12))
    with torch.no_grad():
        ref = hf(ids, output_hidden_states=True)

    ours = CLIPTextModel(CLIPTextConfig(**{k: v for k, v in TINY_TEXT.items()}))
    params = {"params": convert._fix_clip_raw_params(
        convert.convert_state_dict(_to_np_sd(hf), convert.clip_text_key_fn))}
    out = ours.apply(params, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(
        np.asarray(out), ref.last_hidden_state.numpy(), atol=2e-5,
        err_msg="last_hidden_state mismatch",
    )

    # clip_skip=1: penultimate hidden state + final layer norm
    # (diffusers encode_prompt semantics, hidden_states[-(clip_skip+2)])
    out_skip = ours.apply(params, jnp.asarray(ids.numpy()), clip_skip=1)
    with torch.no_grad():
        ref_skip = hf.text_model.final_layer_norm(ref.hidden_states[-2])
    np.testing.assert_allclose(np.asarray(out_skip), ref_skip.numpy(), atol=2e-5)


def test_clip_vision_conversion_parity():
    from transformers import CLIPVisionConfig as HFVisionConfig
    from transformers import CLIPVisionModelWithProjection as HFVisionModel

    torch.manual_seed(1)
    hf = HFVisionModel(HFVisionConfig(**TINY_VISION)).eval()
    px = torch.randn(2, 3, 28, 28)
    with torch.no_grad():
        ref = hf(px).image_embeds.numpy()

    ours = CLIPVisionModelWithProjection(CLIPVisionConfig(**TINY_VISION))
    params = {"params": convert._fix_clip_raw_params(
        convert.convert_state_dict(_to_np_sd(hf), convert.clip_vision_key_fn))}
    out = ours.apply(params, jnp.asarray(px.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_verify_tree_catches_mismatch():
    good = {"a": {"kernel": np.zeros((2, 3))}}
    with pytest.raises(ValueError, match="missing"):
        convert.verify_tree({}, good, "t")
    with pytest.raises(ValueError, match="shape"):
        convert.verify_tree({"a": {"kernel": np.zeros((3, 2))}}, good, "t")
    with pytest.raises(ValueError, match="extra"):
        convert.verify_tree({"a": {"kernel": np.zeros((2, 3)), "bias": np.zeros(3)}}, good, "t")


def test_tensor_transforms():
    lin = np.arange(6, dtype=np.float32).reshape(2, 3)  # [out, in]
    leaf, v = convert._tensor_transform(["x"], "weight", lin)
    assert leaf == "kernel" and v.shape == (3, 2)
    conv = np.zeros((8, 4, 3, 3), np.float32)  # OIHW
    leaf, v = convert._tensor_transform(["x"], "weight", conv)
    assert v.shape == (3, 3, 4, 8)
    conv3 = np.zeros((8, 4, 3, 1, 1), np.float32)
    leaf, v = convert._tensor_transform(["x"], "weight", conv3)
    assert v.shape == (3, 1, 1, 4, 8)
    norm = np.ones(7, np.float32)
    leaf, v = convert._tensor_transform(["norm1"], "weight", norm)
    assert leaf == "scale"
    emb = np.zeros((9, 4), np.float32)
    leaf, v = convert._tensor_transform(["token_embedding"], "weight", emb)
    assert leaf == "embedding" and v.shape == (9, 4)


def test_unet_key_fn_mapping():
    """Curated diffusers-I2VGenXLUNet checkpoint keys -> our flax paths."""
    f = convert.unet_key_fn
    cases = {
        "conv_in": ["conv_in"],
        "time_embedding.linear_1": ["time_embedding", "linear_1"],
        "fps_embedding.linear_2": ["fps_embedding", "linear_2"],
        "transformer_in.proj_in": ["transformer_in", "proj_in"],
        "transformer_in.transformer_blocks.0.attn1.to_q":
            ["transformer_in", "transformer_blocks_0", "attn1", "to_q"],
        "transformer_in.transformer_blocks.0.attn1.to_out.0":
            ["transformer_in", "transformer_blocks_0", "attn1", "to_out_0"],
        "transformer_in.transformer_blocks.0.ff.net.0.proj":
            ["transformer_in", "transformer_blocks_0", "ff", "net_0_proj"],
        "transformer_in.transformer_blocks.0.ff.net.2":
            ["transformer_in", "transformer_blocks_0", "ff", "net_2"],
        "down_blocks.0.resnets.1.time_emb_proj":
            ["down_blocks_0", "resnets_1", "time_emb_proj"],
        "down_blocks.2.attentions.1.transformer_blocks.0.attn2.to_k":
            ["down_blocks_2", "attentions_1", "transformer_blocks_0", "attn2", "to_k"],
        "down_blocks.0.temp_convs.1.conv1.0":
            ["down_blocks_0", "temp_convs_1", "conv1_norm"],
        "down_blocks.0.temp_convs.1.conv4.2":
            ["down_blocks_0", "temp_convs_1", "conv4_conv"],
        "down_blocks.0.downsamplers.0.conv":
            ["down_blocks_0", "downsamplers_0", "conv"],
        "up_blocks.3.upsamplers.0.conv": None,  # up3 has no upsampler; key absent in ckpt
        "up_blocks.1.upsamplers.0.conv": ["up_blocks_1", "upsamplers_0", "conv"],
        "mid_block.temp_attentions.0.proj_out":
            ["mid_block", "temp_attentions_0", "proj_out"],
        "image_latents_proj_in.0": ["image_latents_proj_in_0"],
        "image_latents_proj_in.4": ["image_latents_proj_in_4"],
        "image_latents_context_embedding.0": ["image_latents_context_embedding_0"],
        "image_latents_context_embedding.3": ["image_latents_context_embedding_3"],
        "image_latents_context_embedding.5": ["image_latents_context_embedding_5"],
        "context_embedding.0": ["context_embedding_0"],
        "context_embedding.2": ["context_embedding_2"],
        "image_latents_temporal_encoder.norm1":
            ["image_latents_temporal_encoder", "norm1"],
        "conv_norm_out": ["conv_norm_out"],
        "conv_out": ["conv_out"],
    }
    for key, want in cases.items():
        if want is None:
            continue
        assert f(key) == want, (key, f(key), want)


def test_vae_key_fn_mapping():
    f = convert.vae_key_fn
    cases = {
        "encoder.conv_in": ["encoder", "conv_in"],
        "encoder.down_blocks.0.resnets.1.norm1":
            ["encoder", "down_blocks_0_resnets_1", "norm1"],
        "encoder.down_blocks.2.downsamplers.0.conv":
            ["encoder", "down_blocks_2_downsamplers_0_conv"],
        "encoder.mid_block.resnets.0.conv1":
            ["encoder", "mid_block", "resnets_0", "conv1"],
        "encoder.mid_block.attentions.0.to_q":
            ["encoder", "mid_block", "attentions_0", "to_q"],
        "encoder.conv_norm_out": ["encoder", "conv_norm_out"],
        "decoder.up_blocks.3.resnets.2.conv_shortcut":
            ["decoder", "up_blocks_3_resnets_2", "conv_shortcut"],
        "decoder.up_blocks.0.upsamplers.0.conv":
            ["decoder", "up_blocks_0_upsamplers_0_conv"],
        "quant_conv": ["quant_conv"],
        "post_quant_conv": ["post_quant_conv"],
    }
    for key, want in cases.items():
        assert f(key) == want, (key, f(key), want)


def test_infer_unet_geometry_from_shapes():
    """Attention geometry comes from checkpoint tensor shapes, not
    hardcoded assumptions (transformer_in / temporal-encoder head dims);
    contradictions raise instead of silently mis-wiring."""
    import numpy as np
    import pytest

    from mvoc_tpu.models import convert
    from mvoc_tpu.models.unet_i2vgen import UNetConfig

    cfg = UNetConfig()  # flagship: ch0=320, heads 8 / 2
    sd = {
        # transformer_in inner dim 512 (8 heads x 64) — the diffusers wiring
        "transformer_in.transformer_blocks.0.attn1.to_q.weight":
            np.zeros((512, 320), np.float32),
        # temporal encoder inner 8 (2 heads x in_channels=4)
        "image_latents_temporal_encoder.attn1.to_q.weight":
            np.zeros((8, 4), np.float32),
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight":
            np.zeros((320, 320), np.float32),
        "mid_block.attentions.0.transformer_blocks.0.attn1.to_q.weight":
            np.zeros((1280, 1280), np.float32),
    }
    out = convert.infer_unet_geometry(sd, cfg)
    assert out.transformer_in_head_dim == 64
    assert out.img_temporal_encoder_head_dim == 4

    # a checkpoint whose block attention width contradicts the
    # heads = ch // head_dim rule must fail loudly
    bad = dict(sd)
    bad["down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight"] = (
        np.zeros((640, 320), np.float32))
    with pytest.raises(ValueError, match="does not hold"):
        convert.infer_unet_geometry(bad, cfg)

    # indivisible transformer_in inner dim
    bad2 = dict(sd)
    bad2["transformer_in.transformer_blocks.0.attn1.to_q.weight"] = (
        np.zeros((513, 320), np.float32))
    with pytest.raises(ValueError, match="not divisible"):
        convert.infer_unet_geometry(bad2, cfg)


def test_verify_activations_tiny_pipeline():
    """verify_activations runs every model with capture_intermediates and
    returns finite per-module stats (the --verify loud-failure path)."""
    from mvoc_tpu.models import convert
    from mvoc_tpu.utils import testing as tt

    pipe = tt.build_tiny_pipeline()
    stats = convert.verify_activations(pipe)
    assert any(k.startswith("unet/") for k in stats)
    assert any(k.startswith("vae/") for k in stats)
    assert any(k.startswith("text_encoder/") for k in stats)
    assert any(k.startswith("image_encoder/") for k in stats)
    for name, (m, s) in stats.items():
        assert np.isfinite(m) and np.isfinite(s), name


def test_verify_activations_catches_nonfinite():
    """A poisoned parameter (NaN) must make verify_activations raise."""
    import jax
    import jax.numpy as jnp
    import pytest

    from mvoc_tpu.models import convert
    from mvoc_tpu.utils import testing as tt

    pipe = tt.build_tiny_pipeline()
    # poison one UNet kernel with NaN
    p = pipe.params["unet"]["params"]
    node = p
    while isinstance(node, dict):
        key = sorted(node.keys())[0]
        parent, node = node, node[key]
    parent[key] = jnp.full_like(parent[key], jnp.nan)
    with pytest.raises(ValueError, match="non-finite"):
        convert.verify_activations(pipe)

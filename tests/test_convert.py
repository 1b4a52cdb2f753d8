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

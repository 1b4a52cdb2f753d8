"""HF checkpoint -> flax parameter pytrees.

Loads the I2VGen-XL checkpoint directory the reference consumes
(`I2VGenXLPipeline.from_pretrained(...)`, reference: inverse.py:113-118,
common/__init__.py:1 — subfolders unet/ vae/ text_encoder/ image_encoder/
tokenizer/ scheduler/) and converts each torch state dict into the
channels-last flax layout used here.

Tensor transforms:
  * Linear weight [out, in]        -> kernel [in, out]
  * Conv2d weight [O, I, kh, kw]   -> kernel [kh, kw, I, O]
  * Conv3d weight [O, I, kt, kh, kw] -> kernel [kt, kh, kw, I, O]
  * norm weight/bias               -> scale/bias
  * Embedding weight               -> embedding (no transpose)

Key transforms map the torch module paths onto our flax names (documented
per model below).  Conversion is strict: every checkpoint tensor must land
on an existing flax param with a matching shape, and every flax param must
be covered — mismatches raise with a full diff so checkpoint drift is loud.
"""

from __future__ import annotations

import json
import logging
import os
import re
from typing import Callable, Dict

import numpy as np

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# state-dict loading
# ---------------------------------------------------------------------------


def load_torch_state_dict(subdir: str) -> Dict[str, np.ndarray]:
    """Load a model subfolder's weights (safetensors preferred, .bin fallback,
    fp16 variants accepted) into numpy fp32."""
    candidates = []
    for name in os.listdir(subdir):
        if name.endswith(".safetensors") or name.endswith(".bin"):
            candidates.append(name)
    if not candidates:
        raise FileNotFoundError(f"no weight files in {subdir}")
    # prefer safetensors, prefer fp16 variants last in name sort stability
    candidates.sort(key=lambda n: (not n.endswith(".safetensors"), n))
    path = os.path.join(subdir, candidates[0])
    logger.info("loading %s", path)
    out: Dict[str, np.ndarray] = {}
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = np.asarray(f.get_tensor(k), dtype=np.float32)
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        for k, v in sd.items():
            out[k] = v.to(torch.float32).numpy()
    return out


# ---------------------------------------------------------------------------
# generic machinery
# ---------------------------------------------------------------------------

_NORM_HINTS = ("norm", "layer_norm", "layernorm", "layrnorm")
_EMBED_HINTS = ("token_embedding", "position_embedding")


def _tensor_transform(flax_path: list[str], leaf: str, value: np.ndarray) -> tuple[str, np.ndarray]:
    """Map (torch leaf name, tensor) -> (flax leaf name, transformed)."""
    parent = flax_path[-1] if flax_path else ""
    if leaf == "bias":
        return "bias", value
    assert leaf == "weight", f"unexpected leaf {leaf} at {flax_path}"
    if any(h in parent for h in _EMBED_HINTS):
        return "embedding", value
    if value.ndim == 1:
        return "scale", value
    if value.ndim == 2:
        return "kernel", value.T
    if value.ndim == 4:
        return "kernel", value.transpose(2, 3, 1, 0)
    if value.ndim == 5:
        return "kernel", value.transpose(2, 3, 4, 1, 0)
    raise ValueError(f"cannot transform rank-{value.ndim} tensor at {flax_path}")


def _set(tree: dict, path: list[str], leaf: str, value: np.ndarray):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    key_fn: Callable[[str], list[str] | None],
) -> dict:
    """Apply key_fn to every torch key (returning the flax module path or
    None to drop) and build the nested params dict."""
    tree: dict = {}
    for k, v in sd.items():
        parts = k.split(".")
        leaf = parts[-1]
        if leaf == "position_ids":  # HF buffer, not a parameter
            continue
        if leaf not in ("weight", "bias"):
            # raw nn.Parameter (e.g. CLIP vision class_embedding): the leaf
            # name is part of the module path; store under a generic slot
            # that _fix_clip_raw_params unwraps.
            parts = parts + ["weight"]
            leaf = "weight"
        path = key_fn(".".join(parts[:-1]))
        if path is None:
            continue
        if any(h in path[-1] for h in _EMBED_HINTS) and leaf == "weight" and len(path) >= 1:
            # raw-param embeddings (position_embedding in our CLIP) live as
            # arrays, not submodules with an 'embedding' leaf
            pass
        new_leaf, val = _tensor_transform(path, leaf, v)
        _set(tree, path[:-1] if new_leaf == "__raw__" else path, new_leaf, val)
    return tree


def _merge_int_segments(parts: list[str]) -> list[str]:
    """['down_blocks','0','resnets','1'] -> ['down_blocks_0','resnets_1']"""
    out: list[str] = []
    for p in parts:
        if re.fullmatch(r"\d+", p) and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return out


def verify_tree(converted: dict, expected: dict, ctx: str = "") -> None:
    """Strict structural + shape comparison of converted vs model-init params."""

    def flatten(d, prefix=""):
        out = {}
        for k, v in d.items():
            kk = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out.update(flatten(v, kk))
            else:
                out[kk] = tuple(np.shape(v))
        return out

    got, want = flatten(converted), flatten(expected)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    bad_shape = sorted(
        k for k in set(got) & set(want) if got[k] != want[k]
    )
    if missing or extra or bad_shape:
        msg = [f"checkpoint conversion mismatch ({ctx}):"]
        if missing:
            msg.append(f"  missing ({len(missing)}): {missing[:12]}")
        if extra:
            msg.append(f"  extra ({len(extra)}): {extra[:12]}")
        if bad_shape:
            msg.append(
                "  shape mismatches: "
                + ", ".join(f"{k}: got {got[k]} want {want[k]}" for k in bad_shape[:12])
            )
        raise ValueError("\n".join(msg))


# ---------------------------------------------------------------------------
# per-model key maps
# ---------------------------------------------------------------------------


def unet_key_fn(path: str) -> list[str] | None:
    """diffusers I2VGenXLUNet keys -> mvoc_tpu I2VGenXLUNet names."""
    parts = _merge_int_segments(path.split("."))
    joined = "/".join(parts)
    # sequential conv towers: keep torch indices as flat names
    for tower in ("image_latents_proj_in", "image_latents_context_embedding",
                  "context_embedding"):
        m = re.fullmatch(rf"{tower}_(\d+)", joined)
        if m:
            return [f"{tower}_{m.group(1)}"]
    # TemporalConvLayer: convN.0 = GroupNorm, convN.2 = Conv3d
    joined = re.sub(r"(temp_convs_\d+)/(conv\d)_0", r"\1/\2_norm", joined)
    joined = re.sub(r"(temp_convs_\d+)/(conv\d)_2", r"\1/\2_conv", joined)
    # attention output projection: to_out.0
    joined = joined.replace("/to_out_0", "/to_out_0")
    # feed-forward GEGLU: ff.net.0.proj / ff.net.2
    joined = joined.replace("/ff/net_0/proj", "/ff/net_0_proj")
    # time/fps embeddings keep names (linear_1/linear_2)
    return joined.split("/")


def vae_key_fn(path: str) -> list[str] | None:
    """diffusers AutoencoderKL keys -> mvoc_tpu AutoencoderKL names.

    Our encoder/decoder flatten block-level modules into compound names
    (down_blocks_0_resnets_1, up_blocks_2_upsamplers_0_conv); mid_block
    keeps nesting."""
    parts = _merge_int_segments(path.split("."))
    if parts[0] in ("quant_conv", "post_quant_conv"):
        return parts
    tower, rest = parts[0], parts[1:]
    assert tower in ("encoder", "decoder"), path
    if not rest:
        return parts
    if rest[0] in ("conv_in", "conv_norm_out", "conv_out"):
        return [tower] + rest
    if rest[0] == "mid_block":
        return [tower] + rest
    # down_blocks_0 / resnets_1 / norm1 -> down_blocks_0_resnets_1 / norm1
    # down_blocks_0 / downsamplers_0 / conv -> down_blocks_0_downsamplers_0_conv
    if "samplers" in rest[1]:
        return [tower, "_".join(rest[:3])] + rest[3:]
    return [tower, "_".join(rest[:2])] + rest[2:]


def clip_text_key_fn(path: str) -> list[str] | None:
    """HF CLIPTextModel keys -> mvoc_tpu CLIPTextModel names."""
    parts = path.split(".")
    if parts[0] == "text_model":
        parts = parts[1:]
    if not parts:
        return None
    if parts[0] == "embeddings":
        # embeddings.token_embedding -> token_embedding (nn.Embed)
        # embeddings.position_embedding -> raw param
        return [parts[1]]
    if parts[0] == "encoder":
        parts = parts[1:]  # encoder.layers.N...
    parts = _merge_int_segments(parts)
    joined = "/".join(parts)
    joined = joined.replace("/mlp/fc1", "/mlp_fc1").replace("/mlp/fc2", "/mlp_fc2")
    return joined.split("/")


def clip_vision_key_fn(path: str) -> list[str] | None:
    """HF CLIPVisionModelWithProjection keys -> mvoc_tpu names."""
    parts = path.split(".")
    if parts[0] == "visual_projection":
        return ["visual_projection"]
    if parts[0] == "vision_model":
        parts = parts[1:]
    if not parts:
        return None
    if parts[0] == "embeddings":
        return [parts[1]]  # class_embedding / patch_embedding / position_embedding
    if parts[0] == "encoder":
        parts = parts[1:]
    parts = _merge_int_segments(parts)
    joined = "/".join(parts)
    joined = joined.replace("/mlp/fc1", "/mlp_fc1").replace("/mlp/fc2", "/mlp_fc2")
    return joined.split("/")


def _fix_clip_raw_params(tree: dict) -> dict:
    """position_embedding / class_embedding are raw arrays in our models,
    not Embed submodules."""
    if "position_embedding" in tree and isinstance(tree["position_embedding"], dict):
        tree["position_embedding"] = tree["position_embedding"]["embedding"]
    if "class_embedding" in tree and isinstance(tree["class_embedding"], dict):
        # stored as 1-D weight
        v = tree["class_embedding"]
        tree["class_embedding"] = v.get("scale", v.get("embedding"))
    return tree


# ---------------------------------------------------------------------------
# top-level loader
# ---------------------------------------------------------------------------


def load_pipeline(checkpoint_dir: str, dtype=None):
    """Build a fully-initialized I2VGenXLPipeline from an HF checkpoint."""
    import jax
    import jax.numpy as jnp

    from mvoc_tpu.models.clip import (
        CLIPTextConfig, CLIPTextModel, CLIPVisionConfig, CLIPVisionModelWithProjection)
    from mvoc_tpu.models.unet_i2vgen import I2VGenXLUNet, UNetConfig
    from mvoc_tpu.models.vae import AutoencoderKL, VAEConfig
    from mvoc_tpu.ops.ddim import SchedulerConfig
    from mvoc_tpu.pipeline.i2vgen import I2VGenXLPipeline

    dtype = dtype or jnp.bfloat16

    unet_cfg = UNetConfig.from_pretrained(checkpoint_dir)
    vae_cfg = VAEConfig.from_pretrained(checkpoint_dir)
    text_cfg = CLIPTextConfig.from_json(os.path.join(checkpoint_dir, "text_encoder", "config.json"))
    vision_cfg = CLIPVisionConfig.from_json(os.path.join(checkpoint_dir, "image_encoder", "config.json"))
    sched_cfg = SchedulerConfig.from_pretrained(checkpoint_dir)

    unet = I2VGenXLUNet(unet_cfg, dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    text = CLIPTextModel(text_cfg, dtype=dtype)
    vision = CLIPVisionModelWithProjection(vision_cfg, dtype=dtype)

    params = {
        "unet": {"params": convert_state_dict(
            load_torch_state_dict(os.path.join(checkpoint_dir, "unet")), unet_key_fn)},
        "vae": {"params": convert_state_dict(
            load_torch_state_dict(os.path.join(checkpoint_dir, "vae")), vae_key_fn)},
        "text_encoder": {"params": _fix_clip_raw_params(convert_state_dict(
            load_torch_state_dict(os.path.join(checkpoint_dir, "text_encoder")),
            clip_text_key_fn))},
        "image_encoder": {"params": _fix_clip_raw_params(convert_state_dict(
            load_torch_state_dict(os.path.join(checkpoint_dir, "image_encoder")),
            clip_vision_key_fn))},
    }

    # structural verification against abstract init (no FLOPs: eval_shape)
    f, hw = 2, 8 * vae_cfg.downscale_factor
    lat = hw // vae_cfg.downscale_factor
    d = unet_cfg.cross_attention_dim

    def init_unet():
        return unet.init(
            jax.random.key(0),
            sample=jnp.zeros((1, f, lat, lat, 4)),
            timestep=jnp.zeros((1,), jnp.int32),
            fps=jnp.zeros((1,), jnp.int32),
            image_latents_first=jnp.zeros((1, f, lat, lat, 4)),
            image_latents=jnp.zeros((1, f, lat, lat, 4)),
            image_embeddings=jnp.zeros((1, f, d)),
            encoder_hidden_states=jnp.zeros((1, 77, d)),
        )

    expected_unet = jax.eval_shape(init_unet)
    verify_tree(params["unet"]["params"], expected_unet["params"], "unet")
    expected_vae = jax.eval_shape(lambda: vae.init(jax.random.key(0), jnp.zeros((1, hw, hw, 3))))
    verify_tree(params["vae"]["params"], expected_vae["params"], "vae")
    expected_text = jax.eval_shape(
        lambda: text.init(jax.random.key(0), jnp.zeros((1, 7), jnp.int32)))
    verify_tree(params["text_encoder"]["params"], expected_text["params"], "text_encoder")
    expected_vision = jax.eval_shape(
        lambda: vision.init(
            jax.random.key(0),
            jnp.zeros((1, vision_cfg.image_size, vision_cfg.image_size, 3))))
    verify_tree(params["image_encoder"]["params"], expected_vision["params"], "image_encoder")

    params = jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), params)

    tokenizer = None
    tok_dir = os.path.join(checkpoint_dir, "tokenizer")
    if os.path.isdir(tok_dir):
        from transformers import CLIPTokenizer

        tokenizer = CLIPTokenizer.from_pretrained(tok_dir)

    return I2VGenXLPipeline(
        unet=unet, vae=vae, text_encoder=text, image_encoder=vision,
        params=params, scheduler_config=sched_cfg, tokenizer=tokenizer, dtype=dtype,
    )

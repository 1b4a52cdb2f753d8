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
# geometry inference (no silent mis-wires on real checkpoints)
# ---------------------------------------------------------------------------


def infer_unet_geometry(sd: Dict[str, np.ndarray], cfg):
    """Derive attention geometry from the checkpoint's tensor SHAPES instead
    of trusting hardcoded assumptions (the reference relies on diffusers'
    in-code constants: 8-head transformer_in, 2-head
    I2VGenXLTransformerTemporalEncoder — neither is in config.json).

    Shape-observable facts:
      * transformer_in inner dim  = to_q out rows -> per-head dim given the
        8-head constant (validated divisible),
      * temporal-encoder inner dim = its to_q out rows -> per-head dim,
      * per-block attention inner dims must equal block channels (validates
        the heads = channels // attention_head_dim rule from config.json).
    Returns a config with the shape-derived fields filled in; raises when a
    shape contradicts the assumed head counts."""
    import dataclasses

    def out_rows(key):
        if key not in sd:
            raise KeyError(f"geometry probe missing from checkpoint: {key}")
        return int(sd[key].shape[0])

    ti_inner = out_rows("transformer_in.transformer_blocks.0.attn1.to_q.weight")
    if ti_inner % cfg.transformer_in_heads != 0:
        raise ValueError(
            f"transformer_in inner dim {ti_inner} not divisible by the "
            f"assumed {cfg.transformer_in_heads} heads")
    enc_inner = out_rows("image_latents_temporal_encoder.attn1.to_q.weight")
    if enc_inner % cfg.img_temporal_encoder_heads != 0:
        raise ValueError(
            f"image_latents_temporal_encoder inner dim {enc_inner} not "
            f"divisible by the assumed {cfg.img_temporal_encoder_heads} heads")

    # validate the heads = ch // attention_head_dim rule at every
    # cross-attention block resolution
    for blk, ch in (("down_blocks.0.attentions.0", cfg.block_out_channels[0]),
                    ("down_blocks.1.attentions.0", cfg.block_out_channels[1]),
                    ("mid_block.attentions.0", cfg.block_out_channels[-1])):
        key = f"{blk}.transformer_blocks.0.attn1.to_q.weight"
        if key in sd:
            inner = int(sd[key].shape[0])
            if inner != ch:
                raise ValueError(
                    f"{blk}: attention inner dim {inner} != block channels "
                    f"{ch} — the heads = channels//attention_head_dim rule "
                    f"does not hold for this checkpoint")
            if ch % cfg.attention_head_dim != 0:
                raise ValueError(
                    f"{blk}: channels {ch} not divisible by "
                    f"attention_head_dim {cfg.attention_head_dim}")

    cfg = dataclasses.replace(
        cfg,
        transformer_in_head_dim=ti_inner // cfg.transformer_in_heads,
        img_temporal_encoder_head_dim=enc_inner // cfg.img_temporal_encoder_heads,
    )
    logger.info(
        "unet geometry from checkpoint shapes: transformer_in %dx%d, "
        "temporal encoder %dx%d", cfg.transformer_in_heads,
        cfg.transformer_in_head_dim, cfg.img_temporal_encoder_heads,
        cfg.img_temporal_encoder_head_dim)
    return cfg


def verify_activations(pipe, seed: int = 0) -> dict:
    """Run every loaded model on deterministic inputs with flax
    capture_intermediates and check per-module activation statistics: any
    non-finite intermediate raises (loud failure instead of silently-wrong
    outputs); zero-variance modules are logged as suspects.  Returns
    {model/module_path: (mean, std)} for reporting."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    stats: dict[str, tuple[float, float]] = {}
    suspects: list[str] = []

    def collect(tag, variables):
        flat = jax.tree_util.tree_flatten_with_path(
            variables.get("intermediates", {}))[0]
        for path, leaf in flat:
            name = tag + "/" + "/".join(
                p.key if hasattr(p, "key") else str(p) for p in path)
            arr = np.asarray(leaf, dtype=np.float32)
            if not np.isfinite(arr).all():
                raise ValueError(
                    f"non-finite activation at {name} — checkpoint "
                    f"conversion produced a broken module")
            m, s = float(arr.mean()), float(arr.std())
            stats[name] = (m, s)
            if s == 0.0 and arr.size > 1:
                suspects.append(name)

    f, d = 2, pipe.unet.config.cross_attention_dim
    lat = 8
    mk = lambda *sh: jnp.asarray(
        rng.standard_normal(sh), dtype=pipe.dtype)
    _, v = pipe.unet.apply(
        pipe.params["unet"],
        sample=mk(1, f, lat, lat, pipe.unet.config.in_channels),
        timestep=jnp.asarray([501]), fps=jnp.asarray([8]),
        image_latents_first=mk(1, f, lat, lat, pipe.unet.config.in_channels),
        image_latents=mk(1, f, lat, lat, pipe.unet.config.in_channels),
        image_embeddings=mk(1, f, d),
        encoder_hidden_states=mk(1, 77, d),
        capture_intermediates=True, mutable=["intermediates"])
    collect("unet", v)

    hw = 8 * pipe.vae_scale_factor
    _, v = pipe.vae.apply(
        pipe.params["vae"], mk(1, hw, hw, 3),
        capture_intermediates=True, mutable=["intermediates"])
    collect("vae", v)

    vocab = pipe.text_encoder.config.vocab_size
    ids = jnp.asarray(rng.integers(0, vocab, (1, 7)), jnp.int32)
    _, v = pipe.text_encoder.apply(
        pipe.params["text_encoder"], ids,
        capture_intermediates=True, mutable=["intermediates"])
    collect("text_encoder", v)

    sz = pipe.clip_image_size
    _, v = pipe.image_encoder.apply(
        pipe.params["image_encoder"], mk(1, sz, sz, 3),
        capture_intermediates=True, mutable=["intermediates"])
    collect("image_encoder", v)

    if suspects:
        logger.warning("zero-variance activations (check wiring): %s",
                       suspects[:20])
    logger.info("activation verify OK: %d modules finite", len(stats))
    return stats


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

    # derive the non-config attention geometry from the checkpoint's own
    # tensor shapes (raises on contradiction — no silent mis-wires)
    unet_sd = load_torch_state_dict(os.path.join(checkpoint_dir, "unet"))
    unet_cfg = infer_unet_geometry(unet_sd, unet_cfg)

    unet = I2VGenXLUNet(unet_cfg, dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    text = CLIPTextModel(text_cfg, dtype=dtype)
    vision = CLIPVisionModelWithProjection(vision_cfg, dtype=dtype)

    params = {
        "unet": {"params": convert_state_dict(unet_sd, unet_key_fn)},
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


def main():
    """CLI: convert + verify a checkpoint without running a pipeline job.

      python -m mvoc_tpu.models.convert <checkpoint_dir> [--verify]

    --verify additionally runs every module on deterministic inputs and
    checks per-module activation statistics (verify_activations)."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint_dir")
    ap.add_argument("--verify", action="store_true",
                    help="run per-module activation statistics")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    if args.checkpoint_dir == "tiny":
        # playbook smoke (docs/FIRST_HOUR_WITH_WEIGHTS.md step 1 with
        # `tiny`): no conversion happens — this exercises the pipeline
        # build + --verify activation pass so the playbook's command
        # surface cannot decay while real weights are absent
        from mvoc_tpu.utils.testing import build_tiny_pipeline

        print("tiny mode: random-weight pipeline (no checkpoint conversion)")
        pipe = build_tiny_pipeline()
    else:
        pipe = load_pipeline(args.checkpoint_dir)
    import jax

    n_params = sum(int(np.prod(np.shape(x)))
                   for x in jax.tree_util.tree_leaves(pipe.params))
    print(f"conversion OK: {n_params / 1e9:.3f}B parameters "
          f"(unet geometry: transformer_in "
          f"{pipe.unet.config.transformer_in_heads}x"
          f"{pipe.unet.config.transformer_in_head_dim}, temporal encoder "
          f"{pipe.unet.config.img_temporal_encoder_heads}x"
          f"{pipe.unet.config.img_temporal_encoder_head_dim})")
    if args.verify:
        stats = verify_activations(pipe)
        worst = sorted(stats.items(), key=lambda kv: -abs(kv[1][0]))[:10]
        for name, (m, s) in worst:
            print(f"  {name}: mean {m:+.4f} std {s:.4f}")
        print(f"activation verify OK: {len(stats)} modules finite")


if __name__ == "__main__":
    main()

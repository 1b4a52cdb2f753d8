"""Shared CLI plumbing: argparse, logging, pipeline construction.

Mirrors the reference drivers' config surface (reference: inverse.py:230-255,
composite.py:227-255): an OmegaConf-style template YAML + a JSON list of
per-job overrides, `active` flags, `ReplaceMe` sentinels — the reference's
own config files run unchanged."""

from __future__ import annotations

import argparse
import logging
import os

from mvoc_tpu import config as cfglib

logger = logging.getLogger("mvoc_tpu")

DEFAULT_CHECKPOINT = "./checkpoints/i2vgen-xl"


def parse_args(default_template: str):
    p = argparse.ArgumentParser()
    p.add_argument("--template_config", type=str, default=default_template)
    p.add_argument("--configs_json", type=str, required=True)
    p.add_argument(
        "--checkpoint", type=str, default=None,
        help="HF i2vgen-xl checkpoint dir (default ./checkpoints/i2vgen-xl; "
        "'tiny' builds a random tiny pipeline for smoke runs)",
    )
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler (TensorBoard) trace here")
    p.add_argument(
        "--mesh", type=str, default=None,
        help="shard the pipeline over a device mesh: an int device count or "
        "'auto' (all visible devices); overrides the template's mesh_devices",
    )
    p.add_argument(
        "--batch", action="store_true",
        help="batch same-signature entries as one program: (inverse) all "
        "uncached videos ride the UNet batch axis as one scan; (composite) "
        "matching group-config entries ride a vmapped job axis — both shard "
        "over the mesh 'job' axis under --mesh",
    )
    p.add_argument(
        "--mesh_seq", type=int, default=None,
        help="frame-parallel ('seq') width of the mesh; rest is tensor "
        "parallelism (default: min(n, 4))",
    )
    p.add_argument(
        "--mesh_job", type=int, default=None,
        help="independent-video ('job') width of the mesh (pairs with "
        "--batch; default 1)",
    )
    return p.parse_args()


def setup_logging(template_cfg) -> None:
    level = logging.DEBUG if template_cfg.get("debug", False) else logging.INFO
    logging.basicConfig(
        level=level,
        format="%(asctime)s - %(levelname)s - [%(funcName)s] - %(message)s",
    )


def load_configs(args):
    template = cfglib.load(args.template_config)
    entries = cfglib.load_json_list(args.configs_json)
    return template, entries


def build_pipeline(args, template_cfg):
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    ckpt = args.checkpoint or template_cfg.get("pretrained_model_path", DEFAULT_CHECKPOINT)
    if ckpt == "tiny":
        from mvoc_tpu.utils.testing import build_tiny_pipeline

        logger.warning("building TINY random pipeline (smoke mode)")
        return build_tiny_pipeline(dtype=jnp.float32)
    if not os.path.isdir(ckpt):
        raise FileNotFoundError(
            f"checkpoint dir not found: {ckpt} (pass --checkpoint, set "
            "pretrained_model_path in the template, or use --checkpoint tiny)"
        )
    from mvoc_tpu.pipeline.i2vgen import I2VGenXLPipeline

    return I2VGenXLPipeline.from_pretrained(ckpt, dtype=dtype)


def apply_mesh(pipe, args, template_cfg):
    """Shard the pipeline over a (seq, model) device mesh when requested via
    --mesh / --mesh_seq or the template keys mesh_devices / mesh_seq.
    TPU-native extension — the reference is single-GPU (SURVEY.md §2.4)."""
    import jax

    spec = args.mesh if args.mesh is not None else template_cfg.get("mesh_devices")
    if spec in (None, "", 0, "0", "off", False):
        return pipe
    n = len(jax.devices()) if str(spec) == "auto" else int(spec)
    avail = len(jax.devices())
    if n > avail:
        logger.warning("mesh_devices=%d > %d visible devices — using %d",
                       n, avail, avail)
        n = avail
    seq = args.mesh_seq if args.mesh_seq is not None else template_cfg.get("mesh_seq")
    job = args.mesh_job if args.mesh_job is not None else template_cfg.get("mesh_job")
    pipe = pipe.enable_mesh(n, seq=int(seq) if seq else None,
                            job=int(job) if job else 1)
    cp = template_cfg.get("context_parallel")
    if cp:
        # ring/Ulysses temporal attention over the sharded frame axis
        # (ops/ring_attention; template key `context_parallel: ring|ulysses`)
        import dataclasses

        from mvoc_tpu.models.unet_i2vgen import I2VGenXLUNet

        new_cfg = dataclasses.replace(
            pipe.unet.config, temporal_cp=(str(cp), pipe.mesh))
        pipe.unet = I2VGenXLUNet(new_cfg, dtype=pipe.unet.dtype)
        pipe._build_jits()
        logger.info("temporal context parallelism: %s", cp)
    return pipe


def apply_quantize(pipe, template_cfg):
    """Template key `quantize: int8 | int8_mixed` — w8a8-quantize UNet
    kernels (approximate; pipeline.enable_int8).  `int8_mixed` quantizes
    only the probe-measured winners (1280-tier GEMMs + deep temporal convs
    as s8 stack3 dots); `int8` quantizes everything non-anchoring.  Any
    other value raises; absent or falsy leaves the exact bf16 path
    untouched."""
    q = template_cfg.get("quantize", None)
    if q in (None, "", False, "off", "none"):
        return pipe
    if str(q) not in ("int8", "int8_mixed"):
        raise ValueError(
            f"quantize: {q!r} — supported modes are 'int8' and 'int8_mixed'")
    logger.warning(
        "quantize: %s is an APPROXIMATE mode (w8a8 UNet kernels) — "
        "quantify the drift for your content via bench.py --preset quality "
        "or recon_config.enable_recon before production use", q)
    if str(q) == "int8":
        logger.warning(
            "quantize: int8 (full) is MEASURED SLOWER than bf16 on TPU v5e "
            "(0.45 vs 0.85 steps/s, TPU_RUNS_r04.log int8_default — thin-K "
            "GEMMs and spatial int8 convs lose); prefer 'int8_mixed' (the "
            "measured-winner selection) or int8-native hardware")
    return pipe.enable_int8(mode="mixed" if str(q) == "int8_mixed" else "full")


def check_replaceme(cfg) -> None:
    bad = cfglib.check_no_replaceme(cfg, logger)
    for k in bad:
        logger.error("field %s still contains 'ReplaceMe'", k)


def apply_unet_options(pipe, template_cfg):
    """Apply template-level UNet compute options that don't change params:
    `temporal_window` (windowed temporal attention for long videos) and
    `temporal_natural_layout` (frame-major temporal transformers).  The
    checkpoint's weights are reused as-is — both flags only change how the
    same parameters are applied."""
    import dataclasses

    opts = {}
    if template_cfg.get("temporal_window", None) is not None:
        opts["temporal_window"] = int(template_cfg.get("temporal_window"))
    # frame-major temporal transformers: exact and measured faster in every
    # configuration — DEFAULT ON; `temporal_natural_layout: false` restores
    # the reference's [B*H*W, F, C] token layout
    if template_cfg.get("temporal_natural_layout", True):
        opts["temporal_natural_layout"] = True
    if opts:
        from mvoc_tpu.models.unet_i2vgen import I2VGenXLUNet

        new_cfg = dataclasses.replace(pipe.unet.config, **opts)
        pipe.unet = I2VGenXLUNet(new_cfg, dtype=pipe.unet.dtype)
        pipe._build_jits()
        logger.info("UNet options applied: %s", opts)
    return pipe

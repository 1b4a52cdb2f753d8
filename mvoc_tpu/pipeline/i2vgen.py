"""I2VGen-XL pipeline: host orchestration over the scan-compiled cores.

API-parity layer for the reference's `I2VGenXLPipeline`
(reference: pipelines/pipeline_i2vgen_xl.py:398-2018):
  * `encode_prompt`        (:552-737)  — CLIP text + CFG negatives, clip_skip
  * `encode_image`         (:739-769)  — CLIP vision embeds, zero negative
  * `encode_vae_video`     (:893-920)  — per-frame VAE encode (batched here)
  * `decode_latents`       (:771-791)
  * `prepare_image_latents`(:860-890)  — first-frame latent + position ramp
  * `prepare_latents`      (:922-948)
  * `invert`               (:1750-2018) — DDIM inversion -> trajectory store
  * `sample` (= __call__)  (:978-1216)  — truncated-start DDIM sampling
  * `sample_composite` (= sample_with_pnp_pipeline_with_edit_prompt_
     extraction_with_attn_injection, :1220-1748) — the MVOC sampler

Differences by design (TPU-first):
  * pure functions + explicit jax.random keys (no hidden generator state),
  * the denoising loops are single compiled scans; trajectories live in HBM,
  * the trajectory store is one stacked npz, not 500 torch files (it can
    still read the reference's .pt layout).
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from mvoc_tpu.io import media
from mvoc_tpu.io.trajectory import TrajectoryStore
from mvoc_tpu.models.clip import (
    CLIPTextModel,
    CLIPVisionModelWithProjection,
    normalize_clip_image,
)
from mvoc_tpu.models.unet_i2vgen import I2VGenXLUNet
from mvoc_tpu.models.vae import AutoencoderKL, sample_latents
from mvoc_tpu.ops.ddim import DDIM, SchedulerConfig, inversion_timesteps, sampling_timesteps
from mvoc_tpu import pnp as pnp_lib
from mvoc_tpu.pipeline import core

logger = logging.getLogger(__name__)


class I2VGenXLPipeline:
    """Holds the model modules + params and exposes the reference's
    pipeline-level entry points.  Batch size 1 (like the reference's actual
    usage; multi-sample batching is a sharding axis, see parallel/)."""

    def __init__(
        self,
        unet: I2VGenXLUNet,
        vae: AutoencoderKL,
        text_encoder: CLIPTextModel,
        image_encoder: CLIPVisionModelWithProjection,
        params: dict[str, Any],
        scheduler_config: SchedulerConfig,
        tokenizer=None,
        dtype: jnp.dtype = jnp.float32,
    ):
        self.unet = unet
        self.vae = vae
        self.text_encoder = text_encoder
        self.image_encoder = image_encoder
        self.params = params
        self.scheduler_config = scheduler_config
        self.ddim = DDIM(scheduler_config)
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.vae_scale_factor = vae.config.downscale_factor
        self.vae_scaling = vae.config.scaling_factor
        self.clip_image_size = image_encoder.config.image_size
        self.freeu = None  # set via enable_freeu
        self.mesh = None   # set via enable_mesh
        self.vae_tiling = None  # set via enable_vae_tiling

        self._build_jits()

    # ------------------------------------------------------------------
    # multi-chip mesh (TPU-native; no counterpart in the single-GPU
    # reference — SURVEY.md §2.4)
    # ------------------------------------------------------------------

    def enable_mesh(self, n_devices: Optional[int] = None,
                    seq: Optional[int] = None, devices=None,
                    job: int = 1) -> "I2VGenXLPipeline":
        """Shard the pipeline over a (job, seq, model) device mesh.

        "job" = data parallelism over independent videos (invert_batch),
        "seq" = frame-axis context parallelism (temporal attention), "model"
        = Megatron-style tensor parallelism over attention/MLP channels (see
        parallel/mesh.py).  Params are placed with TP shardings; every video
        tensor entering the compiled cores is sharded on its frame axis.
        Degrades to a no-op 1x1x1 mesh on a single device, so the same code
        path runs on 1 real chip and the virtual 8-device CPU CI mesh."""
        from mvoc_tpu.parallel import mesh as pm

        mesh = pm.make_mesh(n_devices, seq=seq, devices=devices, job=job)
        self.mesh = mesh
        if mesh.size > 1:
            # thread the mesh into the UNet config: Pallas attention kernels
            # then dispatch inside shard_map over it (ops/attention.sharded_*)
            # instead of being left as opaque custom-calls GSPMD would
            # replicate around.  Config-threaded, not a process global — one
            # pipeline's mesh cannot affect another's dispatch.
            import dataclasses

            from mvoc_tpu.models.unet_i2vgen import I2VGenXLUNet

            self.unet = I2VGenXLUNet(
                dataclasses.replace(self.unet.config, attn_mesh=mesh),
                dtype=self.unet.dtype)
            self._build_jits()
        self.params = dict(self.params)
        self.params["unet"] = pm.shard_params(self.params["unet"], mesh)
        for k in ("vae", "text_encoder", "image_encoder"):
            if k in self.params:
                self.params[k] = jax.device_put(self.params[k], pm.replicated(mesh))
        logger.info("mesh enabled: %s", dict(mesh.shape))
        return self

    def disable_mesh(self) -> "I2VGenXLPipeline":
        if self.mesh is not None:
            dev = jax.devices()[0]
            self.params = jax.device_put(self.params, dev)
            self.mesh = None
            if self.unet.config.attn_mesh is not None:
                import dataclasses

                from mvoc_tpu.models.unet_i2vgen import I2VGenXLUNet

                self.unet = I2VGenXLUNet(
                    dataclasses.replace(self.unet.config, attn_mesh=None),
                    dtype=self.unet.dtype)
                self._build_jits()
        return self

    def enable_int8(self, predicate=None, mode: str = "full") -> "I2VGenXLPipeline":
        """Quantize the UNet's conv/dense kernels to int8 (w8a8).

        `mode="mixed"` quantizes only the measured int8 winners (1280-tier
        GEMMs + deep (3,1,1) temporal convs as s8 stack3 dots —
        ops/quantize.mixed_unet_predicate, the r5 probe's precise int8
        boundary on v5e); `mode="full"` quantizes per
        `default_unet_predicate` (measured 1.9x SLOWER than bf16 on v5e —
        kept for int8-native hardware + drift studies).

        An APPROXIMATE acceleration mode in the same contract as
        capture/encoder reuse (drift quantified by utils/quality; the torch
        reference computes in fp16 throughout — inverse.py:113-118).  The
        v5e MXU runs s8 x s8 -> s32 at 2x the bf16 rate and the UNet step is
        ~100% matmul-class flops, so this targets the exact-path ceiling.

        A load-time param transform only: QuantConv/QuantDense dispatch on
        the kernel leaf type (ops/quantize.py), the module tree and every
        downstream jit stay as-built.  VAE/CLIP towers stay bf16 — they run
        once per video, and VAE decode quality gates the output.  Layers
        whose precision anchors the eps-prediction (time/fps embeddings,
        conv_out) keep bf16 by default; pass `predicate(names)->bool` to
        override the selection."""
        if self.mesh is not None and self.mesh.size > 1:
            raise NotImplementedError(
                "call enable_int8 BEFORE enable_mesh: parallel.mesh."
                "shard_params places QuantizedTensor leaves with TP "
                "shardings (int32 accumulation is associative, so sharded "
                "w8a8 stays bit-exact), but re-quantizing already-sharded "
                "params is not supported")
        from mvoc_tpu.ops.quantize import (default_unet_predicate,
                                           mixed_unet_predicate,
                                           quantize_params)

        if mode not in ("full", "mixed"):
            raise ValueError(f"enable_int8 mode {mode!r}: 'full' or 'mixed'")
        pred = predicate if predicate is not None else (
            mixed_unet_predicate if mode == "mixed" else default_unet_predicate)
        self.params = dict(self.params)
        self.params["unet"] = jax.jit(
            lambda p: quantize_params(p, predicate=pred))(self.params["unet"])
        logger.info("UNet params quantized to int8 (w8a8, %s selection)", mode)
        return self

    def _shard_video(self, x: jax.Array, frame_axis: int = 0) -> jax.Array:
        """Place a video tensor's frame axis over the mesh "seq" axis
        (no-op without a mesh or when frames don't divide)."""
        if self.mesh is None:
            return x
        from mvoc_tpu.parallel import mesh as pm

        return pm.shard_video(jnp.asarray(x), self.mesh, frame_axis=frame_axis)

    def _shard_cond(self, cond: core.UNetConditioning) -> core.UNetConditioning:
        if self.mesh is None:
            return cond
        import dataclasses

        return dataclasses.replace(
            cond,
            image_latents_first=self._shard_video(cond.image_latents_first, 1),
            image_latents=self._shard_video(cond.image_latents, 1),
        )

    def enable_freeu(self, s1: float, s2: float, b1: float, b2: float) -> None:
        """FreeU up-block re-weighting (reference passthrough:
        pipeline_i2vgen_xl.py:950-976)."""
        from mvoc_tpu.models.unet_i2vgen import FreeUConfig

        self.freeu = FreeUConfig(s1=s1, s2=s2, b1=b1, b2=b2)
        self._build_jits()  # freeu is captured at trace time

    def disable_freeu(self) -> None:
        self.freeu = None
        self._build_jits()

    def _build_jits(self):
        # jitted model entry points (compiled per input signature)
        self._vae_encode = jax.jit(
            lambda p, x: self.vae.apply(p, x, method=AutoencoderKL.encode)
        )
        self._vae_decode = jax.jit(
            lambda p, z: self.vae.apply(p, z, method=AutoencoderKL.decode)
        )
        self._text_apply = jax.jit(
            lambda p, ids, skip: self.text_encoder.apply(p, ids, clip_skip=skip),
            static_argnums=(2,),
        )
        self._vision_apply = jax.jit(self.image_encoder.apply)
        freeu = self.freeu
        self._unet_apply = lambda p, **kw: self.unet.apply(p, **kw, freeu=freeu)
        self._invert_core = jax.jit(
            lambda p, x0, cond, ts, n, g: core.ddim_inversion_core(
                self._unet_apply, self.ddim, p, x0, cond, ts, n, g
            ),
            static_argnums=(4, 5),
        )
        self._sample_core = jax.jit(
            lambda p, lat, cond, ts, n, g: core.ddim_sampling_core(
                self._unet_apply, self.ddim, p, lat, cond, ts, n, g
            ),
            static_argnums=(4, 5),
        )

    @staticmethod
    def from_pretrained(checkpoint_dir: str, dtype=jnp.bfloat16) -> "I2VGenXLPipeline":
        """Build from an HF I2VGen-XL checkpoint directory (the same layout
        the reference loads — reference: inverse.py:113-118)."""
        from mvoc_tpu.models import convert

        return convert.load_pipeline(checkpoint_dir, dtype=dtype)

    # ------------------------------------------------------------------
    # encoders
    # ------------------------------------------------------------------

    def tokenize(self, prompts: Sequence[str]) -> np.ndarray:
        if self.tokenizer is None:
            raise ValueError("pipeline has no tokenizer; pass prompt_embeds")
        out = self.tokenizer(
            list(prompts), padding="max_length",
            max_length=self.tokenizer.model_max_length,
            truncation=True, return_tensors="np",
        )
        return out["input_ids"]

    def encode_prompt(
        self,
        prompt: str | Sequence[str],
        negative_prompt: Optional[str | Sequence[str]] = None,
        do_cfg: bool = True,
        clip_skip: int = 1,
        prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, Optional[jax.Array]]:
        """Returns (prompt_embeds, negative_prompt_embeds) [B, 77, D].
        clip_skip=1 (penultimate layer) is the reference default
        (pipeline_i2vgen_xl.py:1773, 1246)."""
        if prompt_embeds is None:
            prompts = [prompt] if isinstance(prompt, str) else list(prompt)
            ids = jnp.asarray(self.tokenize(prompts))
            prompt_embeds = self._text_apply(self.params["text_encoder"], ids, clip_skip)
        if do_cfg and negative_prompt_embeds is None:
            neg = negative_prompt or ""
            negs = [neg] if isinstance(neg, str) else list(neg)
            ids = jnp.asarray(self.tokenize(negs))
            negative_prompt_embeds = self._text_apply(self.params["text_encoder"], ids, clip_skip)
        return prompt_embeds, negative_prompt_embeds

    def encode_image(self, image: Image.Image, width: int) -> jax.Array:
        """CLIP image embedding of one frame: square center-crop to
        (width, width) then bilinear 224 (reference:
        pipeline_i2vgen_xl.py:1890-1894) -> [1, D_img]."""
        cropped = media.center_crop_wide(image, (width, width))
        resized = media.resize_bilinear(cropped, (self.clip_image_size, self.clip_image_size))
        px = media.pil_to_01([resized])
        px = normalize_clip_image(jnp.asarray(px, dtype=self.dtype))
        return self._vision_apply(self.params["image_encoder"], px)

    def encode_frames(
        self,
        frames: Sequence[Image.Image],
        width: int,
        strict_reference_crop: bool = True,
    ) -> jax.Array:
        """Per-frame CLIP embeddings [F, D_img] (the composite sampler embeds
        every control frame — reference: pipeline_i2vgen_xl.py:1416-1427).

        Quirk, replicated by default: the reference computes a center crop
        and then DISCARDS it, bilinear-resizing the UNCROPPED frame into the
        CLIP input (`_resize_bilinear(image, ...)` right after computing
        `cropped_image` — pipeline_i2vgen_xl.py:1505-1508, 1420-1423,
        455-458).  This affects every control-frame embedding in the
        composite stage.  strict_reference_crop=False resizes the crop
        instead (the presumably-intended behavior, matching the single-frame
        path at :1116-1118)."""
        if strict_reference_crop:
            crops = [
                media.resize_bilinear(f, (self.clip_image_size, self.clip_image_size))
                for f in frames
            ]
        else:
            crops = [
                media.resize_bilinear(
                    media.center_crop_wide(f, (width, width)),
                    (self.clip_image_size, self.clip_image_size),
                )
                for f in frames
            ]
        px = normalize_clip_image(jnp.asarray(media.pil_to_01(crops), dtype=self.dtype))
        return self._vision_apply(self.params["image_encoder"], px)

    # ------------------------------------------------------------------
    # VAE
    # ------------------------------------------------------------------

    def encode_vae_video(
        self,
        frames: Sequence[Image.Image],
        height: int,
        width: int,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """[F, h, w, C] scaled latents. The reference encodes per-frame with
        `latent_dist.sample()` (pipeline_i2vgen_xl.py:905-914); we batch all
        frames into one VAE call and sample with an explicit key (mean if
        key is None)."""
        resized = [media.center_crop_wide(f, (width, height)) for f in frames]
        px = jnp.asarray(media.pil_to_neg1_1(resized), dtype=self.dtype)
        px = self._shard_video(px, 0)  # frame-axis DP over the mesh
        mean, logvar = self._vae_encode(self.params["vae"], px)
        z = sample_latents(mean, logvar, key) if key is not None else mean
        return z * self.vae_scaling

    def encode_first_frame_latents(
        self,
        image: Image.Image,
        height: int,
        width: int,
        num_frames: int,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """prepare_image_latents equivalent -> [F, h, w, C] (frame 0 = true
        latent, frames 1.. = position ramp)."""
        z = self.encode_vae_video([image], height, width, key=key)[0]
        return core.prepare_image_latents(z, num_frames)

    def enable_vae_tiling(self, tile_latent: int = 64, overlap_latent: int = 8) -> None:
        """Route decode through spatially tiled decoding with seam blending
        (reference parity: enable_vae_tiling, pipeline_i2vgen_xl.py:520-550)."""
        self.vae_tiling = (tile_latent, overlap_latent)

    def disable_vae_tiling(self) -> None:
        self.vae_tiling = None

    def decode_latents(self, latents: jax.Array, decode_chunk_size: Optional[int] = None) -> np.ndarray:
        """latents [F, h, w, C] (scaled) -> video [F, H, W, 3] float in [0,1].

        decode_chunk_size bounds the frame batch per VAE call (the reference
        decodes chunk=1 to survive memory — pipeline_i2vgen_xl.py:771-791);
        enable_vae_tiling additionally bounds the spatial footprint."""
        z = self._shard_video(latents / self.vae_scaling, 0)
        tiling = getattr(self, "vae_tiling", None)

        def dec(zz):
            if tiling is not None:
                from mvoc_tpu.models.vae import tiled_decode

                return tiled_decode(
                    lambda t: self._vae_decode(self.params["vae"], t), zz,
                    tile_latent=tiling[0], overlap_latent=tiling[1])
            return self._vae_decode(self.params["vae"], zz)

        if decode_chunk_size:
            frames = [
                dec(z[i : i + decode_chunk_size])
                for i in range(0, z.shape[0], decode_chunk_size)
            ]
            img = jnp.concatenate(frames, axis=0)
        else:
            img = dec(z)
        img = (img.astype(jnp.float32) / 2 + 0.5).clip(0.0, 1.0)
        return np.asarray(img)

    def prepare_latents(
        self, num_frames: int, height: int, width: int, key: jax.Array
    ) -> jax.Array:
        shape = (
            num_frames,
            height // self.vae_scale_factor,
            width // self.vae_scale_factor,
            self.unet.config.in_channels,
        )
        return jax.random.normal(key, shape, dtype=jnp.float32) * self.ddim.init_noise_sigma

    # ------------------------------------------------------------------
    # conditioning assembly
    # ------------------------------------------------------------------

    def _stack_cond(
        self,
        text_embeds: jax.Array,        # [B, 77, D]
        first_image_latents: jax.Array,  # [B, F, h, w, C]
        image_latents: jax.Array,      # [B, F, h, w, C]
        image_embeddings: jax.Array,   # [B, F, D_img]
        fps: int,
    ) -> core.UNetConditioning:
        b = text_embeds.shape[0]
        return core.UNetConditioning(
            encoder_hidden_states=text_embeds.astype(self.dtype),
            image_latents_first=first_image_latents.astype(self.dtype),
            image_latents=image_latents.astype(self.dtype),
            image_embeddings=image_embeddings.astype(self.dtype),
            fps=jnp.full((b,), fps, dtype=jnp.int32),
        )

    # ------------------------------------------------------------------
    # entry point A: DDIM inversion (reference: invert, :1750-2018)
    # ------------------------------------------------------------------

    def invert(
        self,
        frames: Sequence[Image.Image],
        first_frame: Optional[Image.Image] = None,
        prompt: str = "",
        negative_prompt: str = "",
        height: int = 720,
        width: int = 1280,
        target_fps: int = 8,
        num_frames: int = 16,
        num_inference_steps: int = 500,
        guidance_scale: float = 1.0,
        clip_skip: int = 1,
        seed: int = 8888,
        output_dir: Optional[str] = None,
        prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        encoder_reuse_interval: int = 1,
        encoder_reuse_depth: Optional[int] = None,
        deep_reuse: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """DDIM-invert a video. Returns (timesteps ascending, trajectory
        [S, F, h, w, C]); writes the trajectory store when output_dir given.
        encoder_reuse_interval > 1 enables training-free encoder reuse;
        encoder_reuse_depth = k caches only down blocks k.. + mid (partial
        depth — ~4x smaller cache, fits 720p); deep_reuse=True also
        broadcasts the up-block attention outputs (PAB) on cached steps."""
        self.check_inputs(height, width, num_frames, prompt=prompt,
                          prompt_embeds=prompt_embeds,
                          negative_prompt=negative_prompt,
                          negative_prompt_embeds=negative_prompt_embeds)
        key = jax.random.key(seed)
        first_frame = first_frame or frames[0]
        do_cfg = guidance_scale > 1.0

        k_vae, k_img = jax.random.split(key)
        if latents is None:
            latents = self.encode_vae_video(frames, height, width, key=k_vae)

        pe, ne = self.encode_prompt(
            prompt, negative_prompt, do_cfg=do_cfg, clip_skip=clip_skip,
            prompt_embeds=prompt_embeds, negative_prompt_embeds=negative_prompt_embeds,
        )
        text = jnp.concatenate([ne, pe]) if do_cfg else pe

        img_emb = self.encode_image(first_frame, width)  # [1, D]
        img_emb = jnp.broadcast_to(img_emb[:, None], (1, num_frames, img_emb.shape[-1]))
        if do_cfg:
            img_emb = jnp.concatenate([jnp.zeros_like(img_emb), img_emb])

        img_lat = self.encode_first_frame_latents(first_frame, height, width, num_frames, key=k_img)
        img_lat = jnp.broadcast_to(img_lat[None], (2 if do_cfg else 1,) + img_lat.shape)

        cond = self._shard_cond(self._stack_cond(text, img_lat, img_lat, img_emb, target_fps))
        latents = self._shard_video(latents.astype(jnp.float32), 0)

        ts = inversion_timesteps(self.scheduler_config, num_inference_steps)
        from mvoc_tpu.ops import conv as conv_forms

        # the stage-keyed temporal-conv rule (round-5 e2e stage A/B:
        # inversion programs measured faster on XLA's conv emitter, the
        # composite measured faster on the stack3 dot — ops/conv.py)
        with conv_forms.tconv_override("xla"):
            if encoder_reuse_interval > 1:
                ua = self._reuse_unet_apply(encoder_reuse_depth)
                invert_fn = jax.jit(
                    lambda p, x0, c, t: core.ddim_inversion_core(
                        ua, self.ddim, p, x0, c, t,
                        num_inference_steps, float(guidance_scale),
                        encoder_reuse_interval=int(encoder_reuse_interval),
                        deep_reuse=bool(deep_reuse),
                    )
                )
                trajectory = invert_fn(
                    self.params["unet"], latents, cond, jnp.asarray(ts))
            else:
                trajectory = self._invert_core(
                    self.params["unet"], latents, cond,
                    jnp.asarray(ts), num_inference_steps, float(guidance_scale),
                )
        trajectory = np.asarray(trajectory)
        if output_dir is not None:
            meta = dict(
                n_steps=num_inference_steps, guidance_scale=guidance_scale,
                num_frames=num_frames, height=height, width=width,
                prompt=prompt, seed=seed, target_fps=target_fps,
                encoder_reuse_interval=encoder_reuse_interval,
            )
            TrajectoryStore(output_dir).save(ts, trajectory, meta=meta)
            logger.info("saved trajectory (%d steps) to %s", len(ts), output_dir)
        return ts, trajectory

    def invert_batch(
        self,
        videos: Sequence[Sequence[Image.Image]],
        first_frames: Optional[Sequence[Optional[Image.Image]]] = None,
        prompt: str = "",
        height: int = 720,
        width: int = 1280,
        target_fps: int = 8,
        num_frames: int = 16,
        num_inference_steps: int = 500,
        clip_skip: int = 1,
        seed: int = 8888,
        output_dirs: Optional[Sequence[Optional[str]]] = None,
        encoder_reuse_interval: int = 1,
        deep_reuse: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """DDIM-invert J independent videos in ONE scan (J = UNet batch
        axis; shards over the mesh "job" axis when enabled).  The reference
        loops videos serially (reference: inverse.py:136); inversion runs at
        cfg == 1 (group_inversion/template.yaml:32) so each video is one
        branch.  Returns (timesteps ascending, trajectory [S, J, F, h, w, C])
        and writes one trajectory store per video when output_dirs given."""
        self.check_inputs(height, width, num_frames)
        J = len(videos)
        first_frames = list(first_frames or [None] * J)
        key = jax.random.key(seed)
        keys = jax.random.split(key, 2 * J)

        x0s, img_embs, img_lats = [], [], []
        for j, frames in enumerate(videos):
            ff = first_frames[j] or frames[0]
            x0s.append(self.encode_vae_video(frames, height, width, key=keys[2 * j]))
            emb = self.encode_image(ff, width)  # [1, D]
            img_embs.append(jnp.broadcast_to(
                emb, (num_frames, emb.shape[-1])))
            img_lats.append(self.encode_first_frame_latents(
                ff, height, width, num_frames, key=keys[2 * j + 1]))
        x0 = jnp.stack(x0s).astype(jnp.float32)            # [J, F, h, w, C]
        img_emb = jnp.stack(img_embs)                      # [J, F, D]
        img_lat = jnp.stack(img_lats)                      # [J, F, h, w, C]

        pe, _ = self.encode_prompt(prompt, do_cfg=False, clip_skip=clip_skip)
        text = jnp.broadcast_to(pe, (J,) + pe.shape[1:])

        cond = self._stack_cond(text, img_lat, img_lat, img_emb, target_fps)
        if self.mesh is not None:
            import dataclasses
            from mvoc_tpu.parallel import mesh as pm

            sv = lambda t: pm.shard_stacked_video(t, self.mesh)
            x0 = sv(x0)
            cond = dataclasses.replace(
                cond,
                image_latents_first=sv(cond.image_latents_first),
                image_latents=sv(cond.image_latents),
            )

        ts = inversion_timesteps(self.scheduler_config, num_inference_steps)
        kwargs = {}
        if encoder_reuse_interval > 1:
            kwargs = dict(encoder_reuse_interval=int(encoder_reuse_interval),
                          deep_reuse=bool(deep_reuse))
        from mvoc_tpu.ops import conv as conv_forms

        batch_fn = jax.jit(
            lambda p, x, c, t: core.ddim_inversion_batch_core(
                self._unet_apply, self.ddim, p, x, c, t,
                num_inference_steps, **kwargs))
        with conv_forms.tconv_override("xla"):  # stage-keyed rule (invert)
            trajectory = np.asarray(batch_fn(
                self.params["unet"], x0, cond, jnp.asarray(ts)))

        if output_dirs is not None:
            for j, out_dir in enumerate(output_dirs):
                if out_dir is None:
                    continue
                meta = dict(
                    n_steps=num_inference_steps, guidance_scale=1.0,
                    num_frames=num_frames, height=height, width=width,
                    prompt=prompt, seed=seed, target_fps=target_fps,
                    encoder_reuse_interval=encoder_reuse_interval,
                )
                TrajectoryStore(out_dir).save(ts, trajectory[:, j], meta=meta)
                logger.info("saved trajectory (%d steps) to %s", len(ts), out_dir)
        return ts, trajectory

    # ------------------------------------------------------------------
    # entry point D: plain sampling / reconstruction (reference __call__)
    # ------------------------------------------------------------------

    def sample(
        self,
        image: Image.Image,
        prompt: str = "",
        negative_prompt: str = "",
        height: int = 720,
        width: int = 1280,
        target_fps: int = 8,
        num_frames: int = 16,
        num_inference_steps: int = 50,
        guidance_scale: float = 9.0,
        clip_skip: int = 1,
        ddim_init_latents_t_idx: int = 0,
        latents: Optional[jax.Array] = None,
        seed: int = 6,
        decode: bool = True,
        decode_chunk_size: Optional[int] = 1,
        prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
    ):
        """Image-to-video sampling; with `latents` + t_idx it is the
        reference's DDIM reconstruction path (inverse.py:79-108)."""
        self.check_inputs(height, width, num_frames, prompt=prompt,
                          prompt_embeds=prompt_embeds,
                          negative_prompt=negative_prompt,
                          negative_prompt_embeds=negative_prompt_embeds)
        key = jax.random.key(seed)
        do_cfg = guidance_scale > 1.0
        k_lat, k_img = jax.random.split(key)
        if latents is None:
            latents = self.prepare_latents(num_frames, height, width, k_lat)

        pe, ne = self.encode_prompt(
            prompt, negative_prompt, do_cfg=do_cfg, clip_skip=clip_skip,
            prompt_embeds=prompt_embeds, negative_prompt_embeds=negative_prompt_embeds,
        )
        text = jnp.concatenate([ne, pe]) if do_cfg else pe

        img_emb = self.encode_image(image, width)
        img_emb = jnp.broadcast_to(img_emb[:, None], (1, num_frames, img_emb.shape[-1]))
        if do_cfg:
            img_emb = jnp.concatenate([jnp.zeros_like(img_emb), img_emb])

        img_lat = self.encode_first_frame_latents(image, height, width, num_frames, key=k_img)
        img_lat = jnp.broadcast_to(img_lat[None], (2 if do_cfg else 1,) + img_lat.shape)

        cond = self._shard_cond(self._stack_cond(text, img_lat, img_lat, img_emb, target_fps))

        ts = sampling_timesteps(self.scheduler_config, num_inference_steps)
        run_ts = ts[ddim_init_latents_t_idx:]
        final = self._sample_core(
            self.params["unet"],
            self._shard_video(jnp.asarray(latents, dtype=jnp.float32), 0), cond,
            jnp.asarray(run_ts), num_inference_steps, float(guidance_scale),
        )
        if not decode:
            return final
        return self.decode_latents(final, decode_chunk_size=decode_chunk_size)

    def generate_background(
        self,
        prompt: str,
        negative_prompt: str = "",
        height: int = 720,
        width: int = 1280,
        num_frames: int = 16,
        num_inference_steps: int = 50,
        guidance_scale: float = 9.0,
        target_fps: int = 8,
        seed: int = 6,
    ):
        """Text-to-video background generation (the reference carries this
        as the dormant `generated_bacground*` config block,
        group_composite/template.yaml:26-29): image-to-video sampling
        conditioned on a null (black) first frame, like the reference's
        null_image_inversion mode."""
        black = Image.new("RGB", (width, height), (0, 0, 0))
        return self.sample(
            black, prompt=prompt, negative_prompt=negative_prompt,
            height=height, width=width, target_fps=target_fps,
            num_frames=num_frames, num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, seed=seed,
        )

    def check_inputs(
        self,
        height: int,
        width: int,
        num_frames: int,
        prompt=None,
        prompt_embeds=None,
        negative_prompt=None,
        negative_prompt_embeds=None,
    ) -> None:
        """Input validation (reference: check_inputs,
        pipeline_i2vgen_xl.py:811-858): size divisibility plus the
        prompt/embeds combination rules."""
        f = self.vae_scale_factor
        if height % f != 0 or width % f != 0:
            raise ValueError(
                f"height/width must be divisible by {f}, got {height}x{width}")
        if num_frames < 2:
            raise ValueError("num_frames must be >= 2 (temporal model)")
        if prompt is not None and not isinstance(prompt, (str, list, tuple)):
            raise ValueError(f"prompt must be str or list, got {type(prompt)}")
        if prompt_embeds is not None and prompt not in (None, ""):
            raise ValueError(
                "cannot forward both `prompt` and `prompt_embeds` — provide "
                "one (reference check_inputs, pipeline_i2vgen_xl.py:828-838)")
        if (negative_prompt_embeds is not None
                and negative_prompt not in (None, "")):
            raise ValueError(
                "cannot forward both `negative_prompt` and "
                "`negative_prompt_embeds` — provide one")
        if (prompt_embeds is not None and negative_prompt_embeds is not None
                and prompt_embeds.shape != negative_prompt_embeds.shape):
            raise ValueError(
                f"`prompt_embeds` {prompt_embeds.shape} and "
                f"`negative_prompt_embeds` {negative_prompt_embeds.shape} "
                "must have the same shape")

    # ------------------------------------------------------------------
    # entry point B: PnP composite sampling
    # ------------------------------------------------------------------

    def _prepare_composite(
        self,
        prompt: str,
        main_first_image: Image.Image,
        main_image_list: Sequence[Image.Image],
        background_image_list: Sequence[Image.Image],
        objs_image_list: Sequence[Sequence[Image.Image]],
        masks_soft: np.ndarray,       # [N, F, h_lat, w_lat] float
        masks_binary: np.ndarray,     # [N, F, h_lat, w_lat] {0,1}
        bg_store: TrajectoryStore,
        obj_stores: Sequence[TrajectoryStore],
        height: int = 720,
        width: int = 1280,
        target_fps: int = 8,
        num_frames: int = 16,
        num_inference_steps: int = 50,
        guidance_scale: float = 9.0,
        negative_prompt: str = "",
        ddim_inv_prompt: str = "",
        clip_skip: int = 1,
        ddim_init_latents_t_idx: int = 1,
        fusion_steps: tuple[int, int] = (0, 3),
        obj_ddim_latents_idx_offset: Optional[Sequence[int]] = None,
        obj_random_noise_fusion: bool = False,
        random_noise_ratio: float = 0.0,
        inject_background: bool = True,
        strict_reference_crop: bool = True,
        encoder_reuse_interval: int = 1,
        encoder_reuse_depth: Optional[int] = None,
        pab_interval: int = 1,
        capture_reuse_interval: int = 1,
        capture_reuse_deep: bool = False,
        two_pass: bool | str = False,  # False | True | "stream"
        pnp_f_t: float = 0.8,
        pnp_spatial_attn_t: float = 0.8,
        pnp_temp_attn_t: float = 0.8,
        seed: int = 6,
        decode: bool = True,
        decode_chunk_size: Optional[int] = 1,
        prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
        ddim_inv_prompt_embeds: Optional[jax.Array] = None,
        shard: bool = True,
    ):
        """Host-side prep shared by sample_composite / sample_composite_batch
        (reference prep: pipeline_i2vgen_xl.py:1335-1599 + composite.py:38-69
        init_pnp).  Returns (init_latents, cond, sched, masks_soft, pyr_bin,
        pyr_soft, capture_weights); shard=False skips mesh placement (the
        batch path shards the STACKED pytrees instead)."""
        self.check_inputs(height, width, num_frames, prompt=prompt,
                          prompt_embeds=prompt_embeds,
                          negative_prompt=negative_prompt,
                          negative_prompt_embeds=negative_prompt_embeds)
        n_obj = len(obj_stores)
        assert masks_soft.shape[0] == n_obj
        assert len(obj_stores) == masks_binary.shape[0], (
            "obj_mask / obj_ddim_latents count mismatch "
            "(reference asserts the same: pipeline_i2vgen_xl.py:1335)")
        background_first_image = background_image_list[0]
        objs_first_image = [o[0] for o in objs_image_list]
        key = jax.random.key(seed)
        k_lat, *k_enc = jax.random.split(key, 3 + n_obj + 2)

        # --- text: [inv x(N+1), negative, editing] (reference :1356-1389)
        pe, ne = self.encode_prompt(
            prompt, negative_prompt, do_cfg=True, clip_skip=clip_skip,
            prompt_embeds=prompt_embeds, negative_prompt_embeds=negative_prompt_embeds,
        )
        if ddim_inv_prompt_embeds is None:
            ddim_inv_prompt_embeds, _ = self.encode_prompt(
                ddim_inv_prompt, do_cfg=False, clip_skip=clip_skip,
            )
        inv_text = jnp.broadcast_to(
            ddim_inv_prompt_embeds, (n_obj + 1,) + ddim_inv_prompt_embeds.shape[1:]
        )
        text = jnp.concatenate([inv_text, ne, pe])  # [N+3, 77, D]

        # --- first-frame latents per branch (reference :1391-1477)
        def first_lat(img, k):
            return self.encode_first_frame_latents(img, height, width, num_frames, key=k)

        bg_fl = first_lat(background_first_image, k_enc[0])
        obj_fls = [first_lat(img, k_enc[1 + j]) for j, img in enumerate(objs_first_image)]
        main_fl = first_lat(main_first_image, k_enc[1 + n_obj])
        first_lats = jnp.stack([bg_fl, *obj_fls, main_fl, main_fl])  # [N+3, ...]

        # --- context image latents per branch (reference :1479-1499; frame 0
        # of each branch's control frames).  Those are the SAME images with
        # the SAME sampling keys as the first-frame latents above — the
        # reference encodes them twice and gets bit-identical tensors; we
        # alias instead of re-running N+3 VAE encodes (exact).
        ctx_lats = first_lats

        # --- per-frame CLIP image embeddings per branch (reference :1501-1541;
        # strict_reference_crop replicates the discarded-crop quirk)
        sc = strict_reference_crop
        bg_emb = self.encode_frames(background_image_list, width,
                                    strict_reference_crop=sc)           # [F, D]
        obj_embs = [self.encode_frames(o, width, strict_reference_crop=sc)
                    for o in objs_image_list]
        main_emb = self.encode_frames(main_image_list, width,
                                      strict_reference_crop=sc)
        # main branch: uncond gets ZERO image embedding (CFG), cond the real one
        img_embs = jnp.stack([bg_emb, *obj_embs, jnp.zeros_like(main_emb), main_emb])

        cond = self._stack_cond(text, first_lats, ctx_lats, img_embs, target_fps)

        # --- schedule (reference :1551-1566 + composite.py:39-52)
        full_ts = sampling_timesteps(self.scheduler_config, num_inference_steps)
        run_ts = full_ts[ddim_init_latents_t_idx:]
        gates = pnp_lib.injection_gates(
            full_ts, run_ts, num_inference_steps,
            pnp_f_t, pnp_spatial_attn_t, pnp_temp_attn_t,
        )
        offsets = list(obj_ddim_latents_idx_offset or [0] * n_obj)

        bg_traj = bg_store.gather(run_ts)                      # [S', F, h, w, C]
        obj_traj = np.stack([s.gather(run_ts) for s in obj_stores], axis=1)  # [S', N, ...]
        # constant fusion latent per object (fusion_counter quirk, see core.py)
        obj_fusion_lat = np.stack(
            [
                obj_stores[j].load_at_t(int(full_ts[offsets[j] :][fusion_steps[0]]))
                for j in range(n_obj)
            ]
        )
        n_run = len(run_ts)
        fusion_mask = np.array(
            [fusion_steps[0] <= i < fusion_steps[1] for i in range(n_run)], dtype=bool
        )

        # --- mask pyramids at every injection resolution
        h_lat, w_lat = masks_soft.shape[2], masks_soft.shape[3]
        resolutions = self._injection_resolutions(h_lat, w_lat)
        pyr_bin = {
            k: jnp.asarray(v)
            for k, v in pnp_lib.build_mask_pyramid(masks_binary, resolutions).items()
        }
        pyr_soft = {
            k: jnp.asarray(v)
            for k, v in pnp_lib.build_mask_pyramid(masks_soft, resolutions).items()
        }

        sv = self._shard_video if shard else (lambda x, a: x)
        sched = core.CompositeSchedule(
            bg_traj=sv(jnp.asarray(bg_traj, dtype=jnp.float32), 1),
            obj_traj=sv(jnp.asarray(obj_traj, dtype=jnp.float32), 2),
            obj_fusion_lat=sv(
                jnp.asarray(obj_fusion_lat, dtype=jnp.float32), 1),
            gate_spatial=jnp.asarray(gates["spatial"]),
            gate_temporal=jnp.asarray(gates["temporal"]),
            gate_conv=jnp.asarray(gates["conv"]),
            fusion_mask=jnp.asarray(fusion_mask),
            timesteps=jnp.asarray(run_ts),
        )
        if shard:
            cond = self._shard_cond(cond)

        init_latents = sv(
            self.prepare_latents(num_frames, height, width, k_lat), 0)

        stream = two_pass == "stream"
        capture_weights = None
        if stream:
            capture_weights = pnp_lib.build_capture_weights(
                pyr_bin, pyr_soft, inject_background)

        return (init_latents, cond, sched,
                jnp.asarray(masks_soft, dtype=jnp.float32),
                pyr_bin, pyr_soft, capture_weights)

    def _composite_core_kwargs(
        self, num_inference_steps, guidance_scale, random_noise_ratio,
        obj_random_noise_fusion, inject_background, encoder_reuse_interval,
        two_pass, pab_interval, capture_reuse_interval, capture_reuse_deep,
    ):
        """The STATIC composite-core knobs (shared across a batched group)."""
        return dict(
            num_inference_steps=num_inference_steps,
            guidance_scale=float(guidance_scale),
            random_noise_ratio=float(random_noise_ratio),
            obj_random_noise_fusion=obj_random_noise_fusion,
            inject_background=inject_background,
            encoder_reuse_interval=int(encoder_reuse_interval),
            two_pass=two_pass,
            pab_interval=int(pab_interval),
            capture_reuse_interval=int(capture_reuse_interval),
            capture_reuse_deep=bool(capture_reuse_deep),
        )

    def sample_composite(self, *args, **kwargs):
        """The MVOC composite sampler (reference:
        sample_with_pnp_pipeline_with_edit_prompt_extraction_with_attn_injection,
        pipeline_i2vgen_xl.py:1220-1748 + composite.py:38-69 init_pnp).
        Same argument surface as _prepare_composite."""
        decode = kwargs.pop("decode", True)
        decode_chunk_size = kwargs.pop("decode_chunk_size", 1)
        static = self._composite_core_kwargs(
            kwargs.get("num_inference_steps", 50),
            kwargs.get("guidance_scale", 9.0),
            kwargs.get("random_noise_ratio", 0.0),
            kwargs.get("obj_random_noise_fusion", False),
            kwargs.get("inject_background", True),
            kwargs.get("encoder_reuse_interval", 1),
            kwargs.get("two_pass", False),
            kwargs.get("pab_interval", 1),
            kwargs.get("capture_reuse_interval", 1),
            kwargs.get("capture_reuse_deep", False),
        )
        (init_latents, cond, sched, masks_soft, pyr_bin, pyr_soft,
         capture_weights) = self._prepare_composite(*args, **kwargs)

        reuse_ua = self._reuse_unet_apply(
            kwargs.get("encoder_reuse_depth")
            if static["encoder_reuse_interval"] > 1 else None)
        composite_fn = jax.jit(
            lambda p, lat, c, s, ms: core.pnp_composite_core(
                reuse_ua, self.ddim, p, lat, c, s, ms,
                pyr_bin, pyr_soft,
                capture_weights=capture_weights,
                **static,
            )
        )
        final = composite_fn(
            self.params["unet"], init_latents, cond, sched, masks_soft)
        if not decode:
            return final
        return self.decode_latents(final, decode_chunk_size=decode_chunk_size)

    def sample_composite_batch(self, entries, decode=True,
                               decode_chunk_size: Optional[int] = 1,
                               **shared_kwargs):
        """J independent composites as ONE (vmapped) program — the stage-2
        analogue of invert_batch (the reference loops entries serially:
        composite.py:87).

        entries: per-entry kwargs dicts for _prepare_composite (prompt,
        images, masks, stores, seed, ...).  shared_kwargs: the static knobs
        every entry shares (steps, guidance, two_pass, reuse intervals —
        the CLI groups entries by exactly these).  Under a mesh the entry
        axis shards over "job" and frame axes over "seq".  Returns a list of
        per-entry videos (decoded) or a [J, F, h, w, C] latents array."""
        assert len(entries) >= 1
        static = self._composite_core_kwargs(
            shared_kwargs.get("num_inference_steps", 50),
            shared_kwargs.get("guidance_scale", 9.0),
            shared_kwargs.get("random_noise_ratio", 0.0),
            shared_kwargs.get("obj_random_noise_fusion", False),
            shared_kwargs.get("inject_background", True),
            shared_kwargs.get("encoder_reuse_interval", 1),
            shared_kwargs.get("two_pass", False),
            shared_kwargs.get("pab_interval", 1),
            shared_kwargs.get("capture_reuse_interval", 1),
            shared_kwargs.get("capture_reuse_deep", False),
        )
        prepared = [
            self._prepare_composite(shard=False, **shared_kwargs, **e)
            for e in entries
        ]
        stack = lambda i: jax.tree.map(
            lambda *xs: jnp.stack(xs), *[p[i] for p in prepared])
        init_latents, cond, sched, masks_soft = (stack(i) for i in range(4))
        pyr_bin, pyr_soft = stack(4), stack(5)
        capture_weights = (stack(6) if prepared[0][6] is not None else None)

        if self.mesh is not None:
            from mvoc_tpu.parallel import mesh as pm

            ssv = lambda t, fa: pm.shard_stacked_video(
                t, self.mesh, job_axis=0, frame_axis=fa)
            init_latents = ssv(init_latents, 1)
            import dataclasses as _dc

            sched = _dc.replace(
                sched,
                bg_traj=ssv(sched.bg_traj, 2),
                obj_traj=ssv(sched.obj_traj, 3),
                obj_fusion_lat=ssv(sched.obj_fusion_lat, 2),
            )
            cond = _dc.replace(
                cond,
                image_latents_first=ssv(cond.image_latents_first, 2),
                image_latents=ssv(cond.image_latents, 2),
            )

        reuse_ua = self._reuse_unet_apply(
            shared_kwargs.get("encoder_reuse_depth")
            if static["encoder_reuse_interval"] > 1 else None)
        batch_fn = jax.jit(
            lambda p, lat, c, s, ms, pb, ps, cw: core.pnp_composite_batch_core(
                reuse_ua, self.ddim, p, lat, c, s, ms, pb, ps,
                capture_weights=cw, **static))
        final = batch_fn(self.params["unet"], init_latents, cond, sched,
                         masks_soft, pyr_bin, pyr_soft, capture_weights)
        if not decode:
            return final
        return [self.decode_latents(final[j],
                                    decode_chunk_size=decode_chunk_size)
                for j in range(final.shape[0])]

    def _reuse_unet_apply(self, depth: Optional[int]):
        """unet_apply with the partial-depth reuse bound (no-op when
        depth is None — encoder_reuse_depth only acts on the cache paths)."""
        if not depth:
            return self._unet_apply
        d_ = int(depth)
        return lambda p, **kw: self.unet.apply(
            p, **kw, freeu=self.freeu, encoder_reuse_depth=d_)

    def _injection_resolutions(self, h_lat: int, w_lat: int) -> list[tuple[int, int]]:
        """Spatial sizes at which injection sites run, derived from the
        UNet's site map: up_blocks[b] of an L-level UNet runs at the latent
        resolution ceil-halved (L-1-b) times (stride-2 conv downsampling,
        ceil(x/2) per level); out_conv runs at full latent resolution.
        For the default I2VGen-XL map: 1/4, 1/2 and full latent res."""
        cfg = self.unet.config
        sites = cfg.sites
        n_levels = len(cfg.block_out_channels)

        def block_res(b: int) -> tuple[int, int]:
            h, w = h_lat, w_lat
            for _ in range(n_levels - 1 - b):
                h, w = (h + 1) // 2, (w + 1) // 2
            return (h, w)

        res = {block_res(b) for b in sites.block_indices()}
        if sites.out_conv:
            res.add((h_lat, w_lat))
        # full latent res first, then descending (stable order for tests)
        return sorted(res, reverse=True)

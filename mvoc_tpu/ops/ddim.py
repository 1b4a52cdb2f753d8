"""DDIM / DDIM-inverse schedulers as pure functions.

The reference loads diffusers' DDIMScheduler + DDIMInverseScheduler from the
I2VGen-XL checkpoint (reference: inverse.py:123-131, composite.py:82-85) and
steps them imperatively inside python loops.  Here both are pure: a frozen
config + precomputed alpha-cumprod table, and a `step` function of
(sample, eps, t, t_prev) that is trace-stable, so whole denoising/inversion
loops compile into a single `lax.scan`.

Scheduler math runs in float32 regardless of model dtype (the reference runs
fp16 end-to-end; 500 inversion steps amplify rounding, so we deliberately
upcast — see SURVEY.md §7 "hard parts").

Timestep-spacing parity is pinned by the reference's own logs: with 50 steps,
`timesteps[0]=981, [3]=921, [9]=801, [20]=581` (reference:
configs/group_inversion/template.yaml:48) ⇒ "leading" spacing, steps_offset=1.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # linear | scaled_linear | squaredcos_cap_v2
    clip_sample: bool = False
    clip_sample_range: float = 1.0
    set_alpha_to_one: bool = False
    steps_offset: int = 1
    prediction_type: str = "epsilon"  # epsilon | sample | v_prediction
    timestep_spacing: str = "leading"  # leading | trailing | linspace
    rescale_betas_zero_snr: bool = False

    @staticmethod
    def from_json(path: str) -> "SchedulerConfig":
        """Load from a diffusers scheduler_config.json (checkpoint subfolder)."""
        with open(path) as f:
            raw = json.load(f)
        fields = {f.name for f in dataclasses.fields(SchedulerConfig)}
        return SchedulerConfig(**{k: v for k, v in raw.items() if k in fields})

    @staticmethod
    def from_pretrained(checkpoint_dir: str) -> "SchedulerConfig":
        return SchedulerConfig.from_json(
            os.path.join(checkpoint_dir, "scheduler", "scheduler_config.json")
        )


def _betas(cfg: SchedulerConfig) -> np.ndarray:
    n = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, n, dtype=np.float64)
    elif cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, n, dtype=np.float64) ** 2
    elif cfg.beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        betas = np.array(
            [min(1 - alpha_bar((i + 1) / n) / alpha_bar(i / n), 0.999) for i in range(n)],
            dtype=np.float64,
        )
    else:
        raise ValueError(f"unknown beta_schedule: {cfg.beta_schedule}")
    return betas


def _rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """diffusers.rescale_zero_terminal_snr operating on alpha-bar sqrt."""
    ab_sqrt = np.sqrt(alphas_cumprod)
    ab_sqrt_0, ab_sqrt_t = ab_sqrt[0], ab_sqrt[-1]
    ab_sqrt = ab_sqrt - ab_sqrt_t
    ab_sqrt = ab_sqrt * ab_sqrt_0 / (ab_sqrt_0 - ab_sqrt_t)
    return ab_sqrt**2


def alphas_cumprod_table(cfg: SchedulerConfig) -> np.ndarray:
    """float64 table of ᾱ_t, t ∈ [0, num_train_timesteps)."""
    acp = np.cumprod(1.0 - _betas(cfg), axis=0)
    if cfg.rescale_betas_zero_snr:
        acp = _rescale_zero_terminal_snr(acp)
    return acp


def sampling_timesteps(cfg: SchedulerConfig, num_inference_steps: int) -> np.ndarray:
    """Descending timesteps for DDIM sampling (diffusers DDIMScheduler.set_timesteps)."""
    n = cfg.num_train_timesteps
    if cfg.timestep_spacing == "leading":
        step_ratio = n // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        ts = ts + cfg.steps_offset
    elif cfg.timestep_spacing == "trailing":
        step_ratio = n / num_inference_steps
        ts = np.round(np.arange(n, 0, -step_ratio)).astype(np.int64) - 1
    elif cfg.timestep_spacing == "linspace":
        ts = np.linspace(0, n - 1, num_inference_steps).round()[::-1].astype(np.int64)
    else:
        raise ValueError(f"unknown timestep_spacing: {cfg.timestep_spacing}")
    return ts


def inversion_timesteps(cfg: SchedulerConfig, num_inference_steps: int) -> np.ndarray:
    """Ascending timesteps for DDIM inversion (diffusers DDIMInverseScheduler).

    With 500 steps + leading + offset 1 this yields 1,3,…,999 — exactly the
    `ddim_latents_{t}` keys the reference writes (pipeline_i2vgen_xl.py:1990).
    """
    n = cfg.num_train_timesteps
    if cfg.timestep_spacing == "leading":
        step_ratio = n // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round().astype(np.int64)
        ts = ts + cfg.steps_offset
    elif cfg.timestep_spacing == "trailing":
        step_ratio = n / num_inference_steps
        ts = np.round(np.arange(n, 0, -step_ratio))[::-1].astype(np.int64) - 1
    elif cfg.timestep_spacing == "linspace":
        ts = np.linspace(0, n - 1, num_inference_steps).round().astype(np.int64)
    else:
        raise ValueError(f"unknown timestep_spacing: {cfg.timestep_spacing}")
    return ts


class DDIM:
    """Precomputed tables + pure step functions for sampling and inversion.

    `alphas_cumprod` is padded with `final_alpha_cumprod` at index -1 so that
    traced gathers with t_prev = -1 (the last sampling step) hit the right
    value without data-dependent control flow.
    """

    def __init__(self, cfg: SchedulerConfig):
        self.config = cfg
        acp = alphas_cumprod_table(cfg).astype(np.float32)
        self.alphas_cumprod = jnp.asarray(acp)
        self.final_alpha_cumprod = jnp.float32(1.0 if cfg.set_alpha_to_one else acp[0])
        # DDIMInverseScheduler hardcodes set_alpha_to_one-like behaviour via
        # `initial_alpha_cumprod = 1.0` in diffusers ≥0.26.
        self.initial_alpha_cumprod = jnp.float32(1.0)
        self.init_noise_sigma = 1.0

    # -- alpha lookup with boundary handling -----------------------------------

    def _alpha_at(self, t, boundary):
        """ᾱ_t for traced integer t; t < 0 → `boundary`."""
        t = jnp.asarray(t)
        safe = jnp.clip(t, 0, self.config.num_train_timesteps - 1)
        return jnp.where(t < 0, boundary, self.alphas_cumprod[safe])

    def _predict_x0_eps(self, sample, model_output, alpha_prod_t):
        """(pred_x0, pred_eps) per prediction_type; fp32 math."""
        sample = sample.astype(jnp.float32)
        model_output = model_output.astype(jnp.float32)
        a = alpha_prod_t
        b = 1.0 - a
        sa, sb = jnp.sqrt(a), jnp.sqrt(b)
        p = self.config.prediction_type
        if p == "epsilon":
            x0 = (sample - sb * model_output) / sa
            eps = model_output
        elif p == "sample":
            x0 = model_output
            eps = (sample - sa * x0) / sb
        elif p == "v_prediction":
            x0 = sa * sample - sb * model_output
            eps = sa * model_output + sb * sample
        else:
            raise ValueError(f"unknown prediction_type: {p}")
        if self.config.clip_sample:
            # diffusers clips x0 after deriving pred_epsilon and does NOT
            # recompute eps from the clipped x0 (DDIMScheduler.step order).
            r = self.config.clip_sample_range
            x0 = jnp.clip(x0, -r, r)
        return x0, eps

    # -- DDIM sampling step (x_t → x_{t-Δ}) ------------------------------------

    def step(self, model_output, timestep, sample, num_inference_steps: int, eta: float = 0.0,
             noise: Optional[jnp.ndarray] = None):
        """Pure equivalent of diffusers DDIMScheduler.step(...).prev_sample."""
        t = jnp.asarray(timestep)
        prev_t = t - self.config.num_train_timesteps // num_inference_steps
        alpha_prod_t = self._alpha_at(t, self.final_alpha_cumprod)
        alpha_prod_prev = self._alpha_at(prev_t, self.final_alpha_cumprod)

        x0, eps = self._predict_x0_eps(sample, model_output, alpha_prod_t)

        if eta > 0.0:
            beta_prod_t = 1.0 - alpha_prod_t
            variance = (1.0 - alpha_prod_prev) / beta_prod_t * (1.0 - alpha_prod_t / alpha_prod_prev)
            std = eta * jnp.sqrt(variance)
        else:
            std = 0.0
        direction = jnp.sqrt(1.0 - alpha_prod_prev - std**2) * eps
        prev = jnp.sqrt(alpha_prod_prev) * x0 + direction
        if eta > 0.0:
            if noise is None:
                raise ValueError("eta > 0 requires noise")
            prev = prev + std * noise.astype(jnp.float32)
        return prev.astype(sample.dtype)

    # -- DDIM inversion step (x_s → x_t, s < t) --------------------------------

    def inverse_step(self, model_output, timestep, sample, num_inference_steps: int):
        """Pure equivalent of diffusers DDIMInverseScheduler.step(...).prev_sample.

        `timestep` is the *target* (noisier) timestep from inversion_timesteps();
        the current sample sits at timestep - N//steps (clipped ≥ "initial").
        """
        t_to = jnp.asarray(timestep)
        t_from = jnp.minimum(
            t_to - self.config.num_train_timesteps // num_inference_steps,
            self.config.num_train_timesteps - 1,
        )
        alpha_prod_from = self._alpha_at(t_from, self.initial_alpha_cumprod)
        alpha_prod_to = self._alpha_at(t_to, self.initial_alpha_cumprod)

        x0, eps = self._predict_x0_eps(sample, model_output, alpha_prod_from)
        nxt = jnp.sqrt(alpha_prod_to) * x0 + jnp.sqrt(1.0 - alpha_prod_to) * eps
        return nxt.astype(sample.dtype)

    # -- misc -------------------------------------------------------------------

    def scale_model_input(self, sample, timestep=None):
        return sample  # DDIM: identity (reference relies on this at e.g. pipeline:1680)

    def add_noise(self, original, noise, timestep):
        a = self._alpha_at(jnp.asarray(timestep), self.final_alpha_cumprod)
        return (
            jnp.sqrt(a) * original.astype(jnp.float32)
            + jnp.sqrt(1.0 - a) * noise.astype(jnp.float32)
        ).astype(original.dtype)

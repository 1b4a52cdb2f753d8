"""Golden-value regression at fixed seeds (SURVEY.md §4: 'golden-latent
regression at fixed seeds') + jit-vs-eager consistency (the suite's
race-detection analogue, SURVEY.md §5).

Golden statistics are loose (1e-3) so dtype-preserving refactors pass while
behavioral changes (layout, schedule, injection semantics) fail loudly.
Regenerate with: python -m tests.test_regression
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "data", "golden_tiny.json")


def _compute_stats():
    from mvoc_tpu.ops.ddim import DDIM, SchedulerConfig, inversion_timesteps
    from mvoc_tpu.pipeline import core
    from mvoc_tpu.utils import testing as tt

    pipe = tt.build_tiny_pipeline(seed=0)
    F, LAT = tt.TINY_FRAMES, tt.TINY_HW // 2
    rng = np.random.default_rng(11)
    d = pipe.unet.config.cross_attention_dim
    cond = core.UNetConditioning(
        encoder_hidden_states=jnp.asarray(rng.standard_normal((1, 7, d), dtype=np.float32)),
        image_latents_first=jnp.asarray(rng.standard_normal((1, F, LAT, LAT, 4), dtype=np.float32)),
        image_latents=jnp.asarray(rng.standard_normal((1, F, LAT, LAT, 4), dtype=np.float32)),
        image_embeddings=jnp.asarray(rng.standard_normal((1, F, d), dtype=np.float32)),
        fps=jnp.asarray([8]),
    )
    x0 = jnp.asarray(rng.standard_normal((F, LAT, LAT, 4), dtype=np.float32))
    ddim = DDIM(SchedulerConfig())
    ts = inversion_timesteps(SchedulerConfig(), 6)
    traj = np.asarray(core.ddim_inversion_core(
        pipe._unet_apply, ddim, pipe.params["unet"], x0, cond,
        jnp.asarray(ts), 6, 1.0,
    ))
    return {
        "traj_mean": float(traj.mean()),
        "traj_std": float(traj.std()),
        "traj_last_abs_mean": float(np.abs(traj[-1]).mean()),
        "probe": [float(v) for v in traj[-1, 0, 0, 0]],
    }


def test_golden_inversion_stats():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("golden file missing; run python -m tests.test_regression")
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    got = _compute_stats()
    for k, v in golden.items():
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(v), rtol=2e-3, atol=2e-3,
            err_msg=f"golden drift in {k}",
        )


def test_jit_vs_eager_consistency(rng):
    """Tiny transformer block: jit trace and eager dispatch must agree."""
    from mvoc_tpu.models.layers import BasicTransformerBlock

    block = BasicTransformerBlock(dim=16, heads=2, dim_head=8)
    x = jnp.asarray(rng.standard_normal((2, 9, 16), dtype=np.float32))
    ctx = jnp.asarray(rng.standard_normal((2, 5, 16), dtype=np.float32))
    params = block.init(jax.random.key(0), x, ctx)
    eager = block.apply(params, x, ctx)
    jitted = jax.jit(block.apply)(params, x, ctx)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-6)


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    stats = _compute_stats()
    with open(GOLDEN_PATH, "w") as f:
        json.dump(stats, f, indent=2)
    print(f"wrote {GOLDEN_PATH}: {stats}")

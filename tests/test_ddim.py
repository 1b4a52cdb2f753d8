"""Scheduler tests: timestep parity with the reference's logged values, and
the invert→sample round-trip identity that underpins the whole pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvoc_tpu.ops.ddim import DDIM, SchedulerConfig, inversion_timesteps, sampling_timesteps

CFG = SchedulerConfig()  # leading spacing, steps_offset=1 (pinned by reference logs)


def test_sampling_timesteps_match_reference_log():
    # reference configs/group_inversion/template.yaml:48 —
    # "0 for 981, 3 for 921, 9 for 801, 20 for 581 if n_steps=50"
    ts = sampling_timesteps(CFG, 50)
    assert ts[0] == 981
    assert ts[3] == 921
    assert ts[9] == 801
    assert ts[20] == 581
    assert ts[-1] == 1


def test_inversion_timesteps_are_odd_ascending_at_500():
    # the reference writes ddim_latents_{1,3,...,999}.pt at 500 steps
    ts = inversion_timesteps(CFG, 500)
    assert ts[0] == 1 and ts[-1] == 999
    assert np.all(np.diff(ts) == 2)
    # every 50-step sampling timestep must exist in the 500-step inversion grid
    assert set(sampling_timesteps(CFG, 50)).issubset(set(ts))


def test_alpha_boundary_handling():
    sch = DDIM(CFG)
    # t = -1 must hit final_alpha_cumprod, not alphas_cumprod[-1]
    a = sch._alpha_at(jnp.int32(-1), sch.final_alpha_cumprod)
    assert np.allclose(np.asarray(a), np.asarray(sch.final_alpha_cumprod))


@pytest.mark.parametrize("steps", [10, 50])
def test_invert_then_sample_roundtrip_identity(steps):
    """With a *fixed* eps-predictor, DDIM inversion followed by DDIM sampling
    must return the starting sample (exact inverse maps on the same grid).

    This is the mathematical property the reference leans on for its
    reconstruction sanity check (inverse.py:192-227).

    Interior steps invert exactly; the two boundary steps differ because
    diffusers hardcodes initial ᾱ=1.0 for inversion but uses ᾱ₀ for sampling
    when set_alpha_to_one=False — so the end-to-end identity holds to ~1e-2
    and the interior identity to fp32 accumulation error."""
    sch = DDIM(CFG)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 4, 8, 8), dtype=jnp.float32)
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape, dtype=jnp.float32) * 0.1

    inv_ts = inversion_timesteps(CFG, steps)
    smp_ts = sampling_timesteps(CFG, steps)

    x = x0
    for t in inv_ts:
        x = sch.inverse_step(eps, t, x, steps)
    for t in smp_ts:
        x = sch.step(eps, t, x, steps)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=2e-2)

    # interior identity (skip the asymmetric boundary step pair): exact
    x1 = sch.inverse_step(eps, inv_ts[0], x0, steps)
    x = x1
    for t in inv_ts[1:]:
        x = sch.inverse_step(eps, t, x, steps)
    for t in smp_ts[:-1]:
        x = sch.step(eps, t, x, steps)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x1), atol=5e-5)


def test_step_under_scan_matches_python_loop():
    sch = DDIM(CFG)
    steps = 20
    ts = jnp.asarray(sampling_timesteps(CFG, steps))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(3), x.shape) * 0.3

    def body(carry, t):
        return sch.step(eps, t, carry, steps), None

    scanned, _ = jax.lax.scan(body, x, ts)
    looped = x
    for t in np.asarray(ts):
        looped = sch.step(eps, t, looped, steps)
    np.testing.assert_allclose(np.asarray(scanned), np.asarray(looped), rtol=1e-6)


def test_v_prediction_and_clip_sample_paths():
    cfg = SchedulerConfig(prediction_type="v_prediction", clip_sample=True, clip_sample_range=1.0)
    sch = DDIM(cfg)
    x = jnp.ones((1, 4)) * 3.0
    v = jnp.zeros_like(x)
    out = sch.step(v, 501, x, 50)
    assert np.isfinite(np.asarray(out)).all()


def test_add_noise_matches_closed_form():
    sch = DDIM(CFG)
    x0 = jnp.ones((2, 3))
    noise = jnp.full((2, 3), 2.0)
    t = 500
    a = float(np.asarray(sch.alphas_cumprod[t]))
    out = np.asarray(sch.add_noise(x0, noise, t))
    np.testing.assert_allclose(out, np.sqrt(a) * 1.0 + np.sqrt(1 - a) * 2.0, rtol=1e-6)


def test_step_is_algebraic_inverse_of_inverse_step(rng):
    """For a FIXED eps tensor, inverse_step(x, t) then step(x, t) must return
    x exactly (the update formulas are algebraic inverses when the same eps
    and the same (from, to) alpha pair are used) — interior steps only (the
    boundary step differs: DDIMInverse uses initial_alpha=1.0, DDIM uses
    final_alpha_cumprod)."""
    import jax.numpy as jnp
    from mvoc_tpu.ops.ddim import DDIM, SchedulerConfig, inversion_timesteps

    ddim = DDIM(SchedulerConfig())
    n = 10
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 3), dtype=np.float32))
    eps = jnp.asarray(rng.standard_normal((2, 4, 4, 3), dtype=np.float32))
    for t in inversion_timesteps(SchedulerConfig(), n)[1:]:  # skip boundary
        up = ddim.inverse_step(eps, int(t), x, n)
        back = ddim.step(eps, int(t), up, n)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_roundtrip_convergence_with_state_dependent_eps(rng):
    """Invert-then-sample error must shrink as steps grow (first-order
    discretization error of the PnP/DDIM inversion scheme)."""
    import jax.numpy as jnp
    from mvoc_tpu.ops.ddim import (
        DDIM, SchedulerConfig, inversion_timesteps, sampling_timesteps)

    cfg = SchedulerConfig()
    ddim = DDIM(cfg)
    x0 = jnp.asarray(rng.standard_normal((2, 8, 8, 4), dtype=np.float32))

    def eps_fn(x):
        return 0.3 * jnp.tanh(x) + 0.1 * jnp.roll(x, 1, axis=1)

    errs = {}
    for n in (10, 50):
        x = x0
        for t in inversion_timesteps(cfg, n):
            x = ddim.inverse_step(eps_fn(x), int(t), x, n)
        for t in sampling_timesteps(cfg, n):
            x = ddim.step(eps_fn(x), int(t), x, n)
        errs[n] = float(jnp.linalg.norm(x - x0) / jnp.linalg.norm(x0))
    assert errs[10] < 0.2
    assert errs[50] < errs[10] / 2


def test_eta_sampling_reduces_to_ddim_at_zero(rng):
    """eta=0 with noise supplied must equal the deterministic step; eta>0
    adds the DDPM-style variance term (reference passes eta through
    prepare_extra_step_kwargs, pipeline_i2vgen_xl.py:794-809)."""
    import jax
    import jax.numpy as jnp
    from mvoc_tpu.ops.ddim import DDIM, SchedulerConfig

    ddim = DDIM(SchedulerConfig())
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 4), dtype=np.float32))
    eps = jnp.asarray(rng.standard_normal((2, 4, 4, 4), dtype=np.float32))
    noise = jnp.asarray(rng.standard_normal((2, 4, 4, 4), dtype=np.float32))
    det = ddim.step(eps, 501, x, 10)
    det2 = ddim.step(eps, 501, x, 10, eta=0.0)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))
    sto = ddim.step(eps, 501, x, 10, eta=1.0, noise=noise)
    assert np.abs(np.asarray(sto) - np.asarray(det)).max() > 1e-3
    with pytest.raises(ValueError):
        ddim.step(eps, 501, x, 10, eta=0.5)  # noise required

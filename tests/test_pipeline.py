"""Pipeline cores + end-to-end tiny-pipeline tests.

The centerpiece is the DDIM reconstruction round-trip — the reference's
de-facto integration test (SURVEY.md §4: invert then re-sample and compare;
reference inverse.py:192-227) — executed numerically on a tiny random UNet:
inversion followed by sampling must approximately recover the original
latents.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvoc_tpu.io.trajectory import TrajectoryStore
from mvoc_tpu.ops.ddim import DDIM, SchedulerConfig, inversion_timesteps, sampling_timesteps
from mvoc_tpu.pipeline import core
from mvoc_tpu.utils import testing as tt

F, LAT = tt.TINY_FRAMES, tt.TINY_HW // 2  # 2 frames, 8x8 latents
N_STEPS = 10


@pytest.fixture(scope="module")
def pipe():
    return tt.build_tiny_pipeline()


@pytest.fixture(scope="module")
def cond1(pipe):
    """Branch-1 conditioning (no CFG) built from tiny synthetic data."""
    rng = np.random.default_rng(3)
    d = pipe.unet.config.cross_attention_dim
    return core.UNetConditioning(
        encoder_hidden_states=jnp.asarray(rng.standard_normal((1, 7, d), dtype=np.float32)),
        image_latents_first=jnp.asarray(rng.standard_normal((1, F, LAT, LAT, 4), dtype=np.float32)),
        image_latents=jnp.asarray(rng.standard_normal((1, F, LAT, LAT, 4), dtype=np.float32)),
        image_embeddings=jnp.asarray(rng.standard_normal((1, F, d), dtype=np.float32)),
        fps=jnp.asarray([8]),
    )


def test_inversion_reconstruction_roundtrip(pipe, cond1):
    """invert(x0) -> trajectory; sample(trajectory[-1]) ~= x0.

    A RANDOM-init UNet is a rough (high-Lipschitz) eps model, so the
    first-order inversion error is much larger than with trained weights;
    the test checks the reconstruction is strongly correlated with the
    source and that more steps shrink the error (exact convergence-order
    checks live in test_ddim with an analytic eps)."""
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.standard_normal((F, LAT, LAT, 4), dtype=np.float32))
    ddim = DDIM(SchedulerConfig())

    def roundtrip(n):
        inv_ts = inversion_timesteps(SchedulerConfig(), n)
        traj = core.ddim_inversion_core(
            pipe._unet_apply, ddim, pipe.params["unet"], x0, cond1,
            jnp.asarray(inv_ts), n, 1.0,
        )
        assert traj.shape == (n, F, LAT, LAT, 4)
        samp_ts = sampling_timesteps(SchedulerConfig(), n)
        rec = core.ddim_sampling_core(
            pipe._unet_apply, ddim, pipe.params["unet"], traj[-1], cond1,
            jnp.asarray(samp_ts), n, 1.0,
        )
        return np.linalg.norm(np.asarray(rec) - np.asarray(x0)) / np.linalg.norm(np.asarray(x0))

    err_lo, err_hi = roundtrip(N_STEPS), roundtrip(N_STEPS * 5)
    assert err_hi < err_lo, f"no convergence: {err_lo:.3f} -> {err_hi:.3f}"
    # the magnitude itself is dominated by the random UNet's Lipschitz
    # constant and drifts with benign fp reassociation; convergence above is
    # the meaningful property (exact-rate checks live in test_ddim)
    assert err_hi < 1.3, f"roundtrip error too high at {N_STEPS * 5} steps: {err_hi:.3f}"


def test_truncated_start_matches_suffix(pipe, cond1):
    """Sampling from trajectory[t_idx] with truncated timesteps equals the
    suffix of sampling the full chain (pure-function determinism), i.e. the
    ddim_init_latents_t_idx contract (reference pipeline_i2vgen_xl.py:1141)."""
    rng = np.random.default_rng(5)
    ddim = DDIM(SchedulerConfig())
    samp_ts = sampling_timesteps(SchedulerConfig(), N_STEPS)
    xT = jnp.asarray(rng.standard_normal((F, LAT, LAT, 4), dtype=np.float32))
    t_idx = 3

    full = core.ddim_sampling_core(
        pipe._unet_apply, ddim, pipe.params["unet"], xT, cond1,
        jnp.asarray(samp_ts), N_STEPS, 1.0,
    )
    # run the first t_idx steps manually, then the truncated core
    lat = xT
    for t in samp_ts[:t_idx]:
        eps = pipe.unet.apply(
            pipe.params["unet"], sample=lat[None], timestep=jnp.asarray(t),
            fps=cond1.fps, image_latents_first=cond1.image_latents_first,
            image_latents=cond1.image_latents, image_embeddings=cond1.image_embeddings,
            encoder_hidden_states=cond1.encoder_hidden_states,
        )[0]
        lat = ddim.step(eps, jnp.asarray(t), lat, N_STEPS)
    trunc = core.ddim_sampling_core(
        pipe._unet_apply, ddim, pipe.params["unet"], lat, cond1,
        jnp.asarray(samp_ts[t_idx:]), N_STEPS, 1.0,
    )
    np.testing.assert_allclose(np.asarray(trunc), np.asarray(full), atol=2e-4)


def test_trajectory_store_roundtrip(tmp_path, rng):
    ts = [1, 101, 201]
    lat = rng.standard_normal((3, F, LAT, LAT, 4)).astype(np.float32)
    store = TrajectoryStore(str(tmp_path / "traj"))
    store.save(ts, lat)
    store2 = TrajectoryStore(str(tmp_path / "traj"))
    np.testing.assert_array_equal(store2.timesteps, ts)
    got = store2.load_at_t(101)
    np.testing.assert_allclose(got, lat[1], atol=1e-3)  # fp16 storage
    g = store2.gather([201, 1])
    np.testing.assert_allclose(g[0], lat[2], atol=1e-3)
    t, noisiest = store2.load_at_T()
    assert t == 201


def test_trajectory_store_reads_reference_pt_layout(tmp_path):
    """Interop: consume the reference's per-step torch files
    (pipeline_i2vgen_xl.py:1988-1996 layout: [1, C, F, h, w])."""
    import torch

    d = tmp_path / "ref"
    d.mkdir()
    x = torch.randn(1, 4, F, LAT, LAT)
    torch.save(x, d / "ddim_latents_41.pt")
    store = TrajectoryStore(str(d))
    got = store.load_at_t(41)
    ref = x[0].permute(1, 2, 3, 0).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-6)
    assert list(store.timesteps) == [41]


def test_prepare_image_latents_ramp():
    z = jnp.ones((LAT, LAT, 4)) * 7.0
    out = core.prepare_image_latents(z, 5)
    assert out.shape == (5, LAT, LAT, 4)
    np.testing.assert_allclose(np.asarray(out[0]), 7.0)
    np.testing.assert_allclose(np.asarray(out[1]), 0.25)  # 1/(5-1)
    np.testing.assert_allclose(np.asarray(out[4]), 1.0)


def test_composite_equals_plain_cfg_when_disabled(pipe, cond1):
    """With all gates off, no fusion, and zero noise ratio, the composite
    sampler must produce the plain CFG sampling result — the extra source
    branches ride along but cannot influence the edit branches.

    Compared over 2 steps: the per-step batch-5-vs-batch-2 fp difference is
    ~3e-6 (verified), but a random-init UNet amplifies it chaotically over
    long chains, so a full-chain bitwise comparison is meaningless."""
    rng = np.random.default_rng(6)
    n_obj = 1
    d = pipe.unet.config.cross_attention_dim
    ddim = DDIM(SchedulerConfig())
    samp_ts = sampling_timesteps(SchedulerConfig(), N_STEPS)
    run_ts = samp_ts[1:3]
    S = len(run_ts)

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s, dtype=np.float32))

    # 2-branch cond for the plain sampler; composite appends source branches
    uncond = {k: np.asarray(getattr(cond1, k)) for k in (
        "encoder_hidden_states", "image_latents_first", "image_latents", "image_embeddings")}
    cond_embeds = {k: v + 0.1 for k, v in uncond.items()}

    cond2 = core.UNetConditioning(
        **{k: jnp.concatenate([jnp.asarray(uncond[k]), jnp.asarray(cond_embeds[k])]) for k in uncond},
        fps=jnp.asarray([8, 8]),
    )
    src = {k: mk(n_obj + 1, *uncond[k].shape[1:]) for k in uncond}
    condN = core.UNetConditioning(
        **{k: jnp.concatenate([src[k], jnp.asarray(uncond[k]), jnp.asarray(cond_embeds[k])]) for k in uncond},
        fps=jnp.asarray([8] * (n_obj + 3)),
    )

    xT = mk(F, LAT, LAT, 4)
    plain = core.ddim_sampling_core(
        pipe._unet_apply, ddim, pipe.params["unet"], xT, cond2,
        jnp.asarray(run_ts), N_STEPS, 3.0,
    )

    masks_soft = np.zeros((n_obj, F, LAT, LAT), np.float32)
    from mvoc_tpu import pnp as pnp_lib

    res = [(LAT, LAT), (LAT // 2, LAT // 2), (LAT // 4, LAT // 4)]
    pyr = {k: jnp.asarray(v) for k, v in pnp_lib.build_mask_pyramid(masks_soft, res).items()}
    off = jnp.asarray(np.zeros(S, dtype=bool))
    sched = core.CompositeSchedule(
        bg_traj=mk(S, F, LAT, LAT, 4),
        obj_traj=mk(S, n_obj, F, LAT, LAT, 4),
        obj_fusion_lat=mk(n_obj, F, LAT, LAT, 4),
        gate_spatial=off, gate_temporal=off, gate_conv=off,
        fusion_mask=off,
        timesteps=jnp.asarray(run_ts),
    )
    comp = core.pnp_composite_core(
        pipe._unet_apply, ddim, pipe.params["unet"], xT, condN, sched,
        jnp.asarray(masks_soft), pyr, pyr,
        num_inference_steps=N_STEPS, guidance_scale=3.0,
    )
    np.testing.assert_allclose(np.asarray(comp), np.asarray(plain), atol=5e-3)


def test_end_to_end_tiny_invert_reconstruct(tmp_path, pipe):
    """Full host-level round trip through the pipeline class: PIL frames ->
    invert -> trajectory store -> truncated reconstruction -> decode."""
    frames = tt.tiny_frames()
    out_dir = str(tmp_path / "inv")
    ts, traj = pipe.invert(
        frames, prompt="", height=tt.TINY_HW, width=tt.TINY_HW,
        num_frames=F, num_inference_steps=N_STEPS, guidance_scale=1.0,
        output_dir=out_dir, seed=1,
    )
    assert traj.shape[0] == N_STEPS

    store = TrajectoryStore(out_dir)
    samp_ts = sampling_timesteps(SchedulerConfig(), N_STEPS)
    t_idx = 1
    start = store.load_at_t(int(samp_ts[t_idx]))
    video = pipe.sample(
        frames[0], prompt="", height=tt.TINY_HW, width=tt.TINY_HW,
        num_frames=F, num_inference_steps=N_STEPS, guidance_scale=1.0,
        ddim_init_latents_t_idx=t_idx, latents=jnp.asarray(start), seed=1,
    )
    assert video.shape == (F, tt.TINY_HW, tt.TINY_HW, 3)
    assert np.isfinite(video).all()


def test_native_trajectory_codec_roundtrip(tmp_path, rng):
    """C++ mmap container: write fp32 -> fp16, gather back, fp16-accurate;
    subnormals/overflow handled; numpy fallback parity."""
    from mvoc_tpu.io import native

    if native.get_lib() is None:
        pytest.skip("native codec unavailable")
    lat = rng.standard_normal((5, F, LAT, LAT, 4)).astype(np.float32)
    lat[0, 0, 0, 0, 0] = 1e-8   # fp16 subnormal range
    lat[0, 0, 0, 0, 1] = 1e6    # fp16 overflow -> inf
    ts = [1, 3, 5, 7, 9]
    store = TrajectoryStore(str(tmp_path / "nat"), prefer_native=True)
    out = store.save(ts, lat)
    assert out.endswith(".mvoctraj")

    store2 = TrajectoryStore(str(tmp_path / "nat"))
    np.testing.assert_array_equal(store2.timesteps, ts)
    got = store2.gather([5, 1])
    with np.errstate(over="ignore"):  # the 1e6 -> inf cast is the point
        ref = lat.astype(np.float16).astype(np.float32)
    np.testing.assert_array_equal(got[0], ref[2])
    np.testing.assert_array_equal(got[1], ref[0])
    assert np.isinf(got[1][0, 0, 0, 1])
    with pytest.raises(KeyError):
        store2.load_at_t(999)


def test_encoder_reuse(pipe, cond1):
    """(a) UNet: reusing the encoder cache from identical inputs is exact.
    (b) composite scan with encoder_reuse_interval=2 runs and stays close to
    the exact result (features drift slowly by construction of the test:
    identical conditioning, small step count)."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, F, LAT, LAT, 4), dtype=np.float32))
    kwargs = dict(
        sample=x, timestep=jnp.asarray(501), fps=cond1.fps,
        image_latents_first=cond1.image_latents_first,
        image_latents=cond1.image_latents,
        image_embeddings=cond1.image_embeddings,
        encoder_hidden_states=cond1.encoder_hidden_states,
    )
    eps_full, cache = pipe.unet.apply(pipe.params["unet"], **kwargs, return_encoder=True)
    eps_cached = pipe.unet.apply(pipe.params["unet"], **kwargs, cached_encoder=cache)
    np.testing.assert_allclose(np.asarray(eps_cached), np.asarray(eps_full), atol=1e-6)

    # (b) full composite scan with reuse enabled
    from mvoc_tpu import pnp as pnp_lib

    n_obj = 1
    ddim = DDIM(SchedulerConfig())
    run_ts = sampling_timesteps(SchedulerConfig(), N_STEPS)[:4]
    S = len(run_ts)

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s, dtype=np.float32))

    condN = core.UNetConditioning(
        encoder_hidden_states=mk(n_obj + 3, 7, 16),
        image_latents_first=mk(n_obj + 3, F, LAT, LAT, 4),
        image_latents=mk(n_obj + 3, F, LAT, LAT, 4),
        image_embeddings=mk(n_obj + 3, F, 16),
        fps=jnp.asarray([8] * (n_obj + 3)),
    )
    masks_soft = np.zeros((n_obj, F, LAT, LAT), np.float32)
    masks_soft[:, :, : LAT // 2] = 1.0
    res = [(LAT, LAT), (LAT // 2, LAT // 2), (LAT // 4, LAT // 4)]
    pyr = {k: jnp.asarray(v) for k, v in pnp_lib.build_mask_pyramid(masks_soft, res).items()}
    on = jnp.ones((S,), bool)
    sched = core.CompositeSchedule(
        bg_traj=mk(S, F, LAT, LAT, 4), obj_traj=mk(S, n_obj, F, LAT, LAT, 4),
        obj_fusion_lat=mk(n_obj, F, LAT, LAT, 4),
        gate_spatial=on, gate_temporal=on, gate_conv=on,
        fusion_mask=jnp.zeros((S,), bool), timesteps=jnp.asarray(run_ts),
    )
    xT = mk(F, LAT, LAT, 4)

    def run(interval):
        return np.asarray(core.pnp_composite_core(
            pipe._unet_apply, ddim, pipe.params["unet"], xT, condN, sched,
            jnp.asarray(masks_soft), pyr, pyr,
            num_inference_steps=N_STEPS, guidance_scale=3.0,
            encoder_reuse_interval=interval,
        ))

    exact = run(1)
    approx = run(2)
    assert approx.shape == exact.shape
    assert np.isfinite(approx).all()
    # the approximation must differ (it skips encoder steps) but remain
    # strongly correlated with the exact chain
    assert np.abs(approx - exact).max() > 1e-6
    corr = np.corrcoef(approx.ravel(), exact.ravel())[0, 1]
    assert corr > 0.8, corr


def test_inversion_encoder_reuse_runs(pipe, cond1):
    """invert() with encoder_reuse_interval=2 produces a full trajectory
    correlated with the exact one."""
    from mvoc_tpu.utils import testing as tt2

    frames = tt2.tiny_frames()
    ts1, traj1 = pipe.invert(
        frames, height=tt2.TINY_HW, width=tt2.TINY_HW, num_frames=F,
        num_inference_steps=6, guidance_scale=1.0, seed=3,
    )
    ts2, traj2 = pipe.invert(
        frames, height=tt2.TINY_HW, width=tt2.TINY_HW, num_frames=F,
        num_inference_steps=6, guidance_scale=1.0, seed=3,
        encoder_reuse_interval=2,
    )
    np.testing.assert_array_equal(ts1, ts2)
    assert traj2.shape == traj1.shape
    assert np.isfinite(traj2).all()
    corr = np.corrcoef(traj1.ravel(), traj2.ravel())[0, 1]
    assert corr > 0.9, corr
    # approximation must actually differ
    assert np.abs(traj1 - traj2).max() > 1e-6

    # deep reuse (cached steps also broadcast up-block attention outputs):
    # runs, finite, and reuses strictly more than encoder reuse alone
    ts3, traj3 = pipe.invert(
        frames, height=tt2.TINY_HW, width=tt2.TINY_HW, num_frames=F,
        num_inference_steps=6, guidance_scale=1.0, seed=3,
        encoder_reuse_interval=2, deep_reuse=True,
    )
    np.testing.assert_array_equal(ts1, ts3)
    assert np.isfinite(traj3).all()
    assert np.abs(traj3 - traj2).max() > 1e-6


def test_trajectory_meta_stale_cache_detection(tmp_path, rng):
    lat = rng.standard_normal((2, F, LAT, LAT, 4)).astype(np.float32)
    store = TrajectoryStore(str(tmp_path / "m"))
    store.save([1, 3], lat, meta={"n_steps": 2, "prompt": "a"})
    s2 = TrajectoryStore(str(tmp_path / "m"))
    assert s2.meta["n_steps"] == 2
    assert s2.matches_meta({"n_steps": 2, "prompt": "a"})
    assert s2.matches_meta({"n_steps": 2, "unknown_key": "x"})  # intersection only
    assert not s2.matches_meta({"n_steps": 5})
    # legacy store without meta: assume match (reference behavior)
    store3 = TrajectoryStore(str(tmp_path / "nometa"))
    store3.save([1], lat[:1])
    # missing meta = NOT a match (stale/foreign caches must recompute)
    assert not TrajectoryStore(str(tmp_path / "nometa")).matches_meta({"n_steps": 9})
    assert TrajectoryStore(str(tmp_path / "nometa")).matches_meta(
        {"n_steps": 9}, missing_ok=True)


def test_bf16_inversion_tracks_fp32(pipe, cond1):
    """bf16 compute must stay usable for inversion: the bf16 trajectory must
    correlate strongly with fp32 over a multi-step chain (the real risk for
    500-step runs flagged in SURVEY.md §7 'hard parts'; scheduler math is
    fp32 in both cases)."""
    import dataclasses as dc

    from mvoc_tpu.models.unet_i2vgen import I2VGenXLUNet

    rng = np.random.default_rng(12)
    x0 = jnp.asarray(rng.standard_normal((F, LAT, LAT, 4), dtype=np.float32))
    ddim = DDIM(SchedulerConfig())
    inv_ts = inversion_timesteps(SchedulerConfig(), 20)

    unet_bf16 = I2VGenXLUNet(pipe.unet.config, dtype=jnp.bfloat16)

    def apply32(p, **kw):
        return pipe.unet.apply(p, **kw)

    def apply16(p, **kw):
        return unet_bf16.apply(p, **kw)

    t32 = np.asarray(core.ddim_inversion_core(
        apply32, ddim, pipe.params["unet"], x0, cond1, jnp.asarray(inv_ts), 20, 1.0))
    t16 = np.asarray(core.ddim_inversion_core(
        apply16, ddim, pipe.params["unet"], x0, cond1, jnp.asarray(inv_ts), 20, 1.0))
    corr = np.corrcoef(t32[-1].ravel(), t16[-1].ravel())[0, 1]
    assert corr > 0.95, corr
    rel = np.linalg.norm(t16[-1] - t32[-1]) / np.linalg.norm(t32[-1])
    assert rel < 0.35, rel


def test_composite_two_pass_equals_fused(pipe, cond1):
    """two_pass=True composite scan == fused scan, exactly (same math,
    different batching)."""
    rng = np.random.default_rng(15)
    n_obj = 2
    ddim = DDIM(SchedulerConfig())
    run_ts = sampling_timesteps(SchedulerConfig(), N_STEPS)[:3]
    S = len(run_ts)

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s, dtype=np.float32))

    condN = core.UNetConditioning(
        encoder_hidden_states=mk(n_obj + 3, 7, 16),
        image_latents_first=mk(n_obj + 3, F, LAT, LAT, 4),
        image_latents=mk(n_obj + 3, F, LAT, LAT, 4),
        image_embeddings=mk(n_obj + 3, F, 16),
        fps=jnp.asarray([8] * (n_obj + 3)),
    )
    from mvoc_tpu import pnp as pnp_lib

    masks_soft = np.zeros((n_obj, F, LAT, LAT), np.float32)
    masks_soft[0, :, : LAT // 2] = 1.0
    masks_soft[1, :, :, : LAT // 2] = 1.0
    res = [(LAT, LAT), (LAT // 2, LAT // 2), (LAT // 4, LAT // 4)]
    pyr = {k: jnp.asarray(v) for k, v in pnp_lib.build_mask_pyramid(masks_soft, res).items()}
    on = jnp.ones((S,), bool)
    sched = core.CompositeSchedule(
        bg_traj=mk(S, F, LAT, LAT, 4), obj_traj=mk(S, n_obj, F, LAT, LAT, 4),
        obj_fusion_lat=mk(n_obj, F, LAT, LAT, 4),
        gate_spatial=on, gate_temporal=on, gate_conv=on,
        fusion_mask=jnp.asarray([True] + [False] * (S - 1)),
        timesteps=jnp.asarray(run_ts),
    )
    xT = mk(F, LAT, LAT, 4)

    def run(two_pass):
        return np.asarray(core.pnp_composite_core(
            pipe._unet_apply, ddim, pipe.params["unet"], xT, condN, sched,
            jnp.asarray(masks_soft), pyr, pyr,
            num_inference_steps=N_STEPS, guidance_scale=3.0,
            random_noise_ratio=0.3, two_pass=two_pass,
        ))

    fused = run(False)
    two = run(True)
    np.testing.assert_allclose(two, fused, atol=5e-4)


def test_composite_two_pass_with_encoder_reuse(pipe, cond1):
    """two_pass + encoder reuse == fused + encoder reuse, exactly: the
    encoder is per-batch-element, so split (src, edit) caches are the fused
    batch cache in two pieces."""
    rng = np.random.default_rng(16)
    n_obj = 2
    ddim = DDIM(SchedulerConfig())
    run_ts = sampling_timesteps(SchedulerConfig(), N_STEPS)[:4]
    S = len(run_ts)

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s, dtype=np.float32))

    condN = core.UNetConditioning(
        encoder_hidden_states=mk(n_obj + 3, 7, 16),
        image_latents_first=mk(n_obj + 3, F, LAT, LAT, 4),
        image_latents=mk(n_obj + 3, F, LAT, LAT, 4),
        image_embeddings=mk(n_obj + 3, F, 16),
        fps=jnp.asarray([8] * (n_obj + 3)),
    )
    from mvoc_tpu import pnp as pnp_lib

    masks_soft = np.zeros((n_obj, F, LAT, LAT), np.float32)
    masks_soft[0, :, : LAT // 2] = 1.0
    masks_soft[1, :, :, : LAT // 2] = 1.0
    res = [(LAT, LAT), (LAT // 2, LAT // 2), (LAT // 4, LAT // 4)]
    pyr = {k: jnp.asarray(v) for k, v in pnp_lib.build_mask_pyramid(masks_soft, res).items()}
    on = jnp.ones((S,), bool)
    sched = core.CompositeSchedule(
        bg_traj=mk(S, F, LAT, LAT, 4), obj_traj=mk(S, n_obj, F, LAT, LAT, 4),
        obj_fusion_lat=mk(n_obj, F, LAT, LAT, 4),
        gate_spatial=on, gate_temporal=on, gate_conv=on,
        fusion_mask=jnp.asarray([True] + [False] * (S - 1)),
        timesteps=jnp.asarray(run_ts),
    )
    xT = mk(F, LAT, LAT, 4)

    def run(two_pass, interval):
        # compiled end-to-end: the blockwise fresh/cached split is static
        # (no lax.cond-of-scan — the structure that used to crash XLA:CPU),
        # so the production graph compiles in CI too
        return np.asarray(jax.jit(
            lambda params, lat: core.pnp_composite_core(
                pipe._unet_apply, ddim, params, lat, condN, sched,
                jnp.asarray(masks_soft), pyr, pyr,
                num_inference_steps=N_STEPS, guidance_scale=3.0,
                random_noise_ratio=0.3, two_pass=two_pass,
                encoder_reuse_interval=interval,
            ))(pipe.params["unet"], xT))

    fused_reuse = run(False, 2)
    two_reuse = run(True, 2)
    exact = run(False, 1)
    np.testing.assert_allclose(two_reuse, fused_reuse, atol=5e-4)
    # reuse actually approximates (differs from exact) yet stays correlated
    assert np.abs(fused_reuse - exact).max() > 1e-6
    corr = np.corrcoef(fused_reuse.ravel(), exact.ravel())[0, 1]
    assert corr > 0.8, corr


def test_composite_stream_capture_equals_fused(pipe, cond1):
    """two_pass='stream' (per-branch capture scan) == fused scan: the
    per-branch terms x_b*M_b sum to the batched pre-composite exactly."""
    rng = np.random.default_rng(17)
    n_obj = 2
    ddim = DDIM(SchedulerConfig())
    run_ts = sampling_timesteps(SchedulerConfig(), N_STEPS)[:3]
    S = len(run_ts)

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s, dtype=np.float32))

    condN = core.UNetConditioning(
        encoder_hidden_states=mk(n_obj + 3, 7, 16),
        image_latents_first=mk(n_obj + 3, F, LAT, LAT, 4),
        image_latents=mk(n_obj + 3, F, LAT, LAT, 4),
        image_embeddings=mk(n_obj + 3, F, 16),
        fps=jnp.asarray([8] * (n_obj + 3)),
    )
    from mvoc_tpu import pnp as pnp_lib

    masks_soft = np.zeros((n_obj, F, LAT, LAT), np.float32)
    masks_soft[0, :, : LAT // 2] = 1.0
    masks_soft[1, :, :, : LAT // 2] = 1.0
    res = [(LAT, LAT), (LAT // 2, LAT // 2), (LAT // 4, LAT // 4)]
    pyr = {k: jnp.asarray(v) for k, v in pnp_lib.build_mask_pyramid(masks_soft, res).items()}
    on = jnp.ones((S,), bool)
    sched = core.CompositeSchedule(
        bg_traj=mk(S, F, LAT, LAT, 4), obj_traj=mk(S, n_obj, F, LAT, LAT, 4),
        obj_fusion_lat=mk(n_obj, F, LAT, LAT, 4),
        gate_spatial=on, gate_temporal=on, gate_conv=on,
        fusion_mask=jnp.asarray([True] + [False] * (S - 1)),
        timesteps=jnp.asarray(run_ts),
    )
    xT = mk(F, LAT, LAT, 4)

    def run(two_pass, inject_background, cw):
        # compiled end-to-end (the historical XLA:CPU crash was the
        # mmap-exhaustion issue conftest now mitigates via max_map_count)
        return np.asarray(jax.jit(
            lambda params, lat: core.pnp_composite_core(
                pipe._unet_apply, ddim, params, lat, condN, sched,
                jnp.asarray(masks_soft), pyr, pyr,
                num_inference_steps=N_STEPS, guidance_scale=3.0,
                random_noise_ratio=0.3, two_pass=two_pass,
                inject_background=inject_background, capture_weights=cw,
            ))(pipe.params["unet"], xT))

    cw_true = pnp_lib.build_capture_weights(pyr, pyr, inject_background=True)
    np.testing.assert_allclose(
        run("stream", True, cw_true), run(False, True, None), atol=5e-4)
    # inject_background=False exercises the zeroed bg qk weight + edit base
    cw_false = pnp_lib.build_capture_weights(pyr, pyr, inject_background=False)
    np.testing.assert_allclose(
        run("stream", False, cw_false), run(False, False, None), atol=5e-4)


def test_pab_cache_replaces_attention_exactly(pipe, cond1):
    """PAB wiring: pab_capture sows every up-block attention output; feeding
    the captured dict back as pab_cache on IDENTICAL inputs must reproduce
    the same eps bit-for-bit (the cache substitutes, never perturbs), and
    the capture pass itself must equal the plain forward."""
    rng = np.random.default_rng(21)
    d = pipe.unet.config.cross_attention_dim
    B = 5
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    kw = dict(
        sample=mk(B, F, LAT, LAT, 4),
        timestep=jnp.asarray([500] * B), fps=jnp.asarray([8] * B),
        image_latents_first=mk(B, F, LAT, LAT, 4),
        image_latents=mk(B, F, LAT, LAT, 4),
        image_embeddings=mk(B, F, d),
        encoder_hidden_states=mk(B, 7, d),
    )
    eps_plain = pipe.unet.apply(pipe.params["unet"], **kw)
    eps_cap, variables = pipe.unet.apply(
        pipe.params["unet"], **kw, pab_capture=True, mutable=["attn_out"])
    cache = {k: v[0] for k, v in variables["attn_out"].items()}
    # up_blocks 1..3 x 3 layers x (spatial a1+a2, temporal a1+a2) = 36 sites
    assert len(cache) == 36, sorted(cache)
    np.testing.assert_allclose(np.asarray(eps_cap), np.asarray(eps_plain),
                               atol=1e-6)
    eps_cached = pipe.unet.apply(pipe.params["unet"], **kw, pab_cache=cache)
    np.testing.assert_allclose(np.asarray(eps_cached), np.asarray(eps_plain),
                               atol=1e-6)


def test_composite_pab_interval(pipe, cond1):
    """pnp_composite_core with pab_interval=2: step 0 recomputes attention,
    step 1 broadcasts it.  The scan must compile/run, stay finite, and step
    0 must agree with the exact path (divergence only begins at cached
    steps)."""
    from mvoc_tpu import pnp as pnp_lib
    from mvoc_tpu.ops.ddim import sampling_timesteps

    rng = np.random.default_rng(22)
    n_obj = 2
    B = n_obj + 3
    d = pipe.unet.config.cross_attention_dim
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    cond = core.UNetConditioning(
        encoder_hidden_states=mk(B, 7, d),
        image_latents_first=mk(B, F, LAT, LAT, 4),
        image_latents=mk(B, F, LAT, LAT, 4),
        image_embeddings=mk(B, F, d),
        fps=jnp.asarray([8] * B),
    )
    masks = np.zeros((n_obj, F, LAT, LAT), np.float32)
    masks[0, :, : LAT // 2] = 1.0
    masks[1, :, :, : LAT // 2] = 1.0
    res = [(LAT, LAT), (LAT // 2, LAT // 2), (LAT // 4, LAT // 4)]
    pyr = {k: jnp.asarray(v)
           for k, v in pnp_lib.build_mask_pyramid(masks, res).items()}
    S = 3
    ts = jnp.asarray(sampling_timesteps(SchedulerConfig(), 10)[:S])
    on = jnp.ones((S,), bool)
    sched = core.CompositeSchedule(
        bg_traj=mk(S, F, LAT, LAT, 4),
        obj_traj=mk(S, n_obj, F, LAT, LAT, 4),
        obj_fusion_lat=mk(n_obj, F, LAT, LAT, 4),
        gate_spatial=on, gate_temporal=on, gate_conv=on,
        fusion_mask=jnp.asarray([True, False, False]),
        timesteps=ts,
    )
    ddim = DDIM(SchedulerConfig())
    xT = mk(F, LAT, LAT, 4)

    def run(pab_interval, n_steps_used):
        import dataclasses as dc

        s = dc.replace(
            sched,
            bg_traj=sched.bg_traj[:n_steps_used],
            obj_traj=sched.obj_traj[:n_steps_used],
            gate_spatial=sched.gate_spatial[:n_steps_used],
            gate_temporal=sched.gate_temporal[:n_steps_used],
            gate_conv=sched.gate_conv[:n_steps_used],
            fusion_mask=sched.fusion_mask[:n_steps_used],
            timesteps=sched.timesteps[:n_steps_used])
        kw = {}
        if pab_interval > 1:
            kw = dict(pab_interval=pab_interval)
        return np.asarray(core.pnp_composite_core(
            pipe._unet_apply, ddim, pipe.params["unet"], xT, cond, s,
            jnp.asarray(masks), pyr, pyr,
            num_inference_steps=10, guidance_scale=3.0,
            random_noise_ratio=0.3, **kw))

    exact1 = run(1, 1)
    pab1 = run(2, 1)  # one step: always fresh -> identical to exact
    np.testing.assert_allclose(pab1, exact1, atol=1e-5)

    pab3 = run(2, 3)  # steps 0,2 fresh, 1 cached: runs + finite
    assert pab3.shape == exact1.shape
    assert np.isfinite(pab3).all()
    exact3 = run(1, 3)
    assert not np.allclose(pab3, exact3), (
        "pab interval 2 should actually skip attention on cached steps")


def test_composite_capture_reuse(pipe, cond1):
    """pnp_composite_core with capture_reuse_interval=2 on the stream path:
    step 0 captures source features, step 1 broadcasts them (no capture
    pass).  One step == exact; 3 steps runs, finite, and differs from exact
    (features are genuinely reused on cached steps)."""
    from mvoc_tpu import pnp as pnp_lib
    from mvoc_tpu.ops.ddim import sampling_timesteps

    rng = np.random.default_rng(23)
    n_obj = 2
    B = n_obj + 3
    d = pipe.unet.config.cross_attention_dim
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    cond = core.UNetConditioning(
        encoder_hidden_states=mk(B, 7, d),
        image_latents_first=mk(B, F, LAT, LAT, 4),
        image_latents=mk(B, F, LAT, LAT, 4),
        image_embeddings=mk(B, F, d),
        fps=jnp.asarray([8] * B),
    )
    masks = np.zeros((n_obj, F, LAT, LAT), np.float32)
    masks[0, :, : LAT // 2] = 1.0
    masks[1, :, :, : LAT // 2] = 1.0
    res = [(LAT, LAT), (LAT // 2, LAT // 2), (LAT // 4, LAT // 4)]
    pyr = {k: jnp.asarray(v)
           for k, v in pnp_lib.build_mask_pyramid(masks, res).items()}
    # inject_background=False: the EDIT branch is the conv-site base, so the
    # edit pass influences eps even with all gates on (with True + always-on
    # gates the out-conv site is 100% source-determined and the deep-reuse
    # assertions below would compare identical source features)
    cw = pnp_lib.build_capture_weights(pyr, pyr, False)
    S = 3
    ts = jnp.asarray(sampling_timesteps(SchedulerConfig(), 10)[:S])
    on = jnp.ones((S,), bool)
    # conv gate OFF: conv sites composite from bg ALWAYS (reference
    # semantics), so with gate_conv on every step the out-conv injection
    # makes eps 100% source-determined and the edit-pass deep-reuse below
    # would be unobservable
    sched = core.CompositeSchedule(
        bg_traj=mk(S, F, LAT, LAT, 4),
        obj_traj=mk(S, n_obj, F, LAT, LAT, 4),
        obj_fusion_lat=mk(n_obj, F, LAT, LAT, 4),
        gate_spatial=on, gate_temporal=on, gate_conv=jnp.zeros((S,), bool),
        fusion_mask=jnp.asarray([True, False, False]),
        timesteps=ts,
    )
    ddim = DDIM(SchedulerConfig())
    xT = mk(F, LAT, LAT, 4)

    def run(cap_interval, n_steps_used, deep=False):
        import dataclasses as dc

        s = dc.replace(
            sched,
            bg_traj=sched.bg_traj[:n_steps_used],
            obj_traj=sched.obj_traj[:n_steps_used],
            gate_spatial=sched.gate_spatial[:n_steps_used],
            gate_temporal=sched.gate_temporal[:n_steps_used],
            gate_conv=sched.gate_conv[:n_steps_used],
            fusion_mask=sched.fusion_mask[:n_steps_used],
            timesteps=sched.timesteps[:n_steps_used])
        return np.asarray(core.pnp_composite_core(
            pipe._unet_apply, ddim, pipe.params["unet"], xT, cond, s,
            jnp.asarray(masks), pyr, pyr,
            num_inference_steps=10, guidance_scale=3.0,
            random_noise_ratio=0.3, inject_background=False,
            two_pass="stream", capture_weights=cw,
            capture_reuse_interval=cap_interval, capture_reuse_deep=deep))

    exact1 = run(1, 1)
    cap1 = run(2, 1)  # one step: always fresh -> identical to exact
    np.testing.assert_allclose(cap1, exact1, atol=1e-5)

    cap3 = run(2, 3)  # steps 0,2 fresh, 1 cached: runs + finite
    assert cap3.shape == exact1.shape
    assert np.isfinite(cap3).all()
    exact3 = run(1, 3)
    assert not np.allclose(cap3, exact3), (
        "capture_reuse interval 2 should actually skip the capture pass")

    deep1 = run(2, 1, deep=True)  # fresh step: deep == exact too
    np.testing.assert_allclose(deep1, exact1, atol=1e-5)
    deep3 = run(2, 3, deep=True)  # cached step reuses edit encoder + attn
    assert np.isfinite(deep3).all()
    assert not np.allclose(deep3, cap3), (
        "deep mode should reuse strictly more state than capture-only")

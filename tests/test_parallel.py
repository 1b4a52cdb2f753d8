"""Multi-chip sharding on the virtual 8-device CPU mesh: the sharded UNet
forward must compile, run, and match the single-device result."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvoc_tpu.models.unet_i2vgen import I2VGenXLUNet, UNetConfig
from mvoc_tpu.parallel import mesh as pm


def test_make_mesh_shapes():
    m = pm.make_mesh(8)
    assert m.shape[pm.SEQ_AXIS] * m.shape[pm.MODEL_AXIS] == 8
    assert m.shape[pm.JOB_AXIS] == 1
    m1 = pm.make_mesh(1)
    assert dict(m1.shape) == {pm.JOB_AXIS: 1, pm.SEQ_AXIS: 1, pm.MODEL_AXIS: 1}
    mj = pm.make_mesh(8, job=4)
    assert dict(mj.shape) == {pm.JOB_AXIS: 4, pm.SEQ_AXIS: 2, pm.MODEL_AXIS: 1}


def test_sharded_unet_matches_single_device(rng):
    cfg = UNetConfig.tiny()
    model = I2VGenXLUNet(cfg)
    B, F, H, W = 2, 8, 8, 8  # F divisible by the seq axis (4)
    d = cfg.cross_attention_dim

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32))

    inputs = dict(
        sample=mk(B, F, H, W, 4),
        timestep=jnp.asarray([500] * B),
        fps=jnp.asarray([8] * B),
        image_latents_first=mk(B, F, H, W, 4),
        image_latents=mk(B, F, H, W, 4),
        image_embeddings=mk(B, F, d),
        encoder_hidden_states=mk(B, 7, d),
    )
    params = model.init(jax.random.key(0), **inputs)
    ref = np.asarray(model.apply(params, **inputs))

    mesh = pm.make_mesh(8)
    sharded_params = pm.shard_params(params, mesh)
    sharded_inputs = dict(inputs)
    for k in ("sample", "image_latents_first", "image_latents"):
        sharded_inputs[k] = pm.shard_video(inputs[k], mesh)

    with mesh:
        out = jax.jit(lambda p, kw: model.apply(p, **kw))(sharded_params, sharded_inputs)
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)

    # TP actually sharded something: at least one kernel is split over model axis
    specs = jax.tree_util.tree_leaves(
        jax.tree.map(lambda x: x.sharding.spec, sharded_params)
    )
    assert any(pm.MODEL_AXIS in str(s) for s in specs), "no TP sharding applied"


def test_ring_attention_matches_full(rng):
    """Ring attention over the 8-device mesh == plain sdpa, exactly (online
    softmax is exact, not approximate)."""
    from mvoc_tpu.models.layers import sdpa
    from mvoc_tpu.ops.ring_attention import ring_sdpa

    heads, d = 2, 8
    B, S = 3, 64  # long-video frame axis, divisible by the seq axis

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32))

    q, k, v = mk(B, S, heads * d), mk(B, S, heads * d), mk(B, S, heads * d)
    ref = np.asarray(sdpa(q, k, v, heads))

    m = pm.make_mesh(8, seq=8)
    out = np.asarray(ring_sdpa(q, k, v, heads, m, axis_name=pm.SEQ_AXIS))
    np.testing.assert_allclose(out, ref, atol=2e-5)

    # also on a 2-wide ring inside a mixed (seq, model) mesh
    m2 = pm.make_mesh(8, seq=2)
    out2 = np.asarray(ring_sdpa(q, k, v, heads, m2, axis_name=pm.SEQ_AXIS))
    np.testing.assert_allclose(out2, ref, atol=2e-5)


def test_ulysses_attention_matches_full(rng):
    """Ulysses (all-to-all head exchange) == plain sdpa on the 8-device mesh."""
    from mvoc_tpu.models.layers import sdpa
    from mvoc_tpu.ops.ring_attention import ring_sdpa

    heads, d = 8, 4  # heads divisible by the seq axis
    B, S = 2, 32

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32))

    q, k, v = mk(B, S, heads * d), mk(B, S, heads * d), mk(B, S, heads * d)
    ref = np.asarray(sdpa(q, k, v, heads))
    m = pm.make_mesh(8, seq=8)
    out = np.asarray(ring_sdpa(q, k, v, heads, m, axis_name=pm.SEQ_AXIS,
                               method="ulysses"))
    np.testing.assert_allclose(out, ref, atol=2e-5)

    m2 = pm.make_mesh(8, seq=2)
    out2 = np.asarray(ring_sdpa(q, k, v, heads, m2, axis_name=pm.SEQ_AXIS,
                                method="ulysses"))
    np.testing.assert_allclose(out2, ref, atol=2e-5)


def test_pipeline_mesh_matches_single_device_e2e(tmp_path):
    """Pipeline-level mesh integration (I2VGenXLPipeline.enable_mesh — the
    production multi-chip path the CLIs reach via --mesh): inversion +
    composite under the 8-device (seq=4, model=2) mesh must match the
    single-device results."""
    from mvoc_tpu.io.trajectory import TrajectoryStore
    from mvoc_tpu.utils import testing as tt

    F2, HW = 4, tt.TINY_HW  # 4 frames shard over the seq=4 axis
    n_steps = 4
    frames = {
        name: tt.tiny_frames(F2, HW, seed=s)
        for name, s in (("bg", 0), ("obj1", 1), ("obj2", 2), ("main", 3))
    }
    lat = HW // 2
    masks_soft = np.zeros((2, F2, lat, lat), np.float32)
    masks_soft[0, :, : lat // 2] = 1.0
    masks_soft[1, :, :, : lat // 2] = 1.0
    masks_binary = (masks_soft > 0.5).astype(np.float32)

    def run(mesh: bool):
        pipe = tt.build_tiny_pipeline()
        if mesh:
            pipe.enable_mesh(8, seq=4)
            assert dict(pipe.mesh.shape) == {
                pm.JOB_AXIS: 1, pm.SEQ_AXIS: 4, pm.MODEL_AXIS: 2}
        tag = "mesh" if mesh else "single"
        stores = {}
        for name in ("bg", "obj1", "obj2"):
            out_dir = str(tmp_path / tag / name)
            pipe.invert(
                frames[name], height=HW, width=HW, num_frames=F2,
                num_inference_steps=n_steps, seed=1, output_dir=out_dir,
            )
            stores[name] = TrajectoryStore(out_dir)
        video = pipe.sample_composite(
            prompt="two objects over a background",
            main_first_image=frames["main"][0],
            main_image_list=frames["main"],
            background_image_list=frames["bg"],
            objs_image_list=[frames["obj1"], frames["obj2"]],
            masks_soft=masks_soft,
            masks_binary=masks_binary,
            bg_store=stores["bg"],
            obj_stores=[stores["obj1"], stores["obj2"]],
            height=HW, width=HW, num_frames=F2,
            num_inference_steps=n_steps, guidance_scale=3.0,
            ddim_init_latents_t_idx=1, fusion_steps=(0, 2), seed=2,
        )
        return np.asarray(video)

    ref = run(False)
    out = run(True)
    assert out.shape == ref.shape == (F2, HW, HW, 3)
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_batched_inversion_matches_sequential(rng):
    """ddim_inversion_batch_core (J videos on the UNet batch axis) must equal
    J independent ddim_inversion_core runs — both plain and under a
    (job=4, seq=2) mesh with the stack sharded over "job"."""
    from mvoc_tpu.ops.ddim import DDIM, SchedulerConfig, inversion_timesteps
    from mvoc_tpu.pipeline import core
    from mvoc_tpu.utils import testing as tt

    pipe = tt.build_tiny_pipeline()
    J, F, LAT = 4, 2, tt.TINY_HW // 2
    d = pipe.unet.config.cross_attention_dim

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    condJ = core.UNetConditioning(
        encoder_hidden_states=mk(J, 7, d),
        image_latents_first=mk(J, F, LAT, LAT, 4),
        image_latents=mk(J, F, LAT, LAT, 4),
        image_embeddings=mk(J, F, d),
        fps=jnp.asarray([8] * J),
    )
    x0 = mk(J, F, LAT, LAT, 4)
    n = 6
    ddim = DDIM(SchedulerConfig())
    inv_ts = jnp.asarray(inversion_timesteps(SchedulerConfig(), n))

    batch = np.asarray(core.ddim_inversion_batch_core(
        pipe._unet_apply, ddim, pipe.params["unet"], x0, condJ, inv_ts, n))
    assert batch.shape == (n, J, F, LAT, LAT, 4)

    for j in range(J):
        cond_j = jax.tree.map(lambda x: x[j : j + 1], condJ)
        traj_j = np.asarray(core.ddim_inversion_core(
            pipe._unet_apply, ddim, pipe.params["unet"], x0[j], cond_j,
            inv_ts, n, 1.0))
        np.testing.assert_allclose(batch[:, j], traj_j, atol=2e-4)

    # same computation sharded over the job axis of a (job=4, seq=2) mesh
    mesh = pm.make_mesh(8, job=4)
    params_s = pm.shard_params(pipe.params["unet"], mesh)
    sv = lambda t: pm.shard_stacked_video(t, mesh)
    condS = core.UNetConditioning(
        encoder_hidden_states=condJ.encoder_hidden_states,
        image_latents_first=sv(condJ.image_latents_first),
        image_latents=sv(condJ.image_latents),
        image_embeddings=condJ.image_embeddings,
        fps=condJ.fps,
    )
    sharded = np.asarray(jax.jit(
        lambda p, x, c: core.ddim_inversion_batch_core(
            pipe._unet_apply, ddim, p, x, c, inv_ts, n))(params_s, sv(x0), condS))
    np.testing.assert_allclose(sharded, batch, atol=2e-4)


def test_ring_sdpa_windowed_matches_masked_full(rng):
    """Ring/Ulysses with a band window == plain sdpa with the same [S, S]
    band mask (global positions respected as K/V blocks rotate)."""
    from mvoc_tpu.models.layers import sdpa
    from mvoc_tpu.ops.ring_attention import ring_sdpa

    heads, d = 4, 8
    B, S, W = 2, 32, 8

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32))

    q, k, v = mk(B, S, heads * d), mk(B, S, heads * d), mk(B, S, heads * d)
    idx = jnp.arange(S)
    mask = jnp.abs(idx[:, None] - idx[None, :]) <= W // 2
    ref = np.asarray(sdpa(q, k, v, heads, mask=mask))

    m = pm.make_mesh(8, seq=8)
    out_ring = np.asarray(ring_sdpa(q, k, v, heads, m, axis_name=pm.SEQ_AXIS,
                                    window=W))
    np.testing.assert_allclose(out_ring, ref, atol=3e-5)
    m2 = pm.make_mesh(8, seq=4)
    out_uly = np.asarray(ring_sdpa(q, k, v, heads, m2, axis_name=pm.SEQ_AXIS,
                                   method="ulysses", window=W))
    np.testing.assert_allclose(out_uly, ref, atol=3e-5)


def test_temporal_cp_unet_matches_64_frames(rng):
    """The 64-frame long-video configuration (BASELINE configs[3]) executed:
    UNet forward with windowed temporal attention running as ring (and
    Ulysses) context-parallel attention over the mesh "seq" axis must match
    the plain windowed single-program forward."""
    import dataclasses

    cfg = dataclasses.replace(UNetConfig.tiny(), temporal_window=8)
    model_ref = I2VGenXLUNet(cfg)
    B, F, H, W = 1, 64, 8, 8
    d = cfg.cross_attention_dim

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32))

    inputs = dict(
        sample=mk(B, F, H, W, 4),
        timestep=jnp.asarray([500] * B),
        fps=jnp.asarray([8] * B),
        image_latents_first=mk(B, F, H, W, 4),
        image_latents=mk(B, F, H, W, 4),
        image_embeddings=mk(B, F, d),
        encoder_hidden_states=mk(B, 7, d),
    )
    params = model_ref.init(jax.random.key(0), **inputs)
    ref = np.asarray(model_ref.apply(params, **inputs))

    for method, seq in (("ring", 4), ("ulysses", 2)):
        mesh = pm.make_mesh(8, seq=seq)
        cfg_cp = dataclasses.replace(cfg, temporal_cp=(method, mesh))
        model_cp = I2VGenXLUNet(cfg_cp)
        params_s = pm.shard_params(params, mesh)
        sharded = dict(inputs)
        for key in ("sample", "image_latents_first", "image_latents"):
            sharded[key] = pm.shard_video(inputs[key], mesh)
        out = np.asarray(jax.jit(
            lambda p, kw: model_cp.apply(p, **kw))(params_s, sharded))
        np.testing.assert_allclose(out, ref, atol=3e-4, err_msg=method)


def test_64frame_windowed_ring_composite_step(rng):
    """One full PnP composite denoising step at 64 frames with windowed +
    ring-context-parallel temporal attention on the virtual mesh — the
    long-video scale path of SURVEY §5 as an executed program."""
    import dataclasses

    from mvoc_tpu import pnp as pnp_lib
    from mvoc_tpu.ops.ddim import DDIM, SchedulerConfig, sampling_timesteps
    from mvoc_tpu.pipeline import core

    mesh = pm.make_mesh(8, seq=4)
    cfg = dataclasses.replace(
        UNetConfig.tiny(), temporal_window=8, temporal_cp=("ring", mesh))
    model = I2VGenXLUNet(cfg)
    n_obj, F, H, W = 2, 64, 8, 8
    B = n_obj + 3
    d = cfg.cross_attention_dim

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32))

    init_inputs = dict(
        sample=mk(B, F, H, W, 4),
        timestep=jnp.asarray([981] * B),
        fps=jnp.asarray([8] * B),
        image_latents_first=mk(B, F, H, W, 4),
        image_latents=mk(B, F, H, W, 4),
        image_embeddings=mk(B, F, d),
        encoder_hidden_states=mk(B, 7, d),
    )
    params = pm.shard_params(model.init(jax.random.key(0), **init_inputs), mesh)

    cond = core.UNetConditioning(
        encoder_hidden_states=init_inputs["encoder_hidden_states"],
        image_latents_first=pm.shard_video(init_inputs["image_latents_first"], mesh),
        image_latents=pm.shard_video(init_inputs["image_latents"], mesh),
        image_embeddings=init_inputs["image_embeddings"],
        fps=init_inputs["fps"],
    )
    masks = np.zeros((n_obj, F, H, W), np.float32)
    masks[0, :, : H // 2] = 1.0
    masks[1, :, :, : W // 2] = 1.0
    res = [(H, W), (H // 2, W // 2), (H // 4, W // 4)]
    pyr = {k: jnp.asarray(v) for k, v in pnp_lib.build_mask_pyramid(masks, res).items()}
    S = 2
    ts = jnp.asarray(sampling_timesteps(SchedulerConfig(), 50)[:S])
    on = jnp.ones((S,), bool)
    sched = core.CompositeSchedule(
        bg_traj=pm.shard_video(mk(S, F, H, W, 4), mesh),
        obj_traj=pm.shard_video(mk(S, n_obj, F, H, W, 4), mesh, frame_axis=2),
        obj_fusion_lat=pm.shard_video(mk(n_obj, F, H, W, 4), mesh),
        gate_spatial=on, gate_temporal=on, gate_conv=on,
        fusion_mask=jnp.asarray([True, False]),
        timesteps=ts,
    )
    ddim = DDIM(SchedulerConfig())
    latents = pm.shard_video(mk(F, H, W, 4), mesh, frame_axis=0)

    out = jax.jit(lambda p, lat, c, s: core.pnp_composite_core(
        lambda pp, **kw: model.apply(pp, **kw), ddim, p, lat, c, s,
        jnp.asarray(masks), pyr, pyr,
        num_inference_steps=50, guidance_scale=9.0,
        random_noise_ratio=0.1))(params, latents, cond, sched)
    out.block_until_ready()
    assert out.shape == (F, H, W, 4)
    assert bool(jnp.isfinite(out).all())


def test_composite_batch_matches_sequential(tmp_path):
    """Stage-2 job parallelism (VERDICT r2 directive #5): two group-config
    entries ride the job axis through sample_composite_batch as ONE sharded
    program on the 8-device (job=2, seq=4) mesh, matching the sequential
    single-device sample_composite outputs."""
    from mvoc_tpu.io.trajectory import TrajectoryStore
    from mvoc_tpu.utils import testing as tt

    F2, HW = 4, tt.TINY_HW
    n_steps = 4
    frames = {
        name: tt.tiny_frames(F2, HW, seed=s)
        for name, s in (("bg", 0), ("obj1", 1), ("obj2", 2),
                        ("mainA", 3), ("mainB", 4))
    }
    lat = HW // 2
    masks_soft = np.zeros((2, F2, lat, lat), np.float32)
    masks_soft[0, :, : lat // 2] = 1.0
    masks_soft[1, :, :, : lat // 2] = 1.0
    masks_binary = (masks_soft > 0.5).astype(np.float32)

    pipe = tt.build_tiny_pipeline()
    stores = {}
    for name in ("bg", "obj1", "obj2"):
        out_dir = str(tmp_path / name)
        pipe.invert(frames[name], height=HW, width=HW, num_frames=F2,
                    num_inference_steps=n_steps, seed=1, output_dir=out_dir)
        stores[name] = TrajectoryStore(out_dir)

    shared = dict(
        masks_soft=masks_soft, masks_binary=masks_binary,
        bg_store=stores["bg"], obj_stores=[stores["obj1"], stores["obj2"]],
        background_image_list=frames["bg"],
        objs_image_list=[frames["obj1"], frames["obj2"]],
        height=HW, width=HW, num_frames=F2,
    )
    entries = [
        dict(prompt="two objects over a background",
             main_first_image=frames["mainA"][0],
             main_image_list=frames["mainA"], seed=2, **shared),
        dict(prompt="a different edit prompt",
             main_first_image=frames["mainB"][0],
             main_image_list=frames["mainB"], seed=5, **shared),
    ]
    static = dict(num_inference_steps=n_steps, guidance_scale=3.0,
                  ddim_init_latents_t_idx=1, fusion_steps=(0, 2))

    seq_videos = [pipe.sample_composite(**e, **static) for e in entries]

    pipe.enable_mesh(8, seq=4, job=2)
    assert dict(pipe.mesh.shape) == {
        pm.JOB_AXIS: 2, pm.SEQ_AXIS: 4, pm.MODEL_AXIS: 1}
    batch_videos = pipe.sample_composite_batch(entries, **static)

    assert len(batch_videos) == 2
    for seq_v, bat_v in zip(seq_videos, batch_videos):
        np.testing.assert_allclose(np.asarray(bat_v), np.asarray(seq_v),
                                   atol=2e-4)

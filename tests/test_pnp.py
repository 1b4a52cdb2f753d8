"""PnP injection math unit tests — pinned to the reference's semantics
(pnp_utils.py:563-1159): later-object-wins compositing, Q/K-only edits into
the uncond+cond chunks, bg-vs-cond base selection, nearest mask pyramid,
and schedule gate computation."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mvoc_tpu import pnp


def _state(masks_np, **kw):
    res = [(masks_np.shape[2], masks_np.shape[3])]
    pyr = {k: jnp.asarray(v) for k, v in pnp.build_mask_pyramid(masks_np, res).items()}
    return pnp.PnPState(
        masks=pyr,
        gate_spatial=jnp.asarray(True),
        gate_temporal=jnp.asarray(True),
        gate_conv=jnp.asarray(True),
        **kw,
    )


def test_mask_pyramid_matches_torch_nearest(rng):
    masks = (rng.random((2, 3, 13, 17)) > 0.5).astype(np.float32)
    pyr = pnp.build_mask_pyramid(masks, [(13, 17), (7, 9), (3, 4)])
    for (h, w), got in pyr.items():
        ref = F.interpolate(torch.from_numpy(masks), size=(h, w), mode="nearest").numpy()
        np.testing.assert_array_equal(got, ref)


def test_spatial_injection_later_object_wins(rng):
    n, f, h, w, c = 2, 2, 4, 4, 3
    B = n + 3
    masks = np.zeros((n, f, h, w), np.float32)
    masks[0, :, :2] = 1.0   # obj1: top half
    masks[1, :, 1:3] = 1.0  # obj2: rows 1-2 (overlaps row 1)
    st = _state(masks, inject_background=True)

    q = rng.standard_normal((B * f, h * w, c), dtype=np.float32)
    k = rng.standard_normal((B * f, h * w, c), dtype=np.float32)
    q2, k2 = pnp.inject_spatial_qk(jnp.asarray(q), jnp.asarray(k), st, h, w)
    q2 = np.asarray(q2).reshape(B, f, h, w, c)
    qb = q.reshape(B, f, h, w, c)

    # source branches untouched
    np.testing.assert_array_equal(q2[:3], qb[:3])
    # expected composite: row0 obj1, rows1-2 obj2 (later wins), row3 bg
    exp = qb[0].copy()
    exp[:, 0] = qb[1][:, 0]
    exp[:, 1:3] = qb[2][:, 1:3]
    np.testing.assert_allclose(q2[3], exp, atol=1e-6)
    np.testing.assert_allclose(q2[4], exp, atol=1e-6)


def test_spatial_injection_inject_background_false(rng):
    n, f, h, w, c = 1, 2, 4, 4, 3
    B = n + 3
    masks = np.zeros((n, f, h, w), np.float32)
    masks[0, :, :, :2] = 1.0
    st = _state(masks, inject_background=False)
    q = rng.standard_normal((B * f, h * w, c), dtype=np.float32)
    q2, _ = pnp.inject_spatial_qk(jnp.asarray(q), jnp.asarray(q), st, h, w)
    q2 = np.asarray(q2).reshape(B, f, h, w, c)
    qb = q.reshape(B, f, h, w, c)
    # base is the cond chunk (last), not bg
    exp = qb[B - 1].copy()
    exp[:, :, :2] = qb[1][:, :, :2]
    np.testing.assert_allclose(q2[3], exp, atol=1e-6)


def test_temporal_injection_pixel_rows(rng):
    n, f, h, w, c = 1, 3, 2, 2, 4
    B = n + 3
    masks = np.zeros((n, f, h, w), np.float32)
    masks[0, 1] = 1.0  # only frame 1 masked, all pixels
    st = _state(masks, inject_background=True)
    q = rng.standard_normal((B * h * w, f, c), dtype=np.float32)
    q2, _ = pnp.inject_temporal_qk(jnp.asarray(q), jnp.asarray(q), st, h, w)
    q2 = np.asarray(q2).reshape(B, h * w, f, c)
    qb = q.reshape(B, h * w, f, c)
    exp = qb[0].copy()
    exp[:, 1] = qb[1][:, 1]  # frame 1 from the object branch
    np.testing.assert_allclose(q2[B - 2], exp, atol=1e-6)
    np.testing.assert_allclose(q2[B - 1], exp, atol=1e-6)
    np.testing.assert_array_equal(q2[:2], qb[:2])


def test_conv_injection_always_bg_base(rng):
    n, f, h, w, c = 1, 2, 4, 4, 3
    B = n + 3
    masks = np.zeros((n, f, h, w), np.float32)
    masks[0, :, :2] = 1.0
    # inject_background=False must NOT affect conv sites (reference conv
    # forwards hardcode the bg chunk: pnp_utils.py:974, 1063, 1117)
    st = _state(masks, inject_background=False)
    x = rng.standard_normal((B * f, h, w, c), dtype=np.float32)
    x2 = np.asarray(pnp.inject_conv_features(jnp.asarray(x), st, h, w)).reshape(B, f, h, w, c)
    xb = x.reshape(B, f, h, w, c)
    exp = xb[0].copy()
    exp[:, :2] = xb[1][:, :2]
    np.testing.assert_allclose(x2[B - 2], exp, atol=1e-6)
    np.testing.assert_allclose(x2[B - 1], exp, atol=1e-6)


def test_gates_off_noop(rng):
    masks = np.ones((1, 2, 4, 4), np.float32)
    st = _state(masks)
    st = dataclasses.replace(
        st,
        gate_spatial=jnp.asarray(False),
        gate_temporal=jnp.asarray(False),
        gate_conv=jnp.asarray(False),
    )
    q = rng.standard_normal((8, 16, 3), dtype=np.float32)
    q2, k2 = pnp.inject_spatial_qk(jnp.asarray(q), jnp.asarray(q), st, 4, 4)
    np.testing.assert_array_equal(np.asarray(q2), q)
    x = rng.standard_normal((8, 4, 4, 3), dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(pnp.inject_conv_features(jnp.asarray(x), st, 4, 4)), x)


def test_injection_gates_schedule():
    # 10 steps, descending t: 901, 801, ..., 1 (leading spacing w/ offset 1)
    full = np.asarray([901, 801, 701, 601, 501, 401, 301, 201, 101, 1])
    g = pnp.injection_gates(full, full, 10, pnp_f_t=0.5, pnp_spatial_attn_t=0.3,
                            pnp_temp_attn_t=1.0)
    np.testing.assert_array_equal(g["conv"], [True] * 5 + [False] * 5)
    np.testing.assert_array_equal(g["spatial"], [True] * 3 + [False] * 7)
    np.testing.assert_array_equal(g["temporal"], [True] * 10)
    # truncated run: same schedule, fewer iterated steps
    run = full[2:]
    g2 = pnp.injection_gates(full, run, 10, 0.5, 0.3, 1.0)
    np.testing.assert_array_equal(g2["conv"], [True] * 3 + [False] * 5)
    # t == 1000 always injects
    g3 = pnp.injection_gates(full, np.asarray([1000]), 10, 0.0, 0.0, 0.0)
    assert g3["conv"][0] and g3["spatial"][0] and g3["temporal"][0]

"""Parity extras: FreeU, exclusive occlusion masks, seeding, media utils."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from mvoc_tpu.io import masks as masklib
from mvoc_tpu.io import media
from mvoc_tpu.models.unet_i2vgen import FreeUConfig, _fourier_filter, apply_freeu
from mvoc_tpu.utils import seeding


def test_fourier_filter_dc_scaling(rng):
    """threshold=1 scales exactly the DC bin: a constant image is scaled by
    s, a zero-mean image is (nearly) unchanged."""
    const = jnp.ones((1, 8, 8, 2))
    out = _fourier_filter(const, threshold=1, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)

    x = rng.standard_normal((1, 8, 8, 2), dtype=np.float32)
    x = x - x.mean(axis=(1, 2), keepdims=True)
    out = _fourier_filter(jnp.asarray(x), threshold=1, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-5)


def test_apply_freeu_blocks(rng):
    h = jnp.asarray(rng.standard_normal((2, 4, 4, 8), dtype=np.float32))
    skip = jnp.asarray(rng.standard_normal((2, 4, 4, 8), dtype=np.float32))
    cfg = FreeUConfig(s1=0.5, s2=0.3, b1=2.0, b2=3.0)
    h0, s0 = apply_freeu(0, h, skip, cfg)
    np.testing.assert_allclose(np.asarray(h0[..., :4]), np.asarray(h[..., :4]) * 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h0[..., 4:]), np.asarray(h[..., 4:]), atol=1e-6)
    # block >= 2: untouched
    h2, s2 = apply_freeu(2, h, skip, cfg)
    assert h2 is h and s2 is skip
    # disabled: untouched
    h3, s3 = apply_freeu(0, h, skip, None)
    assert h3 is h and s3 is skip


def test_exclusive_occlusion_masks():
    b = np.zeros((2, 1, 4, 4), np.float32)
    b[0, :, :2] = 1.0   # obj0 top half
    b[1, :, 1:3] = 1.0  # obj1 rows 1-2
    soft = b * 0.8
    ex_s, ex_b = masklib.exclusive_occlusion_masks(b, soft)
    # obj0 keeps only row 0 (row 1 stolen by the later obj1)
    assert ex_b[0, 0, 0].all() and not ex_b[0, 0, 1].any()
    # obj1 keeps rows 1-2 (it is last)
    assert ex_b[1, 0, 1:3].all()
    # no pixel belongs to two objects
    assert (ex_b.sum(axis=0) <= 1.0).all()
    np.testing.assert_allclose(ex_s, soft * ex_b, atol=1e-6)


def test_seeding_keys_stable():
    k1 = seeding.run_keys(7, "latents", "vae")
    k2 = seeding.run_keys(7, "latents", "vae", "extra")
    # adding a consumer must not change existing keys
    assert jax.random.key_data(k1["latents"]).tolist() == \
        jax.random.key_data(k2["latents"]).tolist()
    assert jax.random.key_data(k1["latents"]).tolist() != \
        jax.random.key_data(k1["vae"]).tolist()


def test_center_crop_wide_and_video_roundtrip(tmp_path, rng):
    img = Image.fromarray(rng.integers(0, 255, (30, 50, 3), dtype=np.uint8))
    out = media.center_crop_wide(img, (20, 20))
    assert out.size == (20, 20)
    # mp4 export + decode roundtrip (OpenCV)
    frames = [Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8))
              for _ in range(3)]
    path = str(tmp_path / "t.mp4")
    media.export_to_video(frames, path, fps=4)
    back = media.convert_video_to_frames(path, (16, 16), save_frames=False)
    assert len(back) == 3
    assert back[0].size == (16, 16)


def test_scan_dir_and_frame_sort(tmp_path):
    for i in (10, 2, 1):
        Image.new("RGB", (4, 4)).save(tmp_path / f"{i:05d}.png")
    (tmp_path / "notes.txt").write_text("x")
    n, paths = media.scan_dir(str(tmp_path))
    assert n == 3
    _, frames = media.load_video_frames(str(tmp_path), 3, (4, 4))
    assert len(frames) == 3


def test_encode_frames_strict_reference_crop_quirk():
    """The composite per-frame CLIP path must replicate the reference's
    discarded-crop quirk by default: the UNCROPPED frame is bilinear-resized
    into the CLIP input (pipeline_i2vgen_xl.py:1505-1508 — `_resize_bilinear(
    image, ...)` right after computing `cropped_image`); the corrected path
    (crop then resize, matching the single-frame site :1116-1118) is
    available behind strict_reference_crop=False."""
    import numpy as np
    from PIL import Image

    import jax.numpy as jnp

    from mvoc_tpu.io import media
    from mvoc_tpu.models.clip import normalize_clip_image
    from mvoc_tpu.utils import testing as tt

    pipe = tt.build_tiny_pipeline()
    rng = np.random.default_rng(11)
    # wide frame so cropping actually changes content
    frame = Image.fromarray(
        rng.integers(0, 255, (16, 48, 3), dtype=np.uint8))
    width = 48
    sz = pipe.clip_image_size

    strict = np.asarray(pipe.encode_frames([frame], width))
    fixed = np.asarray(
        pipe.encode_frames([frame], width, strict_reference_crop=False))
    assert not np.allclose(strict, fixed), "quirk path must differ on wide frames"

    def embed(pil):
        px = normalize_clip_image(
            jnp.asarray(media.pil_to_01([pil]), dtype=pipe.dtype))
        return np.asarray(pipe._vision_apply(pipe.params["image_encoder"], px))

    ref_strict = embed(media.resize_bilinear(frame, (sz, sz)))
    np.testing.assert_allclose(strict, ref_strict, atol=1e-5)

    ref_fixed = embed(media.resize_bilinear(
        media.center_crop_wide(frame, (width, width)), (sz, sz)))
    np.testing.assert_allclose(fixed, ref_fixed, atol=1e-5)

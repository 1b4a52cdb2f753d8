from mvoc_tpu.io import masks, media, trajectory  # noqa: F401

from mvoc_tpu.models.unet_i2vgen import I2VGenXLUNet, UNetConfig  # noqa: F401

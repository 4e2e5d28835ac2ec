from dmvsnet_tpu.ops import warp  # noqa: F401

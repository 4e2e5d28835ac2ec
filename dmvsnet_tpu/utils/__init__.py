from dmvsnet_tpu.utils import synthetic  # noqa: F401

from dmvsnet_tpu.core import geometry, sampling  # noqa: F401

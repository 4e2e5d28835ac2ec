from dmvsnet_tpu.data.loader import get_dataset, make_loader  # noqa: F401

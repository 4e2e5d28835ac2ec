from dmvsnet_tpu.losses.mvs_loss import mvs_loss  # noqa: F401
from dmvsnet_tpu.losses import metrics  # noqa: F401

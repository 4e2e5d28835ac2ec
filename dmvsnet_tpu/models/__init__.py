from dmvsnet_tpu.models.mvsnet import MVSNet  # noqa: F401
from dmvsnet_tpu.models.feature_net import FeatureNet  # noqa: F401
from dmvsnet_tpu.models.cost_reg import CostRegNet, CostRegNetRefine  # noqa: F401

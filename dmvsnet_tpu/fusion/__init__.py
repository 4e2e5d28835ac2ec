from dmvsnet_tpu.fusion.pcd import pcd_filter  # noqa: F401
from dmvsnet_tpu.fusion.dypcd import dypcd_filter  # noqa: F401
from dmvsnet_tpu.fusion.tank_config import TANK_SCENE_CONFIG  # noqa: F401

from dmvsnet_tpu.ops.pallas.warp_correlate import (  # noqa: F401
    aggregate_cost_volume_pallas,
    plane_sweep_corr_view,
)
from dmvsnet_tpu.ops.pallas.epipolar_sweep import (  # noqa: F401
    aggregate_cost_volume_epipolar,
    resample_tiled,
)

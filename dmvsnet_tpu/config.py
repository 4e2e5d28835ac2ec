"""Configuration: one dataclass covering the reference's ~50 argparse
flags (reference main.py:4-82), plus the four launcher recipes
(reference scripts/*.sh) as named presets.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Sequence


@dataclass
class Config:
    # network (reference main.py:7-13)
    fea_mode: str = "fpn"
    agg_mode: str = "variance"
    depth_mode: str = "regression"
    ndepths: Sequence[int] = (48, 32, 8)
    interval_ratio: Sequence[float] = (4.0, 2.0, 1.0)
    inverse_depth: bool = False
    compute_dtype: str = "float32"  # "bfloat16" for MXU-rate convs
    # cost-volume warp implementation: "auto" = epipolar 1-D sweeps for
    # eval on TPU (numerics-gated; NUMERICS.json), Pallas 2-D kernel for
    # training, XLA gather elsewhere
    warp_impl: str = "auto"  # auto | pallas | epipolar | xla
    # compute dtype of the cost-regularization U-Nets: "auto" = bfloat16
    # at EVAL on TPU (they are HBM-bound; halving activation bytes
    # measured +8% maps/s, depth deltas gated in NUMERICS.json), float32
    # for training
    costreg_dtype: str = "auto"  # auto | float32 | bfloat16
    # compute dtype of the feature FPN: same auto policy as costreg_dtype
    # (HBM-bound at 95% of its fp32 byte roofline, STAGETIME r4; outputs
    # are cast back to fp32 at the warp interface, depth deltas gated in
    # NUMERICS.json depth_feature_bf16_vs_default_mm)
    feature_dtype: str = "auto"  # auto | float32 | bfloat16
    # rematerialize the cost U-Nets on backward (jax.checkpoint): trades
    # ~1 extra U-Net forward for several GB of activation HBM at the
    # full train recipe, enabling larger per-chip batches
    remat: bool = False

    # dataset (main.py:16-26)
    datapath: str = ""
    trainlist: str = "train"
    testlist: str = "test"
    dataset_name: str = "dtu_yao"
    batch_size: int = 1
    numdepth: int = 192
    interval_scale: float = 1.06
    nviews: int = 5
    img_size: Sequence[int] = (512, 640)

    # training (main.py:29-44)
    start_epoch: int = 0
    epochs: int = 16
    lr: float = 1e-3
    wd: float = 0.0
    scheduler: str = "steplr"
    warmup: float = 0.2
    milestones: Sequence[float] = (10, 12, 14)
    lr_decay: float = 0.5
    resume: str = ""
    log_dir: str = "./checkpoints"
    dlossw: Sequence[float] = (0.5, 1.0, 2.0)
    eval_freq: int = 1
    summary_freq: int = 50
    seed: int = 0
    blendedmvs_finetune: bool = False
    # cap samples per split (0 = all): smoke runs / CI fixtures shrink the
    # epoch without monkeypatching dataset internals
    max_train_samples: int = 0
    max_val_samples: int = 0

    # testing (main.py:47-70)
    outdir: str = "./outputs"
    # run ONE scene: its directory path; datapath becomes the parent and
    # the scan list collapses to [basename] (reference main.py:48,
    # model.py:305-316)
    testpath_single_scene: str = ""
    num_view: int = 5
    max_h: int = 864
    max_w: int = 1152
    fix_res: bool = False
    num_worker: int = 4
    # reference views inferred per device dispatch at eval: the DTU
    # protocol's 49 ref views per scan are an embarrassingly batchable
    # axis (the reference feeds them one at a time, model.py:330-345);
    # B>1 fills the MXU better at the 8-64ch convs.  The tail batch is
    # padded by repetition so only one shape compiles per scene bucket.
    eval_batch: int = 1
    filter_method: str = "pcd"
    conf: Sequence[float] = (0.1, 0.15, 0.7)
    thres_view: int = 5
    dist_base: float = 0.25
    rel_diff_base: float = 1.0 / 1300

    # parallelism (TPU-native replacement for --local_rank / dist-url)
    mesh_data: int = 0        # 0 = all devices on dp
    mesh_spatial: int = 1

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# The four launcher recipes (reference scripts/*.sh) as presets.
PRESETS: dict[str, dict] = {
    "dtu_train": dict(
        dataset_name="dtu_yao", ndepths=(48, 32, 8), interval_ratio=(4, 2, 1),
        img_size=(512, 640), nviews=5, dlossw=(0.5, 1.0, 2.0), epochs=16,
        batch_size=2, lr=1e-3, warmup=0.2, scheduler="steplr",
        milestones=(10, 12, 14), lr_decay=0.5, trainlist="train",
        testlist="test", inverse_depth=True, numdepth=192, interval_scale=1.06,
    ),
    "dtu_test": dict(
        dataset_name="general_eval", ndepths=(48, 32, 8), interval_ratio=(4, 2, 1),
        max_h=864, max_w=1152, num_view=5, batch_size=1, testlist="test",
        numdepth=192, interval_scale=1.06, filter_method="pcd", thres_view=5,
        num_worker=1, inverse_depth=True, conf=(0.0, 0.0, 0.3),
        eval_batch=2,  # 2 ref views per dispatch: +6% maps/s on v5e (r4)
    ),
    "tank_test": dict(
        dataset_name="general_eval", ndepths=(64, 32, 8), interval_ratio=(3, 2, 1),
        num_view=11, batch_size=1, testlist="all", numdepth=192,
        interval_scale=1.06, filter_method="dypcd",
    ),
    "blendedmvs_finetune": dict(
        dataset_name="blendedmvs", ndepths=(48, 32, 8), interval_ratio=(4, 2, 1),
        img_size=(576, 768), dlossw=(0.5, 1.0, 2.0), nviews=7, epochs=10,
        batch_size=1, lr=1e-4, scheduler="steplr", warmup=0.2, milestones=(6, 8),
        lr_decay=0.5, numdepth=128, interval_scale=1.06, blendedmvs_finetune=True,
    ),
}


def preset(name: str, **overrides) -> Config:
    cfg = Config(**PRESETS[name])
    return cfg.replace(**overrides) if overrides else cfg

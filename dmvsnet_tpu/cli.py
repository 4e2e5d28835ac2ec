"""Command-line entry point.

Mirrors the reference's flat argparse surface (reference main.py:4-82)
plus ``--preset`` for the four launcher recipes (reference scripts/*.sh)
and TPU-mesh flags replacing the NCCL/--local_rank machinery.

  dmvsnet --preset dtu_train --datapath ... --log_dir ...
  dmvsnet --test --preset dtu_test --datapath ... --resume ... --outdir ...
  dmvsnet --vis --depth_path out.pfm
"""

from __future__ import annotations

import argparse
import dataclasses

from dmvsnet_tpu.config import Config, preset


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("dmvsnet_tpu")
    p.add_argument("--preset", choices=["dtu_train", "dtu_test", "tank_test",
                                        "blendedmvs_finetune"])
    # modes (reference --val/--test/--vis)
    p.add_argument("--val", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--vis", action="store_true")

    # network
    p.add_argument("--fea_mode", default=None, choices=["fpn", "unet", "hrnet"])
    p.add_argument("--agg_mode", default=None, choices=["variance", "adaptive"])
    p.add_argument("--depth_mode", default=None,
                   choices=["regression", "classification", "unification", "gfocal"])
    p.add_argument("--ndepths", type=int, nargs="+", default=None)
    p.add_argument("--interval_ratio", type=float, nargs="+", default=None)
    p.add_argument("--inverse_depth", action="store_true", default=None)
    p.add_argument("--compute_dtype", default=None, choices=["float32", "bfloat16"])
    p.add_argument("--warp_impl", default=None,
                   choices=["auto", "pallas", "epipolar", "xla"])
    p.add_argument("--costreg_dtype", default=None,
                   choices=["auto", "float32", "bfloat16"])
    p.add_argument("--feature_dtype", default=None,
                   choices=["auto", "float32", "bfloat16"])
    p.add_argument("--remat", action="store_true", default=None)

    # dataset
    p.add_argument("--datapath", default=None)
    p.add_argument("--trainlist", default=None)
    p.add_argument("--testlist", default=None)
    p.add_argument("--dataset_name", default=None,
                   choices=["dtu_yao", "general_eval", "blendedmvs"])
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--numdepth", type=int, default=None)
    p.add_argument("--interval_scale", type=float, default=None)
    p.add_argument("--nviews", type=int, default=None)
    p.add_argument("--img_size", type=int, nargs="+", default=None)

    # training
    p.add_argument("--start_epoch", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--wd", type=float, default=None)
    p.add_argument("--scheduler", default=None, choices=["steplr", "cosinelr"])
    p.add_argument("--warmup", type=float, default=None)
    p.add_argument("--milestones", type=float, nargs="+", default=None)
    p.add_argument("--lr_decay", type=float, default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--log_dir", default=None)
    p.add_argument("--dlossw", type=float, nargs="+", default=None)
    p.add_argument("--eval_freq", type=int, default=None)
    p.add_argument("--summary_freq", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--blendedmvs_finetune", action="store_true", default=None)

    # testing
    p.add_argument("--outdir", default=None)
    p.add_argument("--testpath_single_scene", default=None)
    p.add_argument("--num_view", type=int, default=None)
    p.add_argument("--max_h", type=int, default=None)
    p.add_argument("--max_w", type=int, default=None)
    p.add_argument("--fix_res", action="store_true", default=None)
    p.add_argument("--num_worker", type=int, default=None)
    p.add_argument("--eval_batch", type=int, default=None,
                   help="reference views inferred per device dispatch")
    p.add_argument("--filter_method", default=None,
                   choices=["pcd", "dypcd", "none"])
    p.add_argument("--conf", type=float, nargs="+", default=None)
    p.add_argument("--thres_view", type=int, default=None)
    p.add_argument("--dist_base", type=float, default=None)
    p.add_argument("--rel_diff_base", type=float, default=None)

    # visualization
    p.add_argument("--depth_path", default=None)
    p.add_argument("--depth_img_save_dir", default=".")

    # mesh
    p.add_argument("--mesh_data", type=int, default=None)
    p.add_argument("--mesh_spatial", type=int, default=None)

    # platform override (the TPU image pins JAX_PLATFORMS at interpreter
    # start; env vars cannot override it — only the runtime config can)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    return p


def config_from_args(args: argparse.Namespace) -> Config:
    cfg = preset(args.preset) if args.preset else Config()
    field_names = {f.name for f in dataclasses.fields(Config)}
    overrides = {
        k: v for k, v in vars(args).items()
        if k in field_names and v is not None
    }
    return cfg.replace(**overrides)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.vis:
        from dmvsnet_tpu.engine.evaluate import run_visualization

        out = run_visualization(args.depth_path, args.depth_img_save_dir)
        print(f"saved {out}")
        return

    cfg = config_from_args(args)
    if args.test:
        from dmvsnet_tpu.engine.evaluate import run_test

        run_test(cfg)
        return

    from dmvsnet_tpu.engine.train import Trainer

    trainer = Trainer(cfg)
    if args.val:
        trainer.validate()
    else:
        trainer.train()


if __name__ == "__main__":
    main()

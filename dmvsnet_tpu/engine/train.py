"""Training orchestration (the reference's Model.train/validate,
reference model.py:87-299, rebuilt around jitted steps).

Per epoch: reshuffle (set_epoch), iterate host-sharded batches, one
fused train_step per batch, tensorboard scalars/images on process 0,
orbax checkpoint per epoch, validation every eval_freq epochs.
"""

from __future__ import annotations

import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from dmvsnet_tpu.config import Config
from dmvsnet_tpu.data import get_dataset, make_loader
from dmvsnet_tpu.data.splits import resolve_scan_list
from dmvsnet_tpu.engine import checkpoint as ckpt_lib
from dmvsnet_tpu.engine.state import create_train_state, make_lr_schedule
from dmvsnet_tpu.engine.steps import make_eval_step, make_train_step
from dmvsnet_tpu.models import MVSNet
from dmvsnet_tpu.parallel import make_mesh, shard_batch
from dmvsnet_tpu.parallel.mesh import replicate_tree


class AverageMeter:
    """Running means of a scalar dict (reference tools.py:18-37).

    Accumulates device scalars WITHOUT fetching them: each `+` is an
    async dispatch, so the train loop never blocks on a device->host
    round-trip per step (at ~25 ms tunnel latency a per-step float()
    taxes every real training loop — VERDICT r4 #8).  `avg` is the only
    point that syncs.
    """

    def __init__(self):
        self.sums: dict[str, Any] = {}
        self.count = 0

    def update(self, scalars: dict[str, Any]):
        self.count += 1
        for k, v in scalars.items():
            self.sums[k] = v if k not in self.sums else self.sums[k] + v

    @property
    def avg(self) -> dict[str, float]:
        return {k: float(v) / max(self.count, 1) for k, v in self.sums.items()}


def build_model(cfg: Config, mesh=None, eval_mode: bool = False) -> MVSNet:
    if cfg.fea_mode != "fpn":
        raise NotImplementedError(
            f"fea_mode={cfg.fea_mode!r}: only 'fpn' is implemented (the "
            "reference's unet/hrnet choices are argparse stubs too, "
            "reference networks/module.py:277)"
        )
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.compute_dtype]
    impl = cfg.warp_impl
    if impl == "auto":
        # the Pallas kernels need real TPU hardware; interpret mode on
        # CPU would be slower than the XLA gather path.  On TPU, auto
        # means the epipolar 1-D sweep for EVAL (fastest measured path;
        # per-(view, stage) validity gates fall back to the exact 2-D
        # kernel, and the full-model accuracy gate is NUMERICS.json's
        # depth_epipolar_vs_default_mm, re-asserted by the suite) — and
        # the 2-D kernel's custom-VJP path for training (MVSNet ignores
        # use_epipolar_warp under train=True).
        impl = "epipolar" if jax.devices()[0].platform in ("tpu", "axon") else "xla"
    crd = getattr(cfg, "costreg_dtype", "auto")
    if crd == "auto":
        # bf16 cost U-Nets at EVAL on TPU: they are HBM-bound (STAGETIME
        # r4) so halving activation bytes measured +8% maps/s; depth-map
        # deltas are gated by NUMERICS.json (depth_costreg_bf16_*).
        # Training keeps fp32 (gradient quality untested in bf16).
        crd = ("bfloat16" if eval_mode
               and jax.devices()[0].platform in ("tpu", "axon")
               else "float32")
    costreg_dtype = {"float32": None, "bfloat16": jnp.bfloat16}[crd]
    frd = getattr(cfg, "feature_dtype", "auto")
    if frd == "auto":
        # same policy as the cost U-Nets: the feature FPN is HBM-bound
        # (95% of its fp32 byte roofline, STAGETIME r4), bf16 halves its
        # activation traffic at eval; outputs are cast back to fp32 at
        # the warp interface and gated by NUMERICS.json
        # (depth_feature_bf16_*).  Training keeps fp32.
        frd = ("bfloat16" if eval_mode
               and jax.devices()[0].platform in ("tpu", "axon")
               else "float32")
    feature_dtype = {"float32": None, "bfloat16": jnp.bfloat16}[frd]
    return MVSNet(
        ndepths=tuple(cfg.ndepths),
        depth_interval_ratio=tuple(cfg.interval_ratio),
        inverse_depth=cfg.inverse_depth,
        dtype=dtype,
        use_pallas_warp=impl in ("pallas", "epipolar"),
        use_epipolar_warp=impl == "epipolar",
        costreg_dtype=costreg_dtype,
        feature_dtype=feature_dtype,
        remat=cfg.remat,
        mesh=mesh,
    )


class Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        import math

        n_dev = len(jax.devices())
        n_data = cfg.mesh_data or max(1, n_dev // cfg.mesh_spatial)
        # the global batch must divide over the dp axis; shrink dp to the
        # largest compatible size rather than failing at the first step
        if cfg.batch_size % n_data:
            n_data = math.gcd(cfg.batch_size, n_data)
            print(
                f"note: dp mesh axis reduced to {n_data} "
                f"(batch_size {cfg.batch_size} must divide over it)"
            )
        self.mesh = make_mesh(n_data=n_data, n_spatial=cfg.mesh_spatial)
        self.model = build_model(cfg, mesh=self.mesh)

        train_scans = resolve_scan_list(cfg.trainlist, cfg.datapath)
        val_scans = resolve_scan_list(cfg.testlist, cfg.datapath)
        ds_kwargs = dict(ndepths=cfg.numdepth, interval_scale=cfg.interval_scale)
        if cfg.dataset_name == "dtu_yao":
            ds_kwargs["img_size"] = tuple(cfg.img_size)
        self.train_ds = get_dataset(
            cfg.dataset_name, cfg.datapath, train_scans, cfg.nviews, "train", **ds_kwargs
        )
        self.val_ds = get_dataset(
            cfg.dataset_name, cfg.datapath, val_scans, 5, "val", **ds_kwargs
        )
        if cfg.max_train_samples:
            self.train_ds.metas = self.train_ds.metas[: cfg.max_train_samples]
        if cfg.max_val_samples:
            self.val_ds.metas = self.val_ds.metas[: cfg.max_val_samples]
        # cfg.batch_size is the GLOBAL batch; each process loads only its
        # 1/process_count shard and parallel.mesh.shard_batch assembles
        # the global array (reference: per-GPU DDP batches, train.sh:9).
        n_proc = jax.process_count()
        if cfg.batch_size % n_proc:
            raise ValueError(
                f"batch_size {cfg.batch_size} must divide over "
                f"{n_proc} processes"
            )
        per_host_batch = cfg.batch_size // n_proc
        self.train_loader = make_loader(
            self.train_ds, per_host_batch, "train", seed=cfg.seed
        )
        self.val_loader = make_loader(self.val_ds, per_host_batch, "val", seed=cfg.seed)

        steps_per_epoch = max(1, len(self.train_loader))
        self.lr_schedule = make_lr_schedule(
            cfg.lr, steps_per_epoch, cfg.scheduler, cfg.warmup,
            cfg.milestones, cfg.lr_decay, cfg.epochs,
        )
        sample = next(iter(make_loader(self.train_ds, cfg.batch_size, "val")))
        sample = jax.tree_util.tree_map(jnp.asarray, sample)
        self.state = create_train_state(
            self.model, jax.random.PRNGKey(cfg.seed), sample, self.lr_schedule, cfg.wd
        )
        # multi-process: lift the identically-seeded local state to global
        # replicated arrays FIRST, so a collectively-saved checkpoint is
        # restored into a global-array skeleton (every process reads its
        # addressable shards) — the same order tests/multiprocess_worker.py
        # exercises.  A no-op for a single process.
        self.state = replicate_tree(self.state, self.mesh)
        self.start_epoch = cfg.start_epoch
        if cfg.resume:
            weights_only = cfg.blendedmvs_finetune
            self.state, resumed_epoch = ckpt_lib.restore_checkpoint(
                cfg.resume, self.state, weights_only=weights_only
            )
            if not weights_only:
                self.start_epoch = resumed_epoch

        self.train_step = make_train_step(
            tuple(cfg.dlossw), cfg.depth_mode, self.lr_schedule
        )
        self.eval_step = make_eval_step(tuple(cfg.dlossw), cfg.depth_mode)

        self.writer = None
        if jax.process_index() == 0:
            try:
                from tensorboardX import SummaryWriter

                os.makedirs(cfg.log_dir, exist_ok=True)
                self.writer = SummaryWriter(log_dir=cfg.log_dir)
            except ImportError:
                pass

    def _log(self, tag: str, scalars: dict, step: int):
        if self.writer is not None:
            for k, v in scalars.items():
                self.writer.add_scalar(f"{tag}/{k}", float(v), step)

    def train(self):
        cfg = self.cfg
        for epoch in range(self.start_epoch, self.start_epoch + cfg.epochs):
            self.train_loader.set_epoch(epoch)
            meter = AverageMeter()
            t0 = time.time()
            for i, batch in enumerate(self.train_loader):
                host_batch = self._to_device(batch)
                batch = shard_batch(host_batch, self.mesh)
                self.state, scalars, (depth, conf) = self.train_step(self.state, batch)
                meter.update(scalars)  # device-side accumulation, no sync
                gstep = epoch * len(self.train_loader) + i
                if gstep % cfg.summary_freq == 0:
                    # the ONLY per-step device->host fetch happens here
                    scalars = {k: float(v) for k, v in scalars.items()}
                    self._log("train", scalars, gstep)
                    if self.writer is not None:
                        from dmvsnet_tpu.engine import imagery

                        imagery.log_images(
                            self.writer, "train",
                            imagery.training_images(host_batch, depth, conf),
                            gstep,
                        )
                    print(
                        f"epoch {epoch} [{i}/{len(self.train_loader)}] "
                        f"loss {scalars['loss']:.3f} "
                        f"th2 {scalars['thres2mm_error']:.3f} "
                        f"({(time.time() - t0) / (i + 1):.2f}s/it)",
                        flush=True,
                    )
            self._log("train_avg", meter.avg, epoch)
            ckpt_lib.save_checkpoint(cfg.log_dir, epoch, self.state)
            if epoch % cfg.eval_freq == 0 or epoch == cfg.epochs - 1:
                self.validate(epoch)

    def validate(self, epoch: int = 0):
        """Held-out eval with the reference's observability: per-batch
        'test' scalars + image panel at summary_freq, epoch-mean
        'test_avg' scalars (reference model.py:215-299; imagery reused
        from :170-192)."""
        meter = AverageMeter()
        n_batches = max(1, len(self.val_loader))
        for i, batch in enumerate(self.val_loader):
            host_batch = self._to_device(batch)
            batch = shard_batch(host_batch, self.mesh)
            scalars, depth, conf = self.eval_step(self.state, batch)
            meter.update(scalars)  # device-side accumulation, no sync
            gstep = epoch * n_batches + i
            if gstep % self.cfg.summary_freq == 0:
                scalars = {k: float(v) for k, v in scalars.items()}
                self._log("test", scalars, gstep)
                if self.writer is not None:
                    from dmvsnet_tpu.engine import imagery

                    imagery.log_images(
                        self.writer, "test",
                        imagery.training_images(host_batch, depth, conf),
                        gstep,
                    )
        self._log("test_avg", meter.avg, epoch)
        print(f"validate epoch {epoch}: {meter.avg}", flush=True)
        return meter.avg

    @staticmethod
    def _to_device(batch):
        return {
            k: jax.tree_util.tree_map(jnp.asarray, v)
            for k, v in batch.items()
            if k != "filename"
        }

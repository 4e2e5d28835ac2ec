"""End-to-end Trainer test on a synthetic on-disk DTU tree (CPU).

Covers the orchestration the reference does in Model.train
(reference model.py:87-213): loader construction from a Config, epoch
loop, checkpointing, validation, and full-state resume.
"""

import os

import numpy as np
import pytest

from dmvsnet_tpu.config import Config
from dmvsnet_tpu.engine import checkpoint as ckpt_lib
from dmvsnet_tpu.engine.train import Trainer
from dmvsnet_tpu.utils import synthetic


@pytest.fixture(scope="module")
def dtu_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dtu"))
    synthetic.write_dtu_training_tree(root, scans=("scan1",), n_views=3, height=64, width=160)
    return root


def _config(root, tmp, **kw):
    return Config(
        datapath=root, log_dir=os.path.join(tmp, "logs"),
        # explicit scan-name lists + sample caps: Config-level knobs for
        # fixture-sized runs, no dataset surgery needed
        trainlist="scan1", testlist="scan1",
        dataset_name="dtu_yao", nviews=3, batch_size=1, epochs=1,
        ndepths=(8, 8, 8), interval_ratio=(4, 2, 1), numdepth=16,
        eval_freq=10, summary_freq=1000, img_size=(64, 160),
        max_train_samples=2, max_val_samples=1,
    ).replace(**kw)


def test_trainer_epoch_checkpoint_resume(dtu_tree, tmp_path):
    cfg = _config(dtu_tree, str(tmp_path))
    trainer = Trainer(cfg)
    assert len(trainer.train_ds.metas) == 2
    assert len(trainer.val_ds.metas) == 1

    trainer.train()
    # checkpoint written for epoch 0
    latest = ckpt_lib.latest_checkpoint(cfg.log_dir)
    assert latest is not None and latest.endswith("model_000000")

    # validation runs and produces finite scalars
    scalars = trainer.validate(0)
    assert np.isfinite(scalars["loss"])

    # resume: a fresh trainer restores epoch + optimizer state
    cfg2 = cfg.replace(resume=latest)
    trainer2 = Trainer(cfg2)
    assert trainer2.start_epoch == 1
    assert int(trainer2.state.step) == int(trainer.state.step)

"""Convert a reference PyTorch checkpoint into this framework's format.

Usage:
  python tools/convert_torch_ckpt.py model.ckpt out_dir/

Maps the reference's state_dict (reference model.py:93-99 saves
{"model": state_dict, ...}; names follow networks/mvsnet.py module
attributes) onto the flax parameter tree, with layout transforms:

  Conv2d  (O,I,kh,kw)        -> (kh,kw,I,O)
  Conv3d  (O,I,kd,kh,kw)     -> (kd,kh,kw,I,O)
  ConvT2d (I,O,kh,kw)        -> (kh,kw,O,I)   [transpose_kernel layout]
  ConvT3d (I,O,kd,kh,kw)     -> (kd,kh,kw,O,I)
  BN weight/bias             -> scale/bias;  running stats -> batch_stats

The numeric equivalence of each block under these transforms is proven
in tests/test_blocks.py.  "attn_mask" keys are dropped exactly as the
reference's own loader does (reference model.py:66-69).
"""

from __future__ import annotations


# run directly (python tools/x.py): make the repo root importable
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

# module names that are transposed convolutions in the reference
# (networks/module.py:372-376 for CostRegNet_part, :414-418 for refine)
_DECONV_NAMES = {"conv7", "conv9", "conv11"}
# refine-part modules that are 2D (networks/module.py:411-414)
_REFINE_2D = {"conv5", "conv6", "conv7"}

# FeatureNet sequential indices -> our flat block names
_FEATURE_SEQ = {
    ("conv0", "0"): "conv0_0", ("conv0", "1"): "conv0_1",
    ("conv1", "0"): "conv1_0", ("conv1", "1"): "conv1_1", ("conv1", "2"): "conv1_2",
    ("conv2", "0"): "conv2_0", ("conv2", "1"): "conv2_1", ("conv2", "2"): "conv2_2",
}


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _convert_kernel(w: np.ndarray, is_deconv: bool) -> np.ndarray:
    """torch conv weight -> flax kernel (HWIO / DHWIO; deconv swaps I/O)."""
    if w.ndim == 4:  # conv (O,I,kh,kw); deconv (I,O,kh,kw) -> flax (kh,kw,O,I)
        return w.transpose(2, 3, 1, 0)
    if w.ndim == 5:
        return w.transpose(2, 3, 4, 1, 0)
    raise ValueError(f"unexpected conv weight rank {w.ndim}")


def convert_state_dict(sd: dict) -> tuple[dict, dict]:
    """torch state_dict -> (params, batch_stats) nested dicts."""
    params: dict = {}
    stats: dict = {}
    for key, tensor in sd.items():
        if "attn_mask" in key or key.endswith("num_batches_tracked"):
            continue
        w = np.asarray(tensor, dtype=np.float32)
        parts = key.split(".")
        if parts[0] == "module":  # DDP prefix
            parts = parts[1:]

        # --- resolve the module path ---
        if parts[0] == "feature":
            if (parts[1], parts[2]) in _FEATURE_SEQ:
                # e.g. feature.conv0.0.conv.weight / .bn.running_mean
                path = ["feature", _FEATURE_SEQ[(parts[1], parts[2])]]
                rest = parts[3:]
            else:
                # heads: feature.out1.weight, feature.inner1.bias, ...
                # (PlainConv wraps the raw nn.Conv2d under "conv")
                path = ["feature", parts[1]]
                rest = ["conv"] + parts[2:]
        elif parts[0] in ("cost_regularization", "cost_regularization_refine"):
            prefix = "cost_reg_" if parts[0] == "cost_regularization" else "cost_reg_refine_"
            stage = parts[1]
            branch = parts[2]               # cosR_small / cosR_huge
            module = parts[3]               # conv0..conv11 / prob
            path = [f"{prefix}{stage}", branch, module]
            rest = parts[4:]
            if module == "prob":
                rest = ["conv"] + rest      # PlainConv wraps the raw conv
        else:
            raise KeyError(f"unrecognized reference parameter {key!r}")

        # --- resolve the leaf ---
        leaf = rest[-1]
        sub = rest[0] if len(rest) > 1 else None
        is_deconv = path[-1] in _DECONV_NAMES

        if sub == "bn" or (sub is None and leaf in ("running_mean", "running_var")):
            if leaf == "weight":
                _set(params, path + ["bn", "scale"], w)
            elif leaf == "bias":
                _set(params, path + ["bn", "bias"], w)
            elif leaf == "running_mean":
                _set(stats, path + ["bn", "mean"], w)
            elif leaf == "running_var":
                _set(stats, path + ["bn", "var"], w)
            else:
                raise KeyError(f"unknown bn leaf in {key!r}")
        elif leaf == "weight":
            if w.ndim >= 4:
                _set(params, path + ["conv", "kernel"], _convert_kernel(w, is_deconv))
            else:
                raise KeyError(f"unexpected weight rank for {key!r}")
        elif leaf == "bias":
            _set(params, path + ["conv", "bias"], w)
        else:
            raise KeyError(f"unknown leaf in {key!r}")

    return params, stats


def _flatten(tree: dict, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v)


def _unconvert_kernel(w: np.ndarray) -> np.ndarray:
    """flax kernel -> torch conv weight (exact inverse of _convert_kernel;
    the deconv I/O swap is folded into the same transpose)."""
    if w.ndim == 4:   # (kh,kw,I,O) -> (O,I,kh,kw); deconv (kh,kw,O,I) -> (I,O,kh,kw)
        return w.transpose(3, 2, 0, 1)
    if w.ndim == 5:   # (kd,kh,kw,I,O) -> (O,I,kd,kh,kw)
        return w.transpose(4, 3, 0, 1, 2)
    raise ValueError(f"unexpected kernel rank {w.ndim}")


_FEATURE_SEQ_INV = {v: k for k, v in _FEATURE_SEQ.items()}


def export_state_dict(params: dict, stats: dict) -> dict:
    """(params, batch_stats) -> a reference-layout torch state_dict
    (numpy values; wrap with torch.from_numpy to load).  Exact inverse of
    convert_state_dict — round-trip tested in tests/test_convert.py.
    `num_batches_tracked` entries are omitted (the reference's own loader
    ignores them, reference model.py:66-69); load with strict=False."""
    sd: dict = {}

    def emit(tpath: str, leaf: str, w: np.ndarray):
        sd[f"{tpath}.{leaf}"] = w

    for path, w in _flatten(params):
        top = path[0]
        if top == "feature":
            block = path[1]
            if block in _FEATURE_SEQ_INV:
                seq, idx = _FEATURE_SEQ_INV[block]
                tpath = f"feature.{seq}.{idx}"
                sub = path[2]          # "conv" or "bn"
            else:                      # heads: PlainConv wraps raw conv
                tpath = f"feature.{block}"
                sub = None if path[2] == "conv" else path[2]
        elif top.startswith("cost_reg_refine_") or top.startswith("cost_reg_"):
            refine = top.startswith("cost_reg_refine_")
            stage = top.rsplit("_", 1)[1]
            prefix = ("cost_regularization_refine" if refine
                      else "cost_regularization")
            branch, module = path[1], path[2]
            if module == "prob":       # raw conv, no ".conv" in torch
                tpath = f"{prefix}.{stage}.{branch}.{module}"
                sub = None
            else:
                tpath = f"{prefix}.{stage}.{branch}.{module}"
                sub = path[3]          # "conv" / "bn"
                tpath = f"{tpath}.{sub}"
                sub = "done"
        else:
            raise KeyError(f"cannot export parameter path {path!r}")

        leaf = path[-1]
        if leaf == "kernel":
            w = _unconvert_kernel(w)
            name = "weight"
        elif leaf == "scale":
            name = "weight"
        elif leaf == "bias":
            name = "bias"
        else:
            raise KeyError(f"unknown param leaf in {path!r}")

        if sub == "done" or sub is None:
            emit(tpath, name, w)
        else:
            emit(f"{tpath}.{sub}", name, w)

    for path, w in _flatten(stats):
        top = path[0]
        leaf = path[-1]
        name = {"mean": "running_mean", "var": "running_var"}[leaf]
        if top == "feature":
            seq, idx = _FEATURE_SEQ_INV[path[1]]
            emit(f"feature.{seq}.{idx}.bn", name, w)
        elif top.startswith("cost_reg"):
            refine = top.startswith("cost_reg_refine_")
            stage = top.rsplit("_", 1)[1]
            prefix = ("cost_regularization_refine" if refine
                      else "cost_regularization")
            emit(f"{prefix}.{stage}.{path[1]}.{path[2]}.bn", name, w)
        else:
            raise KeyError(f"cannot export stat path {path!r}")
    return sd


def convert_file(ckpt_path: str, out_path: str) -> None:
    import torch

    from dmvsnet_tpu.engine.checkpoint import save_weights

    payload = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = payload.get("model", payload)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params, stats = convert_state_dict(sd)
    save_weights(out_path, params, stats)
    n = sum(int(np.prod(np.shape(x))) for x in _leaves(params))
    print(f"converted {len(sd)} tensors ({n} params) -> {out_path}")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    convert_file(sys.argv[1], sys.argv[2])

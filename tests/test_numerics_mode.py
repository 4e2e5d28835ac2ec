"""The bench's numerics mode is proven, not asserted (VERDICT r2 #3).

bench.py times the Pallas warp kernel at ``Precision.DEFAULT`` (one bf16
MXU pass); parity tests elsewhere run HIGHEST/interpret.  These tests
grade the DEFAULT mode itself:

* on real TPU hardware (opt-in: ``DMVSNET_TPU_TESTS=1``, because the
  suite's conftest pins the whole process to CPU), a subprocess runs
  tools/numerics_check.py — full-model depth/confidence maps at
  Precision.DEFAULT vs HIGHEST vs the XLA path, mm-scale tolerances;
* everywhere, the committed NUMERICS.json artifact (produced on the
  chip) is re-checked against the pinned tolerances, so a stale or
  regressed artifact fails the suite on any machine.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# Every eval default build_model flips in "auto" mode on TPU must have
# its gate entry in the TPU-produced NUMERICS.json.  A MISSING key FAILS
# the suite (VERDICT r4: the feature-bf16 default shipped for 17 minutes
# with no gate artifact because this check used to be conditional on key
# presence and passed vacuously).
SHIPPED_DEFAULT_GATES = (
    "depth_epipolar_vs_default_mm",      # warp_impl=auto -> epipolar
    "depth_costreg_bf16_vs_default_mm",  # costreg_dtype=auto -> bf16
    "depth_feature_bf16_vs_default_mm",  # feature_dtype=auto -> bf16
)


def _assert_within_tol(report: dict) -> None:
    tol = report["tol"]
    for key in SHIPPED_DEFAULT_GATES:
        assert key in report, (
            f"NUMERICS.json is missing the shipped-default gate {key!r}: "
            "either rerun tools/numerics_check.py --epipolar --costreg-bf16 "
            "--feature-bf16 on the chip, or flip the corresponding "
            "build_model auto default back to the ungated mode"
        )
    # device geometry must match float64 host geometry to ~1e-2 px —
    # guards against XLA's bf16 DEFAULT-precision matmuls sneaking back
    # into the projection/rectification algebra (round-5 find)
    gp = report["geometry_precision_px"]
    assert gp["warp_coords_px"] <= 1e-2, gp
    assert gp["rect_grid_px"] <= 1e-2, gp
    s = report["depth_default_vs_highest_mm"]
    assert s["mean"] <= tol["mean_mm"], s
    assert s["p99"] <= tol["p99_mm"], s
    assert s["max"] <= tol["max_mm"], s
    assert report["conf_default_vs_highest"]["mean"] <= tol["conf_mean"]
    x = report["depth_pallas_vs_xla_mm"]
    assert x["mean"] <= tol["mean_mm"] and x["max"] <= tol["max_mm"], x
    # the epipolar default-eval gate (VERDICT r3 #5): full-res
    # depth-metric neutrality, pinned in tools/numerics_check.py
    # (.get defaults cover artifacts from before the keys existed)
    e = report["depth_epipolar_vs_default_mm"]
    assert e["mean"] <= tol.get("epi_mean_mm", 0.5), e
    assert e["p99"] <= tol.get("epi_p99_mm", 5.0), e
    assert e["max"] <= tol.get("epi_max_mm", 60.0), e
    assert report["conf_epipolar_vs_default"]["mean"] <= tol["conf_mean"]
    # gates the bf16 cost-U-Net / feature-FPN eval defaults (build_model
    # auto mode) — depth AND confidence deltas (ADVICE r4)
    for key in ("costreg_bf16", "feature_bf16"):
        e = report[f"depth_{key}_vs_default_mm"]
        assert e["mean"] <= tol["mean_mm"], (key, e)
        assert e["p99"] <= tol["p99_mm"], (key, e)
        assert e["max"] <= tol["max_mm"], (key, e)
        c = report[f"conf_{key}_vs_default"]
        assert c["mean"] <= tol["conf_mean"], (key, c)


def test_numerics_artifact_within_tolerance():
    path = os.path.join(REPO, "NUMERICS.json")
    if not os.path.exists(path):
        pytest.skip("NUMERICS.json not yet produced on the chip")
    with open(path) as f:
        report = json.load(f)
    assert report["platform"] != "cpu", "artifact must come from real TPU"
    _assert_within_tol(report)


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("DMVSNET_TPU_TESTS"),
    reason="needs the real TPU chip (suite conftest pins CPU); "
    "set DMVSNET_TPU_TESTS=1",
)
def test_numerics_mode_on_chip(tmp_path):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the axon TPU platform win
    out = tmp_path / "numerics.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "numerics_check.py"),
         "--epipolar", "--costreg-bf16", "--feature-bf16", f"--json={out}"],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-4000:]
    with open(out) as f:
        _assert_within_tol(json.load(f))

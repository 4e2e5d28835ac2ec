"""Re-assert the committed T&T-scale smoke artifact (tools/tank_smoke.py).

The artifact is produced on the real chip (the full tank_test shape
envelope doesn't fit CPU test budgets); once committed, the suite
re-checks it on every machine so a stale or regressed artifact fails
loudly.  Bounds mirror the tool's own asserts.
"""

from __future__ import annotations

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tank_smoke_artifact():
    path = os.path.join(REPO, "TANK_SMOKE.json")
    if not os.path.exists(path):
        pytest.skip("TANK_SMOKE.json not yet produced on the chip")
    with open(path) as f:
        r = json.load(f)
    assert r["platform"] != "cpu", "artifact must come from real TPU"
    assert r["shape"] == [1056, 2048] and r["n_views"] == 11
    assert r["ndepths"] == [64, 32, 8] and r["filter"] == "dypcd"
    eng = r["engagement"]
    # routing sanity at the wide-baseline envelope: the sweep must engage
    # somewhere in stages 1-2 (never silently fallback-everywhere) and
    # every stage must carry an explicit per-view routing record
    assert any(v for k in ("stage1", "stage2") for v in eng[k]), eng
    for st in ("stage1", "stage2", "stage3"):
        assert len(eng[st]) == 10 and len(eng[st + "_refine"]) == 10
    assert r["fused_points"] > 50000
    assert abs(r["plane_z_median"] - 600.0) < 4.0

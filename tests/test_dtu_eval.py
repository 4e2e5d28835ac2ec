"""DTU evaluator tests with analytically known distances."""

import numpy as np

from dmvsnet_tpu.fusion import dtu_eval


def test_reduce_points_enforces_min_spacing(rng):
    pts = rng.uniform(0, 10, size=(2000, 3))
    thin = dtu_eval.reduce_points(pts, density=1.0)
    from scipy.spatial import cKDTree

    d, _ = cKDTree(thin).query(thin, k=2)
    assert d[:, 1].min() >= 1.0 - 1e-9
    assert len(thin) < len(pts)


def test_eval_scan_known_offset():
    """data = stl shifted by 0.3 along x => acc == comp == 0.3."""
    g = np.stack(np.meshgrid(*[np.arange(0, 20, 1.0)] * 3), -1).reshape(-1, 3)
    data = g + np.array([0.3, 0, 0])
    r = dtu_eval.eval_scan(data, g, reduce=False, max_dist=20.0)
    np.testing.assert_allclose(r.mean_acc, 0.3, atol=1e-6)
    np.testing.assert_allclose(r.mean_comp, 0.3, atol=1e-6)
    np.testing.assert_allclose(r.overall, 0.3, atol=1e-6)


def test_eval_scan_outlier_cutoff():
    """Points farther than max_dist are excluded from accuracy."""
    g = np.stack(np.meshgrid(*[np.arange(0, 10, 1.0)] * 3), -1).reshape(-1, 3)
    data = np.concatenate([g, g + np.array([1000.0, 0, 0])])  # half outliers
    r = dtu_eval.eval_scan(data, g, reduce=False, max_dist=20.0)
    np.testing.assert_allclose(r.mean_acc, 0.0, atol=1e-9)


def test_obs_mask_filters_accuracy():
    g = np.stack(np.meshgrid(*[np.arange(0, 10, 1.0)] * 3), -1).reshape(-1, 3)
    # mask observes only the x<5 half; data has a bad x>=5 half
    data = np.concatenate([g[g[:, 0] < 5], (g + 7.7)[g[:, 0] >= 5]])
    bb = np.array([[0.0, 0, 0], [10.0, 10, 10]])
    res = 1.0
    mask = np.zeros((11, 11, 11), np.uint8)
    mask[:6] = 1
    r = dtu_eval.eval_scan(
        data, g, obs_mask=mask, bb=bb, res=res,
        reduce=False, max_dist=20.0,
    )
    np.testing.assert_allclose(r.mean_acc, 0.0, atol=1e-9)  # bad half masked out


def test_ground_plane_filters_completeness():
    g = np.stack(np.meshgrid(*[np.arange(0, 10, 1.0)] * 3), -1).reshape(-1, 3)
    data = g[g[:, 2] >= 5] if True else g
    # plane z>5: completeness only over the top half, which data covers
    plane = np.array([0.0, 0, 1.0, -5.0])
    r = dtu_eval.eval_scan(data, g, ground_plane=plane, reduce=False)
    np.testing.assert_allclose(r.mean_comp, 0.0, atol=1e-9)


def test_obs_mask_matches_matlab_transcription(rng):
    """mask_points_by_obs vs a literal transcription of
    PointCompareMain.m:33-41 (1-based, MATLAB half-away-from-zero round),
    including exact half-cell boundary points and negatives."""
    res = 0.25
    bb0 = np.array([1.0, -2.0, 3.0])
    mask = (rng.uniform(size=(13, 9, 11)) > 0.5).astype(np.uint8)
    pts = bb0 + rng.uniform(-1.5, 4.0, size=(500, 3))
    # exact boundary cases: half-cell offsets, negative side
    pts = np.concatenate([
        pts,
        bb0 + res * np.array([[0.5, 0.5, 0.5], [1.5, 2.5, 3.5],
                              [-0.5, 0.0, 0.0], [-1.5, 1.0, 1.0]]),
    ])

    def matlab_keep(p):
        qv = np.array([round_half_away((pc - b0) / res + 1.0)
                       for pc, b0 in zip(p, bb0)])
        if np.all((qv >= 1) & (qv <= np.array(mask.shape))):
            return mask[int(qv[0]) - 1, int(qv[1]) - 1, int(qv[2]) - 1] > 0
        return False

    def round_half_away(x):
        import math
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    expected = np.array([matlab_keep(p) for p in pts])
    got = dtu_eval.mask_points_by_obs(pts, mask, np.stack([bb0, bb0 + 10]), res)
    np.testing.assert_array_equal(got, expected)

"""Parity of the geo_check depth-fusion filter vs the reference numpy/cv2
implementation (dead code upstream, `utils/geo_check.py:33-127`, but part of
its utility surface and the spec for depth-consistency filtering)."""

import numpy as np
import pytest

from tests import reference_oracle  # noqa: F401  (sys.path to reference)

from scgaussian_tpu.eval import geo_check as gc


def _small_rig(n=4, h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    K = np.eye(3, dtype=np.float64)
    K[0, 0] = K[1, 1] = 40.0
    K[0, 2], K[1, 2] = w / 2, h / 2
    intrs = np.stack([K] * n)
    extrs = []
    for i in range(n):
        E = np.eye(4)
        E[:3, 3] = [0.03 * i, 0.01 * i, 0.0]  # small baseline shifts
        extrs.append(E)
    extrs = np.stack(extrs)
    # a smooth slanted-plane depth, identical geometry in every view up to
    # the tiny camera shifts -> mostly consistent
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = 2.0 + 0.01 * xx + 0.005 * yy
    depths = np.stack([base + 0.001 * rng.standard_normal((h, w)) for _ in range(n)])
    return intrs, extrs, depths.astype(np.float64)


def test_reproject_with_depth_matches_reference():
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from utils import geo_check as ref_gc

    intrs, extrs, depths = _small_rig()
    ours = gc.reproject_with_depth(
        depths[0].astype(np.float32), intrs[0].astype(np.float32),
        extrs[0].astype(np.float32), depths[1].astype(np.float32),
        intrs[1].astype(np.float32), extrs[1].astype(np.float32))
    ref = ref_gc.reproject_with_depth(
        depths[0].astype(np.float32), intrs[0], extrs[0],
        depths[1].astype(np.float32), intrs[1], extrs[1])
    for a, b in zip(ours, ref):
        # interiors match; cv2.remap BORDER_CONSTANT edge handling differs
        # by half-pixel at the image rim, so compare the interior
        np.testing.assert_allclose(
            np.asarray(a)[2:-2, 2:-2], b[2:-2, 2:-2], rtol=1e-3, atol=1e-3)


def test_geocheck_masks_and_depths_match_reference():
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from utils import geo_check as ref_gc

    intrs, extrs, depths = _small_rig()
    ours_d, ours_m = gc.geocheck(
        intrs, extrs, depths, view_thresh=1, num_select=3)
    # the reference hardcodes num_src=15; with 4 cameras its pair table
    # truncates to 3 sources per view, same as num_select=3 here
    ref_d, ref_m = ref_gc.geocheck(
        intrs, extrs, [d.astype(np.float32) for d in depths], view_thresh=1)
    inner = (slice(None), slice(2, -2), slice(2, -2))
    np.testing.assert_array_equal(ours_m[inner], ref_m[inner])
    np.testing.assert_allclose(ours_d[inner], ref_d[inner], rtol=1e-3, atol=1e-3)


def test_geocheck_rejects_inconsistent_view():
    intrs, extrs, depths = _small_rig()
    depths[2] *= 1.5  # break one view's depths
    _, masks = gc.geocheck(intrs, extrs, depths, view_thresh=1, num_select=3)
    # view 2 disagrees with everyone (strictly-greater threshold: a view
    # needs >1 of its 3 sources consistent; view 0/1/3 still have 2)
    assert masks[2].mean() < 0.05
    assert masks[0].mean() > 0.5


def test_visualize_depth_shape():
    img = gc.visualize_depth(np.linspace(0.5, 2.0, 48).reshape(6, 8))
    assert img.size == (8, 6)

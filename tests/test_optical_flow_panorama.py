"""Optical flow + panorama pipeline tests on synthetic imagery."""

import pytest
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.frontend.optical_flow import grid_seed_points, lk_track
from slam_tricks_tpu.pipelines.panorama import (
    chain_to_middle,
    harris_corners,
    match_descriptors,
    pairwise_homography,
    patch_descriptors,
)

RNG = np.random.default_rng(29)


def textured_image(h=120, w=160, seed=0):
    """Smooth random texture with enough gradient structure for LK/Harris."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(h // 8 + 2, w // 8 + 2))
    img = np.kron(base, np.ones((8, 8)))[:h, :w]
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(img, 2.0)
    img = (img - img.min()) / (img.max() - img.min())
    return img.astype(np.float32)


def shift_image(img, dx, dy):
    """Subpixel shift via scipy map_coordinates (ground-truth warp)."""
    from scipy.ndimage import map_coordinates

    h, w = img.shape
    yy, xx = np.mgrid[0:h, 0:w]
    return map_coordinates(img, [yy - dy, xx - dx], order=3,
                           mode="nearest").astype(np.float32)


class TestLK:
    def test_constant_translation(self):
        img1 = textured_image(seed=1)
        dx, dy = 3.4, -2.2
        img2 = shift_image(img1, dx, dy)
        pts = jnp.asarray(grid_seed_points(*img1.shape, grid=5, pts_per_cell=1,
                                           margin=20, seed=2))
        pts2, valid = lk_track(jnp.asarray(img1), jnp.asarray(img2), pts,
                               levels=3, win=7, iters=15)
        flow = np.asarray(pts2 - pts)[np.asarray(valid)]
        assert len(flow) > 10
        err = np.abs(flow - [dx, dy])
        assert np.median(err[:, 0]) < 0.25, np.median(err, axis=0)
        assert np.median(err[:, 1]) < 0.25, np.median(err, axis=0)


class TestPanoramaPieces:
    def test_harris_and_matching_identity(self):
        img = jnp.asarray(textured_image(seed=3))
        s, xy = harris_corners(img, k=64)
        d = patch_descriptors(img, xy)
        idx, ok = match_descriptors(d, d)
        valid = np.isfinite(np.asarray(s))
        # identical images: matches are the identity map
        assert (np.asarray(idx)[valid] == np.arange(len(valid))[valid]).mean() > 0.9

    @pytest.mark.slow
    def test_pairwise_homography_translation(self):
        import jax

        img1 = textured_image(h=140, w=180, seed=4)
        dx, dy = 12.0, 5.0
        img2 = shift_image(img1, -dx, -dy)  # content moves by (-dx,-dy) => H maps x -> x - dx
        H, n_in = pairwise_homography(jax.random.PRNGKey(0),
                                      jnp.asarray(img1), jnp.asarray(img2))
        H = np.asarray(H)
        H = H / H[2, 2]
        assert int(n_in) > 15, int(n_in)
        assert abs(H[0, 2] - (-dx)) < 0.5, H
        assert abs(H[1, 2] - (-dy)) < 0.5, H

    def test_chain_to_middle(self):
        Hs = [np.diag([1.0, 1, 1]), np.diag([2.0, 2, 1])]
        chained = chain_to_middle(Hs)
        assert np.allclose(chained[1], np.eye(3))
        assert np.allclose(chained[0], Hs[0])

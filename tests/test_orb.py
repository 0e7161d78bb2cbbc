"""ORB features (frontend/orb): detection quality, rotation-steered
descriptor invariance, and geometric consistency of matches on a real image
pair (the role of cv::ORB detectAndMatch — st0 struct_def.hpp:113-134)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from slam_tricks_tpu.frontend.orb import orb_detect, orb_match

REF = "/root/reference"


def _synthetic(seed=0, H=240, W=320, n_shapes=50):
    """Random filled polygons — hard corners, good FAST repeatability."""
    import cv2

    rng = np.random.default_rng(seed)
    img = np.full((H, W), 0.5, np.float32)
    for _ in range(n_shapes):
        c = rng.uniform([30, 30], [W - 30, H - 30])
        k = rng.integers(3, 6)
        ang = rng.uniform(0, 2 * np.pi, k)
        rad = rng.uniform(6, 22, k)
        pts = (c[None] + np.stack([rad * np.cos(ang),
                                   rad * np.sin(ang)], 1)).astype(np.int32)
        cv2.fillPoly(img, [pts], float(rng.uniform(0, 1)))
    img = cv2.GaussianBlur(img, (0, 0), 1.0)
    return np.clip(img, 0, 1).astype(np.float32)


def _rotate(img, deg):
    import cv2

    H, W = img.shape
    M = cv2.getRotationMatrix2D((W / 2, H / 2), deg, 1.0)
    return cv2.warpAffine(np.array(img), M, (W, H)), M


def test_detects_corners_synthetic():
    img = _synthetic()
    f = orb_detect(jnp.asarray(img), n=256)
    assert int(f.valid.sum()) > 80
    xy = np.asarray(f.xy)[np.asarray(f.valid)]
    assert xy[:, 0].min() >= 16 and xy[:, 0].max() < img.shape[1] - 16


def test_rotation_matching():
    """Features matched across a 30-degree rotation must map under the known
    transform, and the steered descriptors must make that possible at all."""
    img = _synthetic(seed=3)
    rot, M = _rotate(img, 30.0)
    f1 = orb_detect(jnp.asarray(img), n=300)
    f2 = orb_detect(jnp.asarray(rot), n=300)
    idx2, ok = orb_match(f1, f2, ratio=0.8, max_hamming=48)
    ok = np.asarray(ok)
    assert ok.sum() >= 30, int(ok.sum())
    xy1 = np.asarray(f1.xy)[ok]
    xy2 = np.asarray(f2.xy)[np.asarray(idx2)[ok]]
    pred = xy1 @ M[:, :2].T + M[:, 2]
    err = np.linalg.norm(pred - xy2, axis=1)
    frac = float((err < 3.0).mean())
    assert frac > 0.7, (frac, np.median(err))


@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference checkout")
def test_real_image_pair_consistency():
    """KITTI consecutive frames (st13 data): ORB matches must be dominated
    by a consistent small motion (median flow < 40 px, >= 40 matches)."""
    import cv2

    d = f"{REF}/st13-directmethod/img"
    names = sorted(os.listdir(d))[:2]
    imgs = [cv2.imread(os.path.join(d, n), cv2.IMREAD_GRAYSCALE) / 255.0
            for n in names]
    f1 = orb_detect(jnp.asarray(imgs[0], jnp.float32), n=512)
    f2 = orb_detect(jnp.asarray(imgs[1], jnp.float32), n=512)
    idx2, ok = orb_match(f1, f2)
    ok = np.asarray(ok)
    assert ok.sum() >= 40, int(ok.sum())
    xy1 = np.asarray(f1.xy)[ok]
    xy2 = np.asarray(f2.xy)[np.asarray(idx2)[ok]]
    flow = np.linalg.norm(xy2 - xy1, axis=1)
    assert np.median(flow) < 40.0, float(np.median(flow))
    # the majority must agree with the median flow direction (no random
    # mismatch soup)
    med = np.median(xy2 - xy1, axis=0)
    agree = np.linalg.norm((xy2 - xy1) - med, axis=1) < 20.0
    assert agree.mean() > 0.5, float(agree.mean())


def test_orb_in_panorama_pipeline():
    """ORB as the feature path of the st11 homography estimator."""
    import jax

    from slam_tricks_tpu.pipelines.panorama import apply_h, pairwise_homography

    img = _synthetic(seed=9)
    # pure translation "pan"
    t = np.zeros_like(img)
    t[:, :-40] = img[:, 40:]
    H, n_in = pairwise_homography(jax.random.PRNGKey(0), jnp.asarray(img),
                                  jnp.asarray(t), n_corners=256,
                                  features="orb")
    assert int(n_in) >= 20
    pt = apply_h(H, jnp.asarray([[160.0, 120.0]]))
    np.testing.assert_allclose(np.asarray(pt), [[120.0, 120.0]], atol=2.0)

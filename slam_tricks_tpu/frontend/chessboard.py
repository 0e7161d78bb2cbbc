"""Chessboard corner detection — TPU-native re-design of the reference's
largest component (st10-chessCorner, paper "Automatic Camera and Range Sensor
Calibration using a single Shot").

Pipeline mapping (reference detector.cpp:11-110):
 1. corner likelihood: prototype-kernel correlations composed with min/max
    (compute_likehood :211-247)          -> `corner_likelihood` (lax.conv)
 2. candidate extraction: NMS + threshold (findCorners :249-265)
                                          -> ops.nms.top_k_peaks (static top-k)
 3. orientation estimation: gradient-orientation histogram + mode finding
    (verifyCorners :267-380, meanShift helper.cpp:179-205)
                                          -> `estimate_orientations` (vmapped
    soft histogram + circular smoothing + top-2 modes)
 4. subpixel refinement: GN on gradient orthogonality (refineCorners :381-400)
                                          -> `refine_corners_subpixel` (vmapped
    closed-form 2x2 solve of the structure-tensor normal equations)
 5. chessboard growth (:469-824): greedy sequential search — a poor TPU fit by
    design; provided as a host-side numpy routine `grow_chessboards`.

All device-side stages are static-shape and batched over a fixed candidate
budget K; invalid slots carry score -inf / weight 0.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.ops.image import conv2d, gaussian_blur, sobel
from slam_tricks_tpu.ops.nms import top_k_peaks


def _prototype_kernels(radius, angles, dtype=jnp.float32):
    """Four quadrant kernels (A,B = opposing pair; C,D = the other pair) for a
    corner prototype at the given axis angles (prototype.h:9-24 role)."""
    n = 2 * radius + 1
    ys, xs = np.meshgrid(np.arange(n) - radius, np.arange(n) - radius, indexing="ij")
    r = np.sqrt(xs ** 2 + ys ** 2)
    weight = np.exp(-0.5 * (r / (radius / 2.0)) ** 2)
    a0, a1 = angles
    n0 = np.array([-math.sin(a0), math.cos(a0)])
    n1 = np.array([-math.sin(a1), math.cos(a1)])
    s0 = xs * n0[1] + ys * n0[0]
    s1 = xs * n1[1] + ys * n1[0]
    kA = weight * ((s0 > 0.1) & (s1 > 0.1))
    kB = weight * ((s0 < -0.1) & (s1 < -0.1))
    kC = weight * ((s0 > 0.1) & (s1 < -0.1))
    kD = weight * ((s0 < -0.1) & (s1 > 0.1))
    ks = []
    for k in (kA, kB, kC, kD):
        tot = k.sum()
        ks.append(jnp.asarray((k / max(tot, 1e-9)).astype(np.float32), dtype=dtype))
    return ks


def corner_likelihood(img, radius=4):
    """Corner likelihood map via two prototypes (axis-aligned and diagonal),
    min/max composition per the paper (detector.cpp:211-247 semantics).

    img: (H,W) float in [0,1]. Returns (H,W) likelihood."""
    like = None
    for angles in ((0.0, math.pi / 2), (math.pi / 4, 3 * math.pi / 4)):
        kA, kB, kC, kD = _prototype_kernels(radius, angles, img.dtype)
        fA = conv2d(img, kA)
        fB = conv2d(img, kB)
        fC = conv2d(img, kC)
        fD = conv2d(img, kD)
        mu = 0.25 * (fA + fB + fC + fD)
        s1 = jnp.minimum(jnp.minimum(fA, fB) - mu, mu - jnp.maximum(fC, fD))
        s2 = jnp.minimum(mu - jnp.maximum(fA, fB), jnp.minimum(fC, fD) - mu)
        s = jnp.maximum(s1, s2)
        like = s if like is None else jnp.maximum(like, s)
    return jnp.maximum(like, 0.0)


def detect_corners(img, k=256, radius=4, nms_radius=5, rel_threshold=0.03):
    """Stages 1+2: likelihood -> NMS -> top-k candidates.

    Returns (scores (k,), xy (k,2) float pixel coords) — slots below threshold
    have score -inf."""
    like = corner_likelihood(img, radius)
    thresh = rel_threshold * jnp.max(like)
    scores, rows, cols = top_k_peaks(like, k, nms_radius, thresh)
    xy = jnp.stack([cols, rows], axis=1).astype(img.dtype)
    return scores, xy


def refine_corners_subpixel(img, xy, window=10):
    """Stage 4: solve (sum g g^T) c = sum (g g^T) p over the window — the
    gradient-orthogonality normal equations (refineCorners detector.cpp:381-400).
    Returns refined (k,2) positions (unmoved where the system is degenerate)."""
    gx, gy = sobel(img)
    H, W = img.shape
    n = 2 * window + 1
    dy, dx = jnp.meshgrid(jnp.arange(-window, window + 1),
                          jnp.arange(-window, window + 1), indexing="ij")

    def one(p):
        x0 = jnp.clip(jnp.round(p[0]).astype(jnp.int32), window, W - window - 1)
        y0 = jnp.clip(jnp.round(p[1]).astype(jnp.int32), window, H - window - 1)
        ys = y0 + dy
        xs = x0 + dx
        gxx = gx[ys, xs]
        gyy = gy[ys, xs]
        # structure tensor and weighted centroid system
        a = jnp.sum(gxx * gxx)
        b = jnp.sum(gxx * gyy)
        c = jnp.sum(gyy * gyy)
        px = xs.astype(img.dtype)
        py = ys.astype(img.dtype)
        bx = jnp.sum((gxx * gxx) * px + (gxx * gyy) * py)
        by = jnp.sum((gxx * gyy) * px + (gyy * gyy) * py)
        det = a * c - b * b
        ok = det > 1e-8
        inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        cx = inv_det * (c * bx - b * by)
        cy = inv_det * (a * by - b * bx)
        refined = jnp.stack([cx, cy])
        # clamp runaway solutions to the window
        good = ok & (jnp.max(jnp.abs(refined - p)) < window)
        return jnp.where(good, refined, p)

    return jax.vmap(one)(xy)


def estimate_orientations(img, xy, window=10, n_bins=32):
    """Stage 3: per-candidate gradient-orientation histogram (soft binning),
    circular Gaussian smoothing, top-2 modes -> two edge angles in [0, pi).

    Returns (angles (k,2), mode_strengths (k,2))."""
    gx, gy = sobel(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.mod(jnp.arctan2(gy, gx), jnp.pi)  # edge orientation mod pi
    H, W = img.shape
    dy, dx = jnp.meshgrid(jnp.arange(-window, window + 1),
                          jnp.arange(-window, window + 1), indexing="ij")
    bin_centers = jnp.arange(n_bins) * (jnp.pi / n_bins)

    def one(p):
        x0 = jnp.clip(jnp.round(p[0]).astype(jnp.int32), window, W - window - 1)
        y0 = jnp.clip(jnp.round(p[1]).astype(jnp.int32), window, H - window - 1)
        ys = y0 + dy
        xs = x0 + dx
        m = mag[ys, xs].reshape(-1)
        a = ang[ys, xs].reshape(-1)
        # soft circular binning (replaces meanShift, helper.cpp:179-205)
        d = a[:, None] - bin_centers[None, :]
        d = jnp.abs(jnp.mod(d + jnp.pi / 2, jnp.pi) - jnp.pi / 2)
        w = jnp.exp(-0.5 * (d / (jnp.pi / n_bins)) ** 2)
        hist = jnp.sum(m[:, None] * w, axis=0)
        # top-2 well-separated modes
        i1 = jnp.argmax(hist)
        sep = jnp.abs(jnp.mod(bin_centers - bin_centers[i1] + jnp.pi / 2, jnp.pi)
                      - jnp.pi / 2)
        masked = jnp.where(sep > jnp.pi / 8, hist, -jnp.inf)
        i2 = jnp.argmax(masked)
        return (jnp.stack([bin_centers[i1], bin_centers[i2]]),
                jnp.stack([hist[i1], masked[i2]]))

    return jax.vmap(one)(xy)


def verify_corners(img, xy, scores, window=10, min_mode_ratio=0.3,
                   min_separation=jnp.pi / 4):
    """Stage 3b: chessboard-corner verification — keep candidates whose
    gradient histogram shows two strong, well-separated edge modes
    (verifyCorners role, detector.cpp:267-380). Returns scores with rejected
    candidates set to -inf (static shape).

    Real-photo caveat: at small square sizes the 21x21 histogram window
    under-resolves the modes; tune `window` to ~0.5 square sizes."""
    angles, strength = estimate_orientations(img, xy, window=window)
    sep = jnp.abs(jnp.mod(angles[:, 0] - angles[:, 1] + jnp.pi / 2, jnp.pi)
                  - jnp.pi / 2)
    ratio = strength[:, 1] / jnp.maximum(strength[:, 0], 1e-9)
    ok = (ratio > min_mode_ratio) & (sep > min_separation)
    return jnp.where(ok, scores, -jnp.inf)


def grow_chessboards(xy, angles, scores, max_boards=4, dist_factor=1.6):
    """Stage 5 (host-side numpy): greedy growth of chessboard grids from corner
    candidates — the sequential seed/grow/energy logic of the reference
    (initChessBoard/growChessBoard detector.cpp:602-815) simplified to
    nearest-in-direction chaining. Returns list of (rows, cols) index grids.

    Sequential pointer-chasing is a deliberate host-side step (SURVEY §7 step
    10: poor TPU fit); the heavy stages 1-4 stay on device."""
    xy = np.asarray(xy)
    scores = np.asarray(scores)
    valid = np.isfinite(scores)
    idxs = np.nonzero(valid)[0]
    if len(idxs) < 9:
        return []
    pts = xy[idxs]
    used = np.zeros(len(idxs), bool)
    boards = []

    def nearest_in_dir(from_i, direction, exclude):
        d = pts - pts[from_i]
        dist = np.linalg.norm(d, axis=1) + 1e-9
        cosang = (d @ direction) / dist
        score = np.where((cosang > 0.85) & ~exclude, dist, np.inf)
        j = int(np.argmin(score))
        return j if np.isfinite(score[j]) else -1

    order = np.argsort(-scores[idxs])
    for seed in order:
        if used[seed] or len(boards) >= max_boards:
            continue
        # estimate local grid direction from the two nearest neighbors
        d = np.linalg.norm(pts - pts[seed], axis=1)
        d[seed] = np.inf
        nn = np.argsort(d)[:2]
        dir1 = (pts[nn[0]] - pts[seed]) / (d[nn[0]] + 1e-9)
        dir2 = (pts[nn[1]] - pts[seed]) / (d[nn[1]] + 1e-9)
        if abs(dir1 @ dir2) > 0.7:
            continue
        # walk a row then columns
        def walk(start, direction):
            chain = [start]
            step = d[nn[0]]
            while True:
                ex = used.copy()
                ex[chain] = True
                j = nearest_in_dir(chain[-1], direction, ex)
                if j < 0:
                    break
                gap = np.linalg.norm(pts[j] - pts[chain[-1]])
                if gap > dist_factor * step:
                    break
                step = gap
                chain.append(j)
            return chain

        back = walk(seed, -dir1)  # [seed, ...going backward]
        fwd = walk(seed, dir1)    # [seed, ...going forward]
        row = back[1:][::-1] + fwd
        if len(row) < 3:
            continue
        grid = [row]
        for sgn in (1, -1):
            base = row
            while True:
                nxt = []
                ok = True
                for i in base:
                    ex = used.copy()
                    for g in grid:
                        ex[g] = True
                    j = nearest_in_dir(i, sgn * dir2, ex)
                    if j < 0:
                        ok = False
                        break
                    nxt.append(j)
                if not ok or len(set(nxt)) != len(nxt):
                    break
                if sgn > 0:
                    grid.append(nxt)
                else:
                    grid.insert(0, nxt)
                base = nxt
        if len(grid) >= 3:
            for g in grid:
                used[g] = True
            boards.append(np.asarray([[idxs[i] for i in g] for g in grid]))
    return boards

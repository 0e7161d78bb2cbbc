"""Image resampling and filtering ops: bilinear/nearest sampling, whole-image
undistortion, separable Gaussian, Sobel gradients.

Reference: st1 whole-image undistortion with nearest/bilinear interpolation
(st1-undistort/src/include/undistort_img.hpp:30-133 — per-pixel scalar loops
there; here one gather + fused arithmetic over the full pixel grid), Sobel and
filtering used by the chessboard detector (st10 detector.cpp:267-300).
"""

import jax
import jax.numpy as jnp


def sample_nearest(img, xy):
    """img (H,W) or (H,W,C); xy (...,2) in (x,y) pixel coords -> samples."""
    H, W = img.shape[:2]
    x = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32), 0, H - 1)
    return img[y, x]


def sample_bilinear(img, xy):
    """Bilinear sampling; img (H,W) or (H,W,C); xy (...,2) (x,y)."""
    H, W = img.shape[:2]
    x = jnp.clip(xy[..., 0], 0.0, W - 1.0)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    fx = x - x0
    fy = y - y0
    if img.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    top = i00 * (1 - fx) + i01 * fx
    bot = i10 * (1 - fx) + i11 * fx
    return top * (1 - fy) + bot * fy


def undistort_image(img, intr, dist, interpolation="bilinear"):
    """Whole-image undistortion (undistort_img.hpp:104-130): for each output
    (undistorted) pixel, forward-distort its coordinates and sample the source.
    img (H,W[,C]) -> same shape."""
    from slam_tricks_tpu.residuals.camera import distort_normalized

    H, W = img.shape[:2]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32),
                          jnp.arange(W, dtype=img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32),
                          indexing="ij")
    u = (xs - intr.cx) / intr.fx
    v = (ys - intr.cy) / intr.fy
    pn = jnp.stack([u.reshape(-1), v.reshape(-1)], axis=1)
    pd = jax.vmap(lambda p: distort_normalized(dist, p))(pn)
    xd = pd[:, 0] * intr.fx + intr.cx
    yd = pd[:, 1] * intr.fy + intr.cy
    xy = jnp.stack([xd, yd], axis=1).reshape(H, W, 2)
    fimg = img.astype(xy.dtype)
    out = sample_bilinear(fimg, xy) if interpolation == "bilinear" else sample_nearest(fimg, xy)
    return out.astype(img.dtype)


def conv2d(img, kernel):
    """'Same' 2D correlation of (H,W) with (kh,kw) — the filter2D analog."""
    out = jax.lax.conv_general_dilated(
        img[None, None, :, :], kernel[None, None, :, :],
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out[0, 0]


def gaussian_kernel1d(sigma, radius=None, dtype=jnp.float32):
    if radius is None:
        radius = int(3.0 * sigma + 0.5)
    x = jnp.arange(-radius, radius + 1, dtype=dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img, sigma):
    """Separable Gaussian (the detector's circular gauss filter role,
    st10 helper.cpp:165-177)."""
    k = gaussian_kernel1d(sigma, dtype=img.dtype)
    img = conv2d(img, k[None, :])
    return conv2d(img, k[:, None])


def sobel(img):
    """Returns (gx, gy) Sobel gradients (detector.cpp:269-272 role)."""
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=img.dtype)
    ky = kx.T
    return conv2d(img, kx), conv2d(img, ky)

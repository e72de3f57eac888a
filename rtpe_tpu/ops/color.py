"""Colorspace conversions as fusable jnp ops.

The reference converts images to LAB/HSV on the host with skimage
(``rtpe/dataloaders.py:15,338-344,353-355``) feeding the dual-colorspace
student input.  Here the conversion is closed-form jnp so it fuses into
the device-side input pipeline instead of costing a host round trip.

Conventions match ``skimage.color.rgb2lab`` / ``rgb2hsv`` for float
inputs in [0, 1]: sRGB, D65/2° white point; HSV channels all in [0, 1].
"""

import jax
import jax.numpy as jnp

# sRGB -> XYZ (D65) matrix, rows = X, Y, Z
_RGB2XYZ = jnp.array([
    [0.412456439089692, 0.357576077643909, 0.180437483266399],
    [0.212672851405623, 0.715152155287818, 0.072174993306560],
    [0.019333895582329, 0.119192025881303, 0.950304078536368],
], dtype=jnp.float32)

# D65 reference white
_XYZ_REF = jnp.array([0.95047, 1.0, 1.08883], dtype=jnp.float32)


@jax.jit
def rgb_to_lab(rgb: jax.Array) -> jax.Array:
    """(..., 3) sRGB in [0,1] -> CIELAB (L in [0,100], a/b roughly ±128)."""
    rgb = rgb.astype(jnp.float32)
    # inverse sRGB companding
    linear = jnp.where(rgb > 0.04045,
                       ((rgb + 0.055) / 1.055) ** 2.4,
                       rgb / 12.92)
    xyz = jnp.einsum("ij,...j->...i", _RGB2XYZ, linear)
    xyz = xyz / _XYZ_REF
    eps = 0.008856451679035631  # (6/29)^3
    kappa = 7.787037037037035   # (29/6)^2 / 3 / 4.045... = 1/3*(29/6)^2
    f = jnp.where(xyz > eps, jnp.cbrt(xyz), kappa * xyz + 16.0 / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    lab_l = 116.0 * fy - 16.0
    lab_a = 500.0 * (fx - fy)
    lab_b = 200.0 * (fy - fz)
    return jnp.stack([lab_l, lab_a, lab_b], axis=-1)


@jax.jit
def rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    """(..., 3) RGB in [0,1] -> HSV, all channels in [0,1]."""
    rgb = rgb.astype(jnp.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    delta = maxc - minc
    safe = jnp.where(delta == 0, 1.0, delta)
    # hue
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta == 0, 0.0, (h / 6.0) % 1.0)
    # saturation
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))
    return jnp.stack([h, s, maxc], axis=-1)

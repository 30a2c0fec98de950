"""On-device H&E stain normalization (Macenko).

Scanner/stain variation is the dominant domain shift in WSI pipelines; the
reference has no stain handling. This is the standard Macenko (2009) method
— optical-density eigenplane projection, robust angle extremes, least-squares
concentration unmixing, renormalization to a reference stain basis — written
as a single jittable program so it can fuse into the on-device augmentation
pipeline (``data/augment.py``) or run as a preprocessing pass.

Everything is static-shape: percentiles run over masked ODs via sorting with
+inf padding, and the 3×3 eigendecomposition uses ``jnp.linalg.eigh``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

#: widely used reference H&E stain basis (columns: hematoxylin, eosin)
DEFAULT_STAIN_REF = np.array(
    [[0.5626, 0.2159],
     [0.7201, 0.8012],
     [0.4062, 0.5581]], np.float32,
)
#: reference 99th-percentile stain concentrations
DEFAULT_MAX_CONC = np.array([1.9705, 1.0308], np.float32)

_IO = 240.0  # transmitted-light intensity
_BETA = 0.15  # OD threshold below which pixels count as background
_ALPHA = 1.0  # robust percentile for angle extremes


def _masked_percentile(values, mask, q: float):
    """Percentile of ``values`` where ``mask`` (static shape): masked-out
    entries are pushed to +inf and the index is scaled by the live count."""
    n = values.shape[0]
    live = jnp.sum(mask)
    sorted_vals = jnp.sort(jnp.where(mask, values, jnp.inf))
    idx = jnp.clip(
        (q / 100.0) * jnp.maximum(live - 1, 0), 0, n - 1
    ).astype(jnp.int32)
    return sorted_vals[idx]


@functools.partial(jax.jit, static_argnames=())
def macenko_stains(img_u8, stain_ref=None):
    """Estimate the image's 3x2 stain basis and 99th-percentile
    concentrations (the per-image half of Macenko normalization).

    Args:
        img_u8: (H, W, 3) uint8 RGB.
    Returns:
        (stains (3, 2), max_conc (2,), tissue_frac scalar).
    """
    x = img_u8.reshape(-1, 3).astype(jnp.float32)
    od = -jnp.log(jnp.clip((x + 1.0) / _IO, 1e-6, None))  # (N, 3)
    tissue = jnp.all(od > _BETA, axis=1)  # (N,)
    tissue_frac = jnp.mean(tissue.astype(jnp.float32))

    w = tissue.astype(jnp.float32)[:, None]
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(od * w, axis=0) / n
    centered = (od - mean) * w
    cov = centered.T @ centered / n  # (3, 3)
    _vals, vecs = jnp.linalg.eigh(cov)
    plane = vecs[:, 1:3]  # two largest eigenvectors

    proj = od @ plane  # (N, 2)
    phi = jnp.arctan2(proj[:, 1], proj[:, 0])
    phi_min = _masked_percentile(phi, tissue, _ALPHA)
    phi_max = _masked_percentile(phi, tissue, 100.0 - _ALPHA)

    v1 = plane @ jnp.stack([jnp.cos(phi_min), jnp.sin(phi_min)])
    v2 = plane @ jnp.stack([jnp.cos(phi_max), jnp.sin(phi_max)])
    # hematoxylin is the more "blue" extreme: order by first OD component
    swap = v1[0] < v2[0]
    h_vec = jnp.where(swap, v2, v1)
    e_vec = jnp.where(swap, v1, v2)
    stains = jnp.stack([h_vec, e_vec], axis=1)  # (3, 2)
    stains = stains / jnp.maximum(
        jnp.linalg.norm(stains, axis=0, keepdims=True), 1e-6
    )

    conc = jnp.linalg.pinv(stains) @ od.T  # (2, N)
    max_c = jnp.stack(
        [
            _masked_percentile(conc[0], tissue, 99.0),
            _masked_percentile(conc[1], tissue, 99.0),
        ]
    )
    return stains, jnp.maximum(max_c, 1e-6), tissue_frac


@functools.partial(jax.jit, static_argnames=())
def macenko_normalize(
    img_u8,
    stain_ref=None,
    max_conc_ref=None,
    min_tissue_frac: float = 0.05,
):
    """Map an H&E image onto the reference stain basis.

    Images with almost no tissue (< ``min_tissue_frac``) pass through
    unchanged — normalizing white padding is meaningless and numerically
    fragile.

    Args:
        img_u8: (H, W, 3) uint8 RGB.
    Returns:
        (H, W, 3) uint8 stain-normalized RGB.
    """
    ref = (
        jnp.asarray(DEFAULT_STAIN_REF)
        if stain_ref is None
        else jnp.asarray(stain_ref, jnp.float32)
    )
    ref_max = (
        jnp.asarray(DEFAULT_MAX_CONC)
        if max_conc_ref is None
        else jnp.asarray(max_conc_ref, jnp.float32)
    )

    stains, max_c, tissue_frac = macenko_stains(img_u8)
    x = img_u8.reshape(-1, 3).astype(jnp.float32)
    od = -jnp.log(jnp.clip((x + 1.0) / _IO, 1e-6, None))
    conc = jnp.linalg.pinv(stains) @ od.T  # (2, N)
    conc = conc * (ref_max / max_c)[:, None]
    od_norm = (ref @ conc).T  # (N, 3)
    out = jnp.clip(_IO * jnp.exp(-od_norm) - 1.0, 0.0, 255.0)
    out = out.reshape(img_u8.shape).astype(jnp.uint8)
    return jnp.where(tissue_frac >= min_tissue_frac, out, img_u8)


def macenko_normalize_batch(imgs_u8, **kw):
    """vmapped batch version: (B, H, W, 3) uint8 → same."""
    return jax.vmap(lambda im: macenko_normalize(im, **kw))(imgs_u8)

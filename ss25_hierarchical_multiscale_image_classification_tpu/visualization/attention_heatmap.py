"""MIL attention heatmap over a patch image or a slide grid.

Rebuild of ``visualize_attention_heatmap``
(``src/visualization/attention_heatmap.py:7-52``): softmax-normalized
attention, jet colormap, 50/50 blend, two-panel figure — plus a slide-grid
variant that paints per-patch MIL attention back onto the slide layout (the
artifact the reference's unwired version was meant to produce).
"""

from __future__ import annotations

import os

import numpy as np


def _jet(values: np.ndarray) -> np.ndarray:
    import matplotlib.cm as cm

    rgba = cm.jet(np.clip(values, 0.0, 1.0))
    return (rgba[..., :3] * 255).astype(np.uint8)


def visualize_attention_heatmap(
    image: np.ndarray,
    attention: np.ndarray,
    save_path: str | None = None,
    blend: float = 0.5,
) -> np.ndarray:
    """Blend a (H', W') attention map over an (H, W, 3) uint8 image.

    Attention is softmax-normalized if it doesn't already sum to ~1
    (``attention_heatmap.py:14-20``), then min-max scaled for display.
    Returns the blended (H, W, 3) uint8 overlay; optionally writes a
    two-panel PNG (original | overlay).
    """
    from PIL import Image

    attn = np.asarray(attention, np.float64)
    total = attn.sum()
    if not np.isclose(total, 1.0) and total > 0:
        e = np.exp(attn - attn.max())
        attn = e / e.sum()
    rng = attn.max() - attn.min()
    disp = (attn - attn.min()) / rng if rng > 0 else np.zeros_like(attn)

    h, w = image.shape[:2]
    heat = Image.fromarray(_jet(disp)).resize((w, h), Image.BILINEAR)
    overlay = Image.blend(Image.fromarray(image), heat, blend)
    out = np.asarray(overlay)

    if save_path:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(10, 5))
        axes[0].imshow(image)
        axes[0].set_title("Input")
        axes[0].axis("off")
        axes[1].imshow(out)
        axes[1].set_title("Attention overlay")
        axes[1].axis("off")
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return out


def attention_grid_from_bag(
    attention: np.ndarray,
    coords: np.ndarray,
    stride: int,
    grid_shape: tuple[int, int],
) -> np.ndarray:
    """Scatter per-instance MIL attention onto the slide's (ny, nx) grid."""
    out = np.zeros(grid_shape, np.float32)
    for a, (x, y) in zip(attention, coords):
        out[int(y) // stride, int(x) // stride] = float(a)
    return out

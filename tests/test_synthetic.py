

def test_texture_tumor_vanishes_at_level3():
    """tumor_style="texture": zero-mean 4-px checkerboard — mean matches
    normal tissue at EVERY level; the amplitude survives box-downsampling
    to level 2 but cancels exactly at level 3 (2x2 opposite-sign cells).
    The discriminative fixture where only finer magnifications carry the
    lesion signal."""
    import numpy as np

    from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
        make_synthetic_slide,
        tumor_spec,
    )

    spec = tumor_spec(width=1792, height=1344, tissue_radii=(0.45, 0.45),
                      seed=1, tumor_style="texture")
    slide, _polys = make_synthetic_slide(spec)

    def stats(x0, lvl, size=64):
        img = slide.read_region((x0, 600), lvl, (size, size)).astype(
            np.float32
        )
        inner = img[8:-8, 8:-8]
        return inner.mean(axis=(0, 1)), float(inner.std())

    for lvl in (2, 3):
        t_mean, t_std = stats(780, lvl)   # tumor interior
        n_mean, n_std = stats(300, lvl)   # normal tissue
        # mean color indistinguishable at every level
        np.testing.assert_allclose(t_mean, n_mean, atol=3.0)
        ratio = t_std / n_std
        if lvl == 2:
            assert ratio > 1.2, f"L2 texture signal missing: {ratio}"
        else:
            assert ratio < 1.08, f"L3 texture should cancel: {ratio}"

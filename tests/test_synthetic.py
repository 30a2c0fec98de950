

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


def test_texture_signal_survives_crop_but_not_resize_pipelines():
    """Pin the input-mode physics behind docs/proofs/froc_hard_report.json.

    At level 2 the texture lesion is a 1-px checkerboard (each L2 pixel
    averages one aligned 4x4 L0 cell). The constant-footprint pipeline
    stores fine patches at 448 and resizes to 224 for the model — the
    reference's design (``src/main.py:417-425`` resizes everything to
    224) — and that 2x box filter cancels the checkerboard EXACTLY, the
    same arithmetic as pyramid level 3. So the single-level L2 producer
    and ``--ms_input resize`` are blind by construction; only
    ``--ms_input crop`` (the fine stream at native magnification) keeps
    the signal. Assert all three at the real pipeline functions."""
    import numpy as np

    from ss25_hierarchical_multiscale_image_classification_tpu.data.patch_store import (
        _resize,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
        SyntheticSlideSpec,
        make_synthetic_slide,
    )

    # lesion spanning (0.2..0.8) of a 4480-px slide = 2688 L0 px — big
    # enough to contain a full fine-level store patch (448 L2 px = 1792
    # L0 px footprint, PATCH_SIZES[2])
    spec = SyntheticSlideSpec(
        width=4480, height=3360, tissue_radii=(0.48, 0.48), seed=1,
        tumor_style="texture",
        tumor_polygons=(((0.2, 0.2), (0.8, 0.2), (0.8, 0.8), (0.2, 0.8)),),
    )
    slide, _polys = make_synthetic_slide(spec)
    # a 448-px level-2 window wholly inside the tumor (read_region takes
    # level-0 coords): what the patch store holds for the fine level
    patch = np.asarray(
        slide.read_region((1344, 900), 2, (448, 448)), np.uint8
    )

    def energy(img):  # adjacent-pixel energy: the checkerboard carrier
        f = img.astype(np.float32)
        return float(np.abs(np.diff(f, axis=1)).mean())

    native = energy(patch)
    # the store/loader resize every non-224 patch via cv2 INTER_AREA —
    # the single-level L2 training/inference input
    resized = energy(_resize(patch, 224))
    # the multiscale crop fine stream: center 224 at native magnification
    # (same slice as infer/multiscale.make_prob_step_multiscale)
    off = (448 - 224) // 2
    cropped = energy(patch[off:off + 224, off:off + 224])

    assert native > 10.0, f"fixture lost its native signal: {native}"
    assert cropped > 0.8 * native, (cropped, native)
    assert resized < 0.15 * native, (
        f"448→224 resize should cancel the checkerboard: {resized} vs "
        f"native {native}"
    )

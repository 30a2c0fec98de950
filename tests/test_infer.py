"""Inference: feature extraction, sliding-window heatmaps, overlays."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ss25_hierarchical_multiscale_image_classification_tpu.config import DataConfig
from ss25_hierarchical_multiscale_image_classification_tpu.data import extract_patches
from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (
    PatchDataset,
)
from ss25_hierarchical_multiscale_image_classification_tpu.infer.features import (
    run_feature_extraction,
)
from ss25_hierarchical_multiscale_image_classification_tpu.infer.overlay import (
    render_overlay,
)
from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
    nms_detections,
    predict_slide,
    write_detection_csv,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models import (
    ResNet18Classifier,
    ResNet18FeatureExtractor,
)


@pytest.fixture(scope="module")
def small_classifier():
    model = ResNet18Classifier(dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    return model, {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }


def test_run_feature_extraction(synthetic_case):
    data = DataConfig(data_dir=synthetic_case)
    manifest = extract_patches(data, level=2, stride=112, store_format="packed")
    ds = PatchDataset(manifest, resize_to=64)

    fx = ResNet18FeatureExtractor(dtype=jnp.float32)
    variables = fx.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    feats, labels, names = run_feature_extraction(
        ds, dict(variables), batch_size=8, dtype=jnp.float32
    )
    assert feats.shape == (len(ds), 512)
    assert feats.dtype == np.float32
    assert len(labels) == len(ds) and len(names) == len(ds)
    assert names[0].endswith(".png")  # reference naming convention
    assert np.isfinite(feats).all()


def test_predict_slide_grid(synthetic_case, small_classifier):
    model, variables = small_classifier
    slide_path = os.path.join(synthetic_case, "train", "img", "tumor_001.wsi.npz")
    probs, grid = predict_slide(
        slide_path, variables, level=3, batch_size=8, model=model, input_size=64
    )
    assert probs.shape == (grid.ny, grid.nx)
    assert (probs >= 0).all() and (probs <= 1).all()
    # the synthetic slide has central tissue → at least one nonzero cell
    assert probs.max() > 0.0


def test_predict_slide_device_tissue_filter_matches_host(
    synthetic_case, small_classifier
):
    """tissue_filter='device' (fused normalize+statistic Pallas kernel,
    white-patch short-circuit on device) reproduces the host-filter grid:
    same tissue/background partition, same margins on tissue cells."""
    model, variables = small_classifier
    slide_path = os.path.join(
        synthetic_case, "train", "img", "tumor_001.wsi.npz"
    )
    kw = dict(level=3, batch_size=8, model=model, input_size=64,
              output="margin")
    host, grid = predict_slide(slide_path, variables, **kw)
    dev, _ = predict_slide(
        slide_path, variables, tissue_filter="device", **kw
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        NON_TISSUE_MARGIN,
    )

    np.testing.assert_array_equal(
        host == NON_TISSUE_MARGIN, dev == NON_TISSUE_MARGIN
    )
    tissue = host != NON_TISSUE_MARGIN
    assert tissue.any()
    np.testing.assert_allclose(dev[tissue], host[tissue], rtol=1e-4,
                               atol=1e-4)

    # guarded invalid combinations
    with pytest.raises(ValueError):
        predict_slide(slide_path, variables, tissue_filter="device",
                      int8=True, **{k: v for k, v in kw.items()
                                    if k != "output"})
    with pytest.raises(ValueError):
        predict_slide(slide_path, variables, tissue_filter="nowhere", **kw)


def test_nms_and_csv(tmp_path):
    from ss25_hierarchical_multiscale_image_classification_tpu.grid.pyramid import (
        PatchGrid,
    )

    grid = PatchGrid(level=3, width=896, height=896, downsample=8.0,
                     patch_size=224, stride=224)
    probs = np.zeros((4, 4), np.float32)
    probs[1, 2] = 0.9
    probs[1, 3] = 0.8  # adjacent → suppressed
    probs[3, 0] = 0.6
    dets = nms_detections(probs, grid, threshold=0.5, radius_cells=1,
                          com_radius=0)
    assert len(dets) == 2
    p0, x0, y0 = dets[0]
    assert p0 == pytest.approx(0.9)
    # center of cell (gx=2, gy=1) at level 0: ((2*224+112)*8, (1*224+112)*8)
    assert (x0, y0) == ((2 * 224 + 112) * 8, (1 * 224 + 112) * 8)

    csv_path = str(tmp_path / "out" / "case.csv")
    write_detection_csv(csv_path, dets)
    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation import (
        read_csv_content,
    )

    probs_r, xs, ys = read_csv_content(csv_path)
    assert probs_r[0] == pytest.approx(0.9) and xs[0] == x0 and ys[0] == y0


def test_margin_scores_never_tie_where_softmax_saturates():
    """The FROC consumer ranks detections by the emitted score, so two
    cells with distinct logit margins must emit distinct scores even deep
    in softmax saturation (float32 softmax ties everything past margin
    ~17 at exactly 1.0 — the round-3 multiscale FROC collapse).
    Softsign scores stay distinct, keep the margin's ordering, and cross
    0.5 exactly at margin 0."""
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        margin_detections,
        margin_to_score,
        prob_to_margin,
        sigmoid,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.grid.pyramid import (
        PatchGrid,
    )

    margins = np.array([20.0, 25.0, 80.0, 300.0], np.float32)
    # float32 softmax saturates: probabilities all tie at exactly 1.0
    assert len(set(sigmoid(margins).tolist())) == 1
    scores = margin_to_score(margins)
    assert len(set(scores.tolist())) == len(margins)  # no ties
    assert (np.diff(scores) > 0).all()  # order preserved
    assert margin_to_score(0.0) == 0.5  # same emission set as p>0.5
    assert abs(prob_to_margin(0.5)) < 1e-12

    # end to end through NMS: a grid of saturated cells emits strictly
    # decreasing, untied CSV scores
    grid = PatchGrid(level=3, width=896, height=896, downsample=8.0,
                     patch_size=224, stride=224)
    mg = np.full((4, 4), -1.0e4, np.float32)
    mg[0, 0], mg[0, 3], mg[3, 0], mg[3, 3] = 300.0, 80.0, 25.0, 20.0
    dets = margin_detections(mg, grid, threshold=0.05)
    probs = [p for p, _x, _y in dets]
    assert len(probs) == 4
    assert probs == sorted(probs, reverse=True)
    assert len(set(probs)) == 4


def test_nms_centroid_localization():
    """The default localization refines a peak's reported coordinate to the
    tumor-mass centroid of its window: an off-center plateau (a lesion
    smaller than one patch footprint straddling cell boundaries) pulls the
    coordinate toward the plateau, not the quantized argmax center. Cells
    at or below the decision boundary carry no weight, and a distinct blob
    across a below-boundary gap is excluded by the connected-component
    restriction even inside the window."""
    from ss25_hierarchical_multiscale_image_classification_tpu.grid.pyramid import (
        PatchGrid,
    )

    grid = PatchGrid(level=3, width=3584, height=3584, downsample=8.0,
                     patch_size=224, stride=56)
    probs = np.zeros((8, 8), np.float32)
    # plateau: peak at (2,2), equal-strength neighbor mass to the right;
    # (2,4) sits below the decision boundary → no weight, no emission
    probs[2, 2] = 0.9
    probs[2, 3] = 0.9
    probs[2, 4] = 0.45
    dets = nms_detections(probs, grid, threshold=0.5, radius_cells=1)
    assert len(dets) == 1
    p, x0, y0 = dets[0]
    assert p == pytest.approx(0.9)
    # centroid cx = (2*0.4 + 3*0.4) / 0.8 = 2.5 cells; y stays 2
    assert x0 == int((2.5 * 56 + 112) * 8)
    assert y0 == (2 * 56 + 112) * 8
    # argmax mode reports the raw peak center
    (_, xa, ya), = nms_detections(
        probs, grid, threshold=0.5, radius_cells=1, com_radius=0
    )
    assert (xa, ya) == ((2 * 56 + 112) * 8, (2 * 56 + 112) * 8)

    # a second blob inside the window but across a below-boundary gap
    # must not drag the first detection's centroid (nor vice versa)
    probs = np.zeros((8, 8), np.float32)
    probs[2, 2] = 0.9
    probs[2, 4] = 0.8  # gap at (2,3): weight 0 → separate component
    dets = nms_detections(probs, grid, threshold=0.5, radius_cells=1)
    assert len(dets) == 2
    (_, x1, _y1), (_, x2, _y2) = dets
    assert x1 == (2 * 56 + 112) * 8  # unmoved
    assert x2 == (4 * 56 + 112) * 8  # unmoved


def test_render_overlay(synthetic_case, tmp_path):
    slide_path = os.path.join(synthetic_case, "train", "img", "tumor_001.wsi.npz")
    probs = np.random.default_rng(0).random((4, 4)).astype(np.float32)
    out = render_overlay(
        slide_path, probs, save_path=str(tmp_path / "overlay.png")
    )
    assert out.ndim == 3 and out.shape[2] == 3
    assert os.path.exists(tmp_path / "overlay.png")


def test_full_froc_producer_consumer_loop(synthetic_case, small_classifier, tmp_path):
    """End-to-end: sliding-window producer → detection CSV → FROC consumer."""
    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.froc import (
        run_froc_evaluation,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.grid.rasterize import (
        polygons_to_mask,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        predict_and_export,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io.annotations import (
        parse_annotation_xml,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io.slide import (
        open_slide,
    )

    model, variables = small_classifier
    slide_path = os.path.join(synthetic_case, "train", "img", "tumor_001.wsi.npz")
    csv_dir = str(tmp_path / "csv")
    _probs, csv_path = predict_and_export(
        slide_path, variables, csv_dir, level=3, threshold=0.0,
        batch_size=8, model=model, input_size=64,
    )
    assert os.path.exists(csv_path)

    # ground-truth mask at eval level 3 (synthetic slide only has 4 levels)
    mask_dir = str(tmp_path / "masks")
    os.makedirs(mask_dir)
    slide = open_slide(slide_path)
    polys = parse_annotation_xml(
        os.path.join(synthetic_case, "annotations", "tumor_001.xml")
    )
    mask = polygons_to_mask(
        polys, slide.level_dimensions[3], slide.level_dimensions[0]
    )
    np.save(os.path.join(mask_dir, "tumor_001_mask.npy"), mask)

    result = run_froc_evaluation(csv_dir, mask_dir, level=3)
    assert result["names"] == ["tumor_001"]
    assert result["num_tumors"][0] >= 0
    assert "score" in result


def test_predict_slide_grid_orientation(small_classifier):
    """Probability cells land at their true grid positions: tissue confined
    to one known cell must light up exactly that cell (catches any
    flat-index / scatter-order mismatch in the banded decode pipeline)."""
    from ss25_hierarchical_multiscale_image_classification_tpu.io.slide import (
        ArraySlide,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
        build_pyramid,
    )

    model, variables = small_classifier

    # horizontal: level-3 plane is 448x224 → 2x1 grid; tissue only right
    l0 = np.full((1792, 3584, 3), 255, np.uint8)
    l0[:, 1792:] = 120
    probs, grid = predict_slide(
        ArraySlide(build_pyramid(l0, 4)), variables, level=3, batch_size=4,
        model=model, input_size=64,
    )
    assert probs.shape == (1, 2)
    assert probs[0, 0] == 0.0 and probs[0, 1] > 0.0

    # vertical: 224x448 plane → 1x2 grid; tissue only bottom
    l0 = np.full((3584, 1792, 3), 255, np.uint8)
    l0[1792:, :] = 120
    probs, grid = predict_slide(
        ArraySlide(build_pyramid(l0, 4)), variables, level=3, batch_size=4,
        model=model, input_size=64,
    )
    assert probs.shape == (2, 1)
    assert probs[0, 0] == 0.0 and probs[1, 0] > 0.0


def test_render_overlay_strided_alignment(synthetic_case, tmp_path):
    """With an overlapping grid (stride < patch) the heat must align to
    WINDOW CENTERS, not top-left grid corners: a single hot cell whose
    window covers a known region puts the peak at that window's center."""
    from ss25_hierarchical_multiscale_image_classification_tpu.grid.pyramid import (
        patch_size_for_level,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io.slide import (
        open_slide,
    )

    slide_path = os.path.join(
        synthetic_case, "train", "img", "tumor_001.wsi.npz"
    )
    level, stride = 3, 28
    ps = patch_size_for_level(level)
    slide = open_slide(slide_path)
    w, h = slide.level_dimensions[level]
    slide.close()
    ny, nx = -(-h // stride), -(-w // stride)
    probs = np.zeros((ny, nx), np.float32)
    iy, ix = 1, 2
    probs[iy, ix] = 1.0

    out = render_overlay(
        slide_path, probs, display_level=level,
        predict_level=level, stride=stride,
    )
    # red channel dominance marks the hot area; its centroid should sit
    # at the window center (ix*stride + ps/2, iy*stride + ps/2)
    heatness = out[:, :, 0].astype(np.int32) - out[:, :, 2].astype(np.int32)
    ys, xs = np.nonzero(heatness > heatness.max() * 0.8)
    cx, cy = xs.mean(), ys.mean()
    ex, ey = ix * stride + ps / 2, iy * stride + ps / 2
    # generous tolerance: bilinear smoothing + clipping at image borders
    assert abs(cx - min(ex, w - 1)) < ps / 3, (cx, ex)
    assert abs(cy - min(ey, h - 1)) < ps / 3, (cy, ey)


def test_centroid_localization_hits_sub_footprint_lesion():
    """Regression for the round-3 FROC cap: a lesion smaller than one
    patch footprint whose response plateau peaks at a cell center OUTSIDE
    the lesion outline. The official hit test uses only the reported
    point (evaluation_FROC.py:134 semantics), so argmax localization
    misses the lesion entirely while the tumor-mass centroid lands
    inside it."""
    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.froc import (
        compute_fp_tp_probs,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.grid.pyramid import (
        PatchGrid,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        nms_detections,
    )

    # stride-56 level-3 grid (downsample 8): cell centers 448 L0 px apart
    grid = PatchGrid(level=3, width=1792, height=1792, downsample=8.0,
                     patch_size=224, stride=56)
    # evaluation mask at level 5 (L0/32): a ~30x30-px lesion BETWEEN two
    # cell centers — every overlapping patch fires, peak center outside
    em = np.zeros((56, 56), np.uint8)
    probs = np.zeros((grid.ny, grid.nx), np.float32)
    em[:, :] = 0
    # cell centers map to eval coords 14*g + 28 (g = grid index): 28, 42,
    # 56, ... — the lesion x-range [33,38) sits in the INTER-CENTER GAP,
    # so no cell center is inside the outline; its y-range contains the
    # g=0 row of centers (eval y 28)
    em[26:31, 33:38] = 1
    probs[0, 0] = 0.93   # strongest response: center eval (28, 28)
    probs[0, 1] = 0.91   # center eval (42, 28)
    dets_argmax = nms_detections(probs, grid, threshold=0.5,
                                 radius_cells=1, com_radius=0)
    dets_com = nms_detections(probs, grid, threshold=0.5, radius_cells=1)

    def froc_hits(dets):
        ps = [d[0] for d in dets]
        xs = [d[1] for d in dets]
        ys = [d[2] for d in dets]
        _fp, tp, n, _, _ = compute_fp_tp_probs(
            ys, xs, ps, True, em, [], level=5
        )
        return float(np.max(tp)) if len(tp) else 0.0

    assert froc_hits(dets_argmax) == 0.0  # argmax center never inside
    assert froc_hits(dets_com) > 0.0      # centroid lands in the outline


def test_nms_centroid_zero_weight_peak_keeps_argmax_center():
    """A peak emitted below the decision boundary (emission floor <
    p <= 0.5) has zero localization weight of its own; its reported point
    must stay at the argmax center rather than be dragged by a stronger
    neighboring lesion's residual mass inside the window."""
    from ss25_hierarchical_multiscale_image_classification_tpu.grid.pyramid import (
        PatchGrid,
    )

    grid = PatchGrid(level=3, width=3584, height=3584, downsample=8.0,
                     patch_size=224, stride=56)
    probs = np.zeros((8, 8), np.float32)
    probs[2, 2] = 0.9   # strong lesion: detected first, suppressed r=1
    probs[2, 4] = 0.4   # weak second lesion, below the 0.5 boundary
    dets = nms_detections(probs, grid, threshold=0.1, radius_cells=1)
    assert len(dets) == 2
    (_, x1, _), (p2, x2, y2) = dets
    assert p2 == pytest.approx(0.4)
    # unmoved: (2,2)'s weight survives suppression by design, but must
    # not pull the zero-weight peak's coordinate
    assert (x2, y2) == ((4 * 56 + 112) * 8, (2 * 56 + 112) * 8)

"""FROC pinned to hand-computed golden vectors (VERDICT round-1 next #6).

Property tests can miss off-by-ones in the clinical-spec constants; these
cases are small enough that every number below was derived by hand from the
official algorithm (``src/utils/evaluation_FROC.py:14-205`` semantics at
resolution 0.243 µm/px, level 5):

- annotation expansion threshold = 75 / (0.243 * 32 * 2) = 4.82253... px
- ITC major-axis threshold       = 275 / (0.243 * 32)    = 35.3652... px
"""

import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.froc import (
    _major_axis_length,
    compute_evaluation_mask,
    compute_fp_tp_probs,
    compute_froc,
    compute_itc_list,
    froc_score,
)

RES, LEVEL = 0.243, 5
SCALE = 2 ** LEVEL  # 32


def _golden_mask():
    """64x64 mask: a 40px strip (macro-metastasis) + an isolated pixel
    (ITC after expansion: a discrete disc of radius < 4.82253 px)."""
    mask = np.zeros((64, 64), np.uint8)
    mask[5, 5:45] = 255  # strip, length 40
    mask[40, 40] = 255  # isolated tumor cell
    return mask


def test_evaluation_mask_golden():
    ev = compute_evaluation_mask(_golden_mask(), RES, LEVEL)
    # exactly two components, labeled in raster order: strip first
    assert ev.max() == 2
    assert ev[5, 25] == 1 and ev[40, 40] == 2

    # the isolated pixel expands to the lattice disc {d^2 <= 23}: by direct
    # count 9 + 2*(9+9+7+5) = 69 pixels (threshold 4.82253 => d^2 < 23.256)
    assert int((ev == 2).sum()) == 69

    # strip expansion: rows within 4 px (distance < 4.82253) of row 5,
    # columns 5..44 widen likewise; spot-pin the extremes:
    assert ev[1, 25] == 1 and ev[9, 25] == 1  # |dy| = 4 -> inside
    assert ev[10, 25] == 0  # |dy| = 5 -> outside
    assert ev[5, 1] == 1 and ev[5, 48] == 1  # |dx| = 4 beyond strip ends
    assert ev[5, 49] == 0
    assert ev[8, 2] == 1  # corner (dy=3, dx=3): sqrt(18) = 4.243 < 4.823
    assert ev[9, 2] == 0  # corner (dy=4, dx=3): 5.0 > 4.823


def test_major_axis_length_golden():
    # 3 collinear pixels: mu_major = 2/3 + 1/12 = 0.75 -> 4*sqrt(0.75)
    coords = np.array([[0.0, 0.0], [0.0, 1.0], [0.0, 2.0]])
    assert np.isclose(_major_axis_length(coords), 4 * np.sqrt(0.75))
    # single pixel: 4*sqrt(1/12)
    assert np.isclose(
        _major_axis_length(np.array([[3.0, 7.0]])), 4 * np.sqrt(1 / 12)
    )


def test_itc_list_golden():
    ev = compute_evaluation_mask(_golden_mask(), RES, LEVEL)
    # strip region: length ~48 px expanded -> major axis > 35.365 (macro)
    # disc region: diameter ~9.6 px -> ITC
    assert compute_itc_list(ev, RES, LEVEL) == [2]


def test_fp_tp_probs_golden():
    ev = compute_evaluation_mask(_golden_mask(), RES, LEVEL)
    itc = compute_itc_list(ev, RES, LEVEL)
    # detections in level-0 coords (mask hit at coord // 32):
    probs = [0.9, 0.8, 0.7, 0.6]
    xs = [10 * SCALE, 40 * SCALE, 60 * SCALE + 5, 12 * SCALE]
    ys = [5 * SCALE, 40 * SCALE, 60 * SCALE, 5 * SCALE]
    fp, tp, n_tumors, det, fps = compute_fp_tp_probs(
        ys, xs, probs, True, ev, itc, LEVEL
    )
    assert fp == [0.7]  # the background hit
    np.testing.assert_allclose(tp, [0.9, 0.0], rtol=1e-6)  # strip hit; ITC slot unused
    assert n_tumors == 1  # 2 labels - 1 ITC
    assert det["Label 1"] == [0.9, 320, 160]  # highest-prob hit kept
    assert fps["FP 0"] == [0.7, 60 * SCALE + 5, 60 * SCALE]


def test_fp_tp_probs_normal_case_golden():
    fp, tp, n, det, fps = compute_fp_tp_probs(
        [10, 20], [30, 40], [0.4, 0.2], False, None, [], LEVEL
    )
    assert fp == [0.4, 0.2] and len(tp) == 0 and n == 0 and det == {}


def test_froc_curve_golden():
    """Two images: tumor (fp .7 / tp .9 / 1 tumor) + normal (fps .3, .8).

    sorted probs {.3,.7,.8,.9} -> thresholds [.7,.8,.9] then the (0,0) end:
      t=.7: fps>= -> 2, tps>= -> 1
      t=.8: fps>= -> 1, tps>= -> 1
      t=.9: fps>= -> 0, tps>= -> 1
    """
    data = {
        "fp_probs": [[0.7], [0.3, 0.8]],
        "tp_probs": [np.array([0.9]), np.zeros((0,))],
        "num_tumors": [1, 0],
    }
    fps, sens = compute_froc(data)
    np.testing.assert_allclose(fps, [1.0, 0.5, 0.0, 0.0])
    np.testing.assert_allclose(sens, [1.0, 1.0, 1.0, 0.0])
    assert froc_score(fps, sens) == 1.0


def test_froc_score_golden_partial():
    # sensitivity 0.5 below 1 FP/image, 1.0 at 2+ FPs/image:
    fps = np.array([4.0, 2.0, 0.5, 0.0])
    sens = np.array([1.0, 1.0, 0.5, 0.5])
    # fp operating points (.25,.5,1,2,4,8) -> (.5,.5,.5,1,1,1) -> mean 0.75
    assert froc_score(fps, sens) == 0.75

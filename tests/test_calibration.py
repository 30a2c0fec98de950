"""Temperature scaling + ensemble-weight selection (evaluation/calibration)."""

import numpy as np
import pytest

from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.calibration import (
    fit_temperature,
    pick_ensemble_weight,
    roc_auc,
)


def _synthetic_logits(rng, n=2000, scale=4.0, sep=1.5):
    """Binary logits that are overconfident by ``scale``: the log-odds are
    ``scale *`` the Bayes-calibrated ones, so the NLL-optimal T ≈ scale."""
    labels = rng.integers(0, 2, n)
    margin = sep * (2 * labels - 1) + rng.normal(0, sep, n)
    logits = np.stack([np.zeros(n), margin * scale], axis=1)
    return logits, labels


def test_fit_temperature_recovers_overconfidence():
    rng = np.random.default_rng(0)
    logits, labels = _synthetic_logits(rng, scale=4.0)
    t = fit_temperature(logits, labels)
    assert 2.0 < t < 8.0  # pulls the x4 overconfidence back toward 1
    # NLL at the fitted T beats T=1
    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.calibration import (
        _nll,
    )

    assert _nll(logits, labels, t) < _nll(logits, labels, 1.0)


def test_fit_temperature_degenerate_returns_identity():
    assert fit_temperature(np.zeros((1, 2)), np.array([1])) == 1.0
    assert fit_temperature(np.zeros((5, 2)), np.ones(5, int)) == 1.0


def test_temperature_is_monotone():
    """Scaling preserves ranking: the FROC curve shape only changes through
    the emission threshold, which is the point of calibrating."""
    rng = np.random.default_rng(1)
    logits, labels = _synthetic_logits(rng, n=500)
    t = fit_temperature(logits, labels)

    def p(z, temp):
        z = z / temp
        e = np.exp(z - z.max(axis=1, keepdims=True))
        return (e / e.sum(axis=1, keepdims=True))[:, 1]

    order1 = np.argsort(p(logits, 1.0), kind="stable")
    order2 = np.argsort(p(logits, t), kind="stable")
    np.testing.assert_array_equal(order1, order2)


def test_roc_auc_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(2)
    labels = rng.integers(0, 2, 300)
    scores = rng.normal(0, 1, 300) + labels  # informative
    assert roc_auc(scores, labels) == pytest.approx(
        roc_auc_score(labels, scores), abs=1e-9
    )
    # ties handled (midranks)
    scores_q = np.round(scores * 2) / 2
    assert roc_auc(scores_q, labels) == pytest.approx(
        roc_auc_score(labels, scores_q), abs=1e-9
    )


def test_roc_auc_degenerate():
    assert roc_auc(np.array([0.1, 0.9]), np.array([1, 1])) == 0.5


def test_pick_ensemble_weight_prefers_better_head():
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 2, 1000)
    # informative but imperfect, so AUC varies smoothly with w and the
    # search has a real optimum (a separable head ties at AUC=1 for many w)
    good = labels + rng.normal(0, 0.8, 1000)
    noise = rng.uniform(size=1000)
    w, auc = pick_ensemble_weight(good, noise, labels)
    assert w >= 0.75  # leans (almost) fully onto the informative head
    w2, _ = pick_ensemble_weight(noise, good, labels)
    assert w2 <= 0.25
    assert auc > 0.7


def test_pick_ensemble_weight_averages_identical_heads():
    rng = np.random.default_rng(4)
    labels = rng.integers(0, 2, 400)
    p = 0.7 * labels + 0.3 * rng.uniform(size=400)
    w, _ = pick_ensemble_weight(p, p, labels)
    assert w == pytest.approx(0.5)  # tie prefers the variance-reducing mean


def test_patch_froc_proxy_perfect_and_random():
    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.calibration import (
        patch_froc_proxy,
    )

    rng = np.random.default_rng(5)
    labels = np.array([1] * 50 + [0] * 450)
    slides = np.array([f"s{i % 10}" for i in range(500)])
    perfect = labels + rng.uniform(0, 0.1, 500)
    assert patch_froc_proxy(perfect, labels, slides) == 1.0
    random = rng.normal(0, 1, 500)
    assert patch_froc_proxy(random, labels, slides) < 0.5
    # all-negative degenerate
    assert patch_froc_proxy(random, np.zeros(500, int), slides) == 0.0


def test_patch_froc_proxy_punishes_high_ranking_negatives():
    """A score whose negatives have a heavy right tail loses the proxy even
    when its bulk separation (AUC) is better — the failure mode pooled-AUC
    selection shipped in round 3's second multiscale run."""
    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.calibration import (
        patch_froc_proxy,
    )

    rng = np.random.default_rng(6)
    n_pos, n_neg = 200, 2000
    labels = np.array([1] * n_pos + [0] * n_neg)
    slides = np.array([f"s{i % 8}" for i in range(n_pos + n_neg)])
    # clean: moderate separation, well-behaved tail
    clean = np.concatenate(
        [rng.normal(1.5, 1.0, n_pos), rng.normal(0, 1.0, n_neg)]
    )
    # tailed: better bulk separation, but 3% of negatives score above
    # nearly every positive
    neg = rng.normal(0, 0.6, n_neg)
    outliers = rng.choice(n_neg, n_neg * 3 // 100, replace=False)
    neg[outliers] = rng.normal(6.0, 0.2, len(outliers))
    tailed = np.concatenate([rng.normal(2.2, 0.6, n_pos), neg])
    assert roc_auc(tailed, labels) > roc_auc(clean, labels)
    assert patch_froc_proxy(clean, labels, slides) > patch_froc_proxy(
        tailed, labels, slides
    )


def test_pick_combine_mode_selects_detection_grade_winner():
    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.calibration import (
        pick_combine_mode,
    )

    rng = np.random.default_rng(7)
    n_pos, n_neg = 200, 2000
    labels = np.array([1] * n_pos + [0] * n_neg)
    slides = np.array([f"s{i % 8}" for i in range(n_pos + n_neg)])
    m_fusion = np.concatenate(
        [rng.normal(2.0, 1.0, n_pos), rng.normal(0, 1.0, n_neg)]
    )
    neg = rng.normal(0, 0.6, n_neg)
    outliers = rng.choice(n_neg, n_neg * 3 // 100, replace=False)
    neg[outliers] = rng.normal(6.0, 0.2, len(outliers))
    m_aux = np.concatenate([rng.normal(2.2, 0.6, n_pos), neg])
    mode, weights, proxies = pick_combine_mode(m_fusion, m_aux, labels, slides)
    assert set(proxies) == {"fusion", "ensemble", "aux"}
    assert proxies["fusion"] > proxies["aux"]
    # whatever wins, the shipped mode must attain the max proxy
    assert proxies[mode] == max(proxies.values())
    assert 0.0 <= weights["ensemble_weight"] <= 1.0
    # and aux must never be selected here
    assert mode != "aux"


def test_pick_combine_mode_identical_heads_prefer_fusion():
    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.calibration import (
        pick_combine_mode,
    )

    rng = np.random.default_rng(8)
    labels = rng.integers(0, 2, 400)
    slides = np.array([f"s{i % 4}" for i in range(400)])
    m = rng.normal(0, 1, 400) + 2.0 * labels
    mode, _, _ = pick_combine_mode(m, m.copy(), labels, slides)
    assert mode == "fusion"


def test_pick_combine_mode_aux_base_candidates():
    """With ``m_aux_base`` given, the base grid level's aux head and the
    fusion×aux-base mixture join the candidate set; a strictly better
    aux-base surface must be selected, and its mixture weight fitted."""
    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.calibration import (
        pick_combine_mode,
    )

    rng = np.random.default_rng(9)
    n_pos, n_neg = 200, 2000
    labels = np.array([1] * n_pos + [0] * n_neg)
    slides = np.array([f"s{i % 8}" for i in range(n_pos + n_neg)])
    m_fusion = np.concatenate(
        [rng.normal(1.0, 1.2, n_pos), rng.normal(0, 1.0, n_neg)]
    )
    m_aux = np.concatenate(
        [rng.normal(0.5, 1.5, n_pos), rng.normal(0, 1.2, n_neg)]
    )
    # aux_base separates near-perfectly in the low-FP regime
    m_base = np.concatenate(
        [rng.normal(5.0, 0.5, n_pos), rng.normal(0, 0.5, n_neg)]
    )
    mode, weights, proxies = pick_combine_mode(
        m_fusion, m_aux, labels, slides, m_aux_base=m_base
    )
    assert set(proxies) == {
        "fusion", "ensemble", "aux", "aux_base", "ensemble_base"
    }
    assert mode in ("aux_base", "ensemble_base")
    assert proxies[mode] == max(proxies.values())
    assert 0.0 <= weights["ensemble_base_weight"] <= 1.0


def test_fit_cascade_margin_informative_screen_keeps_all_tumors():
    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.calibration import (
        fit_cascade_margin,
    )

    rng = np.random.default_rng(0)
    labels = np.array([0] * 200 + [1] * 50)
    # separable screen: normals around -2, tumors around +2
    m = np.concatenate([rng.normal(-2, 0.5, 200), rng.normal(2, 0.5, 50)])
    floor = fit_cascade_margin(m, labels)
    assert floor is not None
    # the fitted floor keeps EVERY validation tumor cell
    assert (m[labels == 1] >= floor).all()
    # and actually screens something out
    assert (m[labels == 0] < floor).any()


def test_fit_cascade_margin_blind_screen_ships_no_operating_point():
    """A screen with no discriminative power on val (the texture-lesion
    scenario, scripts/froc_hard_proof.py: the base magnification cancels
    the lesion signal) must NOT ship a floor — any floor fitted to it
    screens out test tumors at whatever rate it screens tissue."""
    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.calibration import (
        fit_cascade_margin,
    )

    rng = np.random.default_rng(1)
    labels = np.array([0] * 200 + [1] * 50)
    m = rng.normal(0, 1, 250)  # identical distributions: AUC ~ 0.5
    assert fit_cascade_margin(m, labels) is None


def test_fit_cascade_margin_degenerate_val():
    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.calibration import (
        fit_cascade_margin,
    )

    m = np.linspace(-1, 1, 10)
    assert fit_cascade_margin(m, np.zeros(10, int)) is None  # no tumors
    assert fit_cascade_margin(m, np.ones(10, int)) is None  # no normals


def test_fit_cascade_margin_lesion_level_ignores_one_weak_cell():
    """A lesion survives the screen if ANY of its cells survives (the FROC
    hit test's semantics) — one deep-negative cell inside an otherwise
    strong lesion must not collapse the floor to keep-everything."""
    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.calibration import (
        fit_cascade_margin,
    )

    rng = np.random.default_rng(2)
    n_norm = 200
    m_norm = rng.normal(-2, 0.5, n_norm)
    # two lesions on two slides: 3 adjacent cells each, one cell of
    # lesion A sits deep on the normal side
    m_tum = np.array([3.0, 2.5, -3.5, 2.8, 3.2, 2.9])
    slides = np.array(
        ["n"] * n_norm + ["s1", "s1", "s1", "s2", "s2", "s2"]
    )
    cells = np.array(
        [[i * 100.0, 0.0] for i in range(n_norm)]
        + [[0, 0], [100, 0], [200, 0], [0, 0], [100, 0], [0, 100]],
        np.float64,
    )
    m = np.concatenate([m_norm, m_tum])
    labels = np.array([0] * n_norm + [1] * 6)

    cell_floor = fit_cascade_margin(m, labels)
    lesion_floor = fit_cascade_margin(m, labels, slides=slides, cells=cells)
    # the cell-level floor is dragged below the -3.5 outlier cell — a
    # keep-everything floor that screens ~0% of val normals, which the
    # min-screen-rate gate refuses to ship (the screen can't repay its
    # own pass); without the gate it would have been < -3.5
    assert cell_floor is None
    assert fit_cascade_margin(m, labels, min_screen_rate=0.0) < -3.5
    assert lesion_floor is not None
    # lesion-level floor sits just under the weakest lesion's BEST cell
    # (min over lesions of max cell margin = min(3.0, 3.2) = 3.0)
    assert 2.0 < lesion_floor < 3.0
    # every lesion keeps at least one cell above the floor
    for sl in ("s1", "s2"):
        assert (m[(slides == sl)] >= lesion_floor).any()


def test_lesion_groups_clusters_by_slide_and_adjacency():
    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.calibration import (
        _lesion_groups,
    )

    slides = np.array(["a", "a", "a", "a", "b"])
    cells = np.array(
        [[0, 0], [100, 0], [500, 500], [600, 500], [0, 0]], np.float64
    )
    g = _lesion_groups(slides, cells)
    assert g[0] == g[1]          # adjacent on slide a
    assert g[2] == g[3]          # adjacent on slide a, far from the first
    assert g[0] != g[2]          # distinct lesions
    assert g[4] not in (g[0], g[2])  # other slide never joins

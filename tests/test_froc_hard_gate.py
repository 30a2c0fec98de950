"""Regression gate over the committed hard-texture FROC proof artifact
(``docs/proofs/froc_hard_report.json``, regenerated on-TPU by
``scripts/froc_hard_proof.py``).

The 48-slide e2e proof saturates at FROC 1.0 for every producer, so it
can no longer catch a quality regression in quantization, SSL init, or
the multiscale hierarchy itself. The texture fixture separates them by
construction (``io/synthetic.py`` ``tumor_style="texture"``: the lesion
signal survives level 2 and cancels exactly at level 3), which makes it
the PRIMARY detection-quality gate — this test pins the claims the
proof's committed numbers support:

- the hierarchy detects what single-level cannot (reference's thesis —
  the capability the project is named for);
- int8 post-training quantization of the multiscale trunk keeps the
  full FROC (deployment takes the 54k patches/s path without paying a
  quality tax — reference eval intent at
  ``src/utils/evaluation_FROC.py:91-155``);
- QAT does not regress below plain PTQ at the same level.
"""

import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PHASES = (
    "single_level_L3", "single_level_L2", "multiscale_resize",
    "multiscale_crop", "multiscale_crop_cascade",
    "single_level_L2_int8", "single_level_L2_qat",
    "multiscale_crop_int8", "single_level_L2_simclr",
)


def _report():
    path = os.path.join(_REPO, "docs", "proofs", "froc_hard_report.json")
    with open(path) as f:
        return json.load(f)


def test_hard_fixture_phases_present_and_sane():
    report = _report()
    for phase in PHASES:
        assert phase in report, f"proof phase {phase!r} missing"
        assert 0.0 <= report[phase]["froc_score"] <= 1.0
        assert report[phase]["n_slides"] == 24


def test_hierarchy_beats_every_single_level_surface():
    """The multiscale-crop producer must dominate the blind base level,
    the fine-level-only producer, AND the resize negative control —
    and its cascade must not cost recall."""
    report = _report()
    crop = report["multiscale_crop"]["froc_score"]
    for floor in ("single_level_L3", "single_level_L2",
                  "multiscale_resize"):
        assert crop > report[floor]["froc_score"] + 0.2, (
            f"hierarchy no longer separates from {floor}: "
            f"{crop} vs {report[floor]['froc_score']}"
        )
    assert (report["multiscale_crop_cascade"]["froc_score"]
            >= crop - 1e-9), "cascade lost recall vs the full pass"


def test_quantization_keeps_quality_where_it_matters():
    """int8 of the multiscale trunk must hold the headline FROC (the
    54k-deployment path), and PTQ/QAT at the signal-bearing level must
    stay within noise of their float baseline (one detection on this
    fixture moves the score by ~0.03-0.08)."""
    report = _report()
    assert (report["multiscale_crop_int8"]["froc_score"]
            >= report["multiscale_crop"]["froc_score"] - 0.05), (
        "int8 multiscale regressed vs float"
    )
    float_l2 = report["single_level_L2"]["froc_score"]
    assert report["single_level_L2_int8"]["froc_score"] >= float_l2 - 0.08
    assert (report["single_level_L2_qat"]["froc_score"]
            >= report["single_level_L2_int8"]["froc_score"] - 0.08), (
        "QAT fell below plain PTQ"
    )


def test_simclr_initialized_producer_at_parity():
    """The self_supervised-strategy artifact drives the same producer
    (CLI --model_name) without falling below the random-init float
    baseline (label-scarce *gains* are gated separately in
    test_strategies.py over strategy_report.json)."""
    report = _report()
    assert (report["single_level_L2_simclr"]["froc_score"]
            >= report["single_level_L2"]["froc_score"] - 0.08)
    assert report["single_level_L2_simclr"]["sensitivity_max"] == 1.0

"""Hierarchical multiscale sliding-window slide inference.

Slide prediction with the capability the reference is *named* for: every
grid cell is classified from ALL its magnifications at once. The pyramid's
per-level patch sizes (1792/896/448/224 at levels 0-3,
``/root/reference/src/main.py:613-615``) cover the same level-0 field of
view, so the co-located multiscale stack of a cell is well defined; the
:class:`~..models.hierarchical.HierarchicalPatchClassifier` fuses the stack
through one shared trunk (scales folded into the batch — a single MXU conv
batch) and a fusion head.

Same producer contract as :mod:`.sliding_window`: (ny, nx) probability
grid → NMS detections → ``prob,x,y`` CSV for the official FROC consumer.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    TISSUE_MEAN_RGB_THRESHOLD,
)
from ss25_hierarchical_multiscale_image_classification_tpu.grid.pyramid import (
    PatchGrid,
    patch_size_for_level,
)
from ss25_hierarchical_multiscale_image_classification_tpu.io.slide import (
    Slide,
    open_slide,
)
from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    Timer,
    get_logger,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.hierarchical import (
    HierarchicalPatchClassifier,
)

log = get_logger("infer.multiscale")


COMBINE_COLUMNS = ("ensemble", "fusion", "aux", "aux_base", "ensemble_base")


def _combine_scores(logits, aux, temperature, aux_temperature,
                    ensemble_weight, ensemble_base_weight=0.5):
    """(fusion logits, aux logits|None) → (B, 5) detection scores in
    CALIBRATED LOG-ODDS space: columns
    [ensemble, fusion, aux-mean, aux-base, ensemble-base]
    (``COMBINE_COLUMNS``).

    Per head the score is the logit margin over its fitted temperature —
    rank-identical to the temperature-scaled softmax probability but free
    of float32 saturation (temperature sharpening ties confident cells at
    exactly 1.0 in probability space, which collapsed the FROC ranking in
    round 3's first multiscale run). ``ensemble`` mixes the fusion and
    aux-MEAN calibrated log-odds with the validation-selected weight;
    ``aux_base`` is the BASE (detection-grid) level's aux margin alone —
    the deep-supervised analogue of the single-level specialist at the
    producer's own magnification (aux levels are sorted ascending; the
    base level = max level number = index -1 = most downsampled), and
    ``ensemble_base`` mixes fusion with it.
    Probability = ``sigmoid(score)``. Without aux heads all columns carry
    the fusion score."""
    import jax.numpy as jnp

    z = logits.astype(jnp.float32)
    m_fusion = (z[:, 1] - z[:, 0]) / temperature
    if aux is None:
        return jnp.stack([m_fusion] * len(COMBINE_COLUMNS), axis=1)
    za = aux.astype(jnp.float32)
    m_per_level = (za[:, :, 1] - za[:, :, 0]) / aux_temperature
    m_aux = jnp.mean(m_per_level, axis=1)
    m_base = m_per_level[:, -1]
    m_ens = ensemble_weight * m_fusion + (1.0 - ensemble_weight) * m_aux
    m_ens_base = (
        ensemble_base_weight * m_fusion
        + (1.0 - ensemble_base_weight) * m_base
    )
    return jnp.stack([m_ens, m_fusion, m_aux, m_base, m_ens_base], axis=1)


import functools


@functools.lru_cache(maxsize=8)
def make_prob_step_multiscale_int8(
    model, levels, input_size: int = 224, temperature: float = 1.0,
    aux_temperature: float = 1.0, ensemble_weight: float = 1.0,
    with_aux: bool = False, ensemble_base_weight: float = 0.5,
    input_mode: str = "resize",
):
    """int8 variant: the SHARED trunk runs quantized (w8a8, one stacked
    MXU batch over all scales — ``models/quantized.py``); the scale
    embedding + fusion/aux heads stay float via
    :meth:`~..models.hierarchical.HierarchicalPatchClassifier.fuse` /
    ``aux_logits``. Returns (B, 5) calibrated log-odds scores
    (``COMBINE_COLUMNS``, see :func:`_combine_scores`)."""
    import jax.numpy as jnp

    from ss25_hierarchical_multiscale_image_classification_tpu.models.hierarchical import (
        HierarchicalPatchClassifier,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
        quant_forward,
    )

    levels = tuple(sorted(levels))

    @jax.jit
    def prob_step(variables, qtree, batch_by_level):
        parts = []
        for lvl in levels:
            x = batch_by_level[lvl]
            # crop never applies to the base (coarsest) level — it defines
            # the detection cell's field of view
            if (input_mode == "crop" and lvl != levels[-1]
                    and x.shape[1] > input_size):
                off = (x.shape[1] - input_size) // 2
                x = x[:, off:off + input_size, off:off + input_size]
            elif x.shape[1] != input_size:
                f = jax.image.resize(
                    x.astype(jnp.float32),
                    (x.shape[0], input_size, input_size, 3),
                    method="bilinear",
                )
                x = jnp.clip(jnp.round(f), 0, 255).astype(jnp.uint8)
            parts.append(x)
        stacked = jnp.concatenate(parts, axis=0)
        feats = quant_forward(qtree, stacked, with_fc=False)  # (S*B, 512)
        b = parts[0].shape[0]
        feats = feats.reshape(len(levels), b, 512).transpose(1, 0, 2)
        feats = feats.astype(jnp.float32)
        logits = model.apply(
            variables, feats, method=HierarchicalPatchClassifier.fuse
        )
        aux = (
            model.apply(
                variables, feats,
                method=HierarchicalPatchClassifier.aux_logits,
            )
            if with_aux else None
        )
        return _combine_scores(
            logits, aux, temperature, aux_temperature, ensemble_weight,
            ensemble_base_weight,
        )

    return prob_step


@functools.lru_cache(maxsize=8)
def make_prob_step_multiscale(
    model, levels, input_size: int = 224, temperature: float = 1.0,
    aux_temperature: float = 1.0, ensemble_weight: float = 1.0,
    with_aux: bool = False, ensemble_base_weight: float = 0.5,
    input_mode: str = "resize",
):
    """Jitted step: dict {level: u8 (B, ps_l, ps_l, 3)} → (B, 5) detection
    scores in calibrated log-odds space (``COMBINE_COLUMNS``, see
    :func:`_combine_scores`).

    Each level normalizes and resizes to ``input_size`` on device (the
    trainer's :class:`~..data.multiscale.MultiscaleDataset` resizes on
    host; at inference the device does it so the host stays on decode)."""
    from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
        normalize,
    )

    levels = tuple(sorted(levels))

    @jax.jit
    def prob_step(params, batch_stats, batch_by_level):
        prepared = {}
        for lvl in levels:
            x = normalize(batch_by_level[lvl])
            if (input_mode == "crop" and lvl != levels[-1]
                    and x.shape[1] > input_size):
                # the fine stream at NATIVE magnification: center crop
                # (half the field of view). Resizing 448→224 composes to
                # the same 8x box average as pyramid level 3, leaving the
                # fine stream informationally redundant (uint8 rounding
                # aside) — see data/multiscale.MultiscaleDataset. The base
                # (coarsest) level is never cropped: it defines the cell FoV.
                off = (x.shape[1] - input_size) // 2
                x = x[:, off:off + input_size, off:off + input_size]
            elif x.shape[1] != input_size:
                x = jax.image.resize(
                    x, (x.shape[0], input_size, input_size, 3),
                    method="bilinear",
                )
            prepared[lvl] = x
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, prepared,
            train=False, with_aux=with_aux,
        )
        logits, aux = out if with_aux else (out, None)
        return _combine_scores(
            logits, aux, temperature, aux_temperature, ensemble_weight,
            ensemble_base_weight,
        )

    return prob_step


@functools.lru_cache(maxsize=8)
def make_screen_step_base(
    model, input_size: int = 224, aux_temperature: float = 1.0,
):
    """Jitted cascade screen: u8 (B, ps_base, ps_base, 3) → (B,) calibrated
    aux-base log-odds margins.

    Runs the shared trunk on the BASE (detection-grid) level only, plus
    that level's scale-embedded aux head — 1/S of the fused step's trunk
    batch and none of the finer-level decode. The first pass of
    ``predict_slide_multiscale(cascade=...)`` screens every tissue cell
    with this before the fused model sees the survivors."""
    import jax.numpy as jnp

    from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
        normalize,
    )

    def _base_aux(m, x):
        feats = m.trunk(x, train=False)
        # base level = sorted index -1 in the scale embedding
        e = feats + m.scale_embed[-1][None, :].astype(feats.dtype)
        return m.aux_head(e.astype(m.dtype)).astype(jnp.float32)

    @jax.jit
    def screen_step(params, batch_stats, x):
        x = normalize(x)
        if x.shape[1] != input_size:
            x = jax.image.resize(
                x, (x.shape[0], input_size, input_size, 3),
                method="bilinear",
            )
        za = model.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            method=_base_aux,
        )
        return (za[:, 1] - za[:, 0]) / aux_temperature

    return screen_step


def _base_aux_from_feats(m, feats):
    """(B, 512) pooled trunk features → base-level aux logits (the sorted
    index -1 scale embedding + the shared aux head)."""
    import jax.numpy as jnp

    e = feats + m.scale_embed[-1][None, :].astype(feats.dtype)
    return m.aux_head(e.astype(m.dtype)).astype(jnp.float32)


@functools.lru_cache(maxsize=8)
def make_screen_step_base_int8(
    model, input_size: int = 224, aux_temperature: float = 1.0,
):
    """int8 cascade screen: the PERSISTED quantized trunk (w8a8) on the
    base level only, float aux head — the deployment pairing of
    ``--cascade`` with ``--int8`` + a ``--quantize`` artifact."""
    import jax.numpy as jnp

    from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
        quant_forward,
    )

    @jax.jit
    def screen_step(variables, qtree, x):
        if x.shape[1] != input_size:
            f = jax.image.resize(
                x.astype(jnp.float32),
                (x.shape[0], input_size, input_size, 3),
                method="bilinear",
            )
            x = jnp.clip(jnp.round(f), 0, 255).astype(jnp.uint8)
        feats = quant_forward(qtree, x, with_fc=False).astype(jnp.float32)
        za = model.apply(variables, feats, method=_base_aux_from_feats)
        return (za[:, 1] - za[:, 0]) / aux_temperature

    return screen_step


def predict_slide_multiscale(
    slide_or_path: Slide | str,
    variables: dict,
    levels=(2, 3),
    stride: int | None = None,
    batch_size: int = 128,
    model=None,
    tissue_threshold: float = TISSUE_MEAN_RGB_THRESHOLD,
    input_size: int = 224,
    fusion: str = "concat",
    int8: bool = False,
    mesh=None,
    combine: str = "auto",
    return_components: bool = False,
    qtree: dict | None = None,
    output: str = "prob",
    cascade: float | None = None,
    cascade_bailout: float = 0.6,
    cell_filter: "np.ndarray | None" = None,
    input_mode: str | None = None,
):
    """Multiscale tumor probability per co-located grid cell.

    The grid lives on the BASE pyramid level requested (max level number
    = most-downsampled plane — the single-level producer's own level); each cell's patch at a coarser-magnification level
    shares its level-0 origin and field of view. ``stride`` is in
    base-level pixels. ``int8=True`` quantizes the shared trunk (w8a8,
    calibrated on this slide's first tissue batch) and keeps the fusion
    head float. With a ``mesh`` the per-level batches are sharded over
    the data axis — the slide's multiscale grid runs spatially
    data-parallel over ICI, like the single-level producer.

    ``combine`` selects the reported probability: ``"auto"`` (the surface
    the artifact's calibration selected by its detection-grade val
    criterion — falls back to fusion-only for pre-calibration artifacts),
    ``"ensemble"``, ``"fusion"``, ``"aux"`` (per-scale mean, the
    per-level-probability ensemble baseline), ``"aux_base"`` (the base
    detection-grid level's aux head alone — the deep-supervised analogue
    of the single-level specialist inside the artifact), or
    ``"ensemble_base"`` (fusion × aux-base mix).
    All five surfaces are computed in ONE pass over
    the slide (they share the trunk); ``return_components=True``
    additionally returns ``{column: (ny, nx)}`` for ``COMBINE_COLUMNS``.

    ``output="margin"`` returns calibrated log-odds surfaces instead of
    probabilities (non-tissue = ``NON_TISSUE_MARGIN``) — the detection
    producers rank on these so confident cells don't tie at probability
    1.0 (see ``sliding_window.margin_to_score``).

    ``cascade`` enables HIERARCHICAL cascade inference: a first pass
    screens every tissue cell with the base (detection-grid) level's aux
    head alone (:func:`make_screen_step_base` — 1/S of the fused trunk
    batch, none of the finer-level decode), and only surviving cells get
    the finer-magnification reads and the fused model; rows with no
    survivor are never decoded again. The floor:

    - ``cascade="auto"`` — the artifact's fitted operating point
      (``calibration["cascade_margin"]``: the screen-margin floor that
      kept every validation tumor cell, less a safety margin — fitted by
      ``train/multiscale_trainer.py``). Ignored with a log line for
      artifacts without one.
    - a float probability in [0, 1) — converted through the calibrated
      sigmoid. Note a well-calibrated weak screen concentrates tissue
      near p=0.5, so absolute floors well below 0.5 may keep everything;
      the auto operating point adapts to the screen's actual margins.

    ``cascade_bailout`` bounds the cascade's worst case when the
    operating point does not transfer to the deployment tissue (the
    measured gigapixel negative in docs/PERFORMANCE.md: a floor fitted
    on different-fabricator tissue kept 96% of cells, making the screen
    pass pure overhead, 0.75x). Once a minimum sample has been screened
    (1024 cells, or a quarter of the slide's estimated tissue, never
    under two full batches), if the running survivor fraction
    exceeds this value the screen is ABANDONED mid-flight — the rest of
    the screen pass is skipped and every tissue cell gets the full
    fused pass (recall-safe: bailing out never drops a cell the full
    pass would score). If the screen finishes before the probe's sample
    floor is met (small/sparse slides), the same test applies to the
    final tally. The 0.6 default sits above the measured
    break-even survivor fraction (screen cost / fused cost ~ 0.44 for
    two levels => break-even ~ 0.56). ``cascade_bailout >= 1`` disables
    the probe (round-2 behavior).

    .. note:: changed in round 3/4 — ``cascade_bailout`` defaults to 0.6
       (previously there was no probe): on uninformative tissue existing
       cascade callers now get full fused values where screened cells
       previously carried screen margins in the aux_base/selected
       columns. Strictly recall-safe, but consumers snapshotting cascade
       surfaces will see a diff; pass ``cascade_bailout=1.0`` for the
       old behavior. Round 4 adds the end-of-screen tally check and
       bases the probe's sample floor on estimated tissue (grid-cell
       counts overshoot on sparse slides, where the probe could never
       arm).

    Screened-out tissue cells carry their screen margin in the
    ``aux_base`` column (the screen IS that head) and the selected output
    column — the shipped surface stays dense for overlays and threshold
    sweeps — while the other component columns stay non-tissue, so a
    component CSV exported under cascade reports its own surface
    restricted to the survivors, never a silent mix. Requires an artifact
    with aux heads (ignored otherwise); with a persisted ``qtree`` the
    screen runs the quantized trunk, else float.

    ``cell_filter`` (internal) restricts evaluation to a boolean
    (ny, nx) mask — the cascade's second pass.

    Returns (probs (ny, nx), base grid[, components]).
    """
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        NON_TISSUE_MARGIN,
        sigmoid,
    )

    if output not in ("prob", "margin"):
        raise ValueError(f"unknown output mode {output!r}")
    levels = tuple(sorted(levels))
    base = max(levels)
    slide = (
        open_slide(slide_or_path)
        if isinstance(slide_or_path, str) else slide_or_path
    )
    own = isinstance(slide_or_path, str)
    try:
        grid = PatchGrid.for_slide_level(
            base,
            slide.level_dimensions[base],
            slide.level_downsamples[base],
            stride=stride,
        )
        if model is None:
            # an attention-fusion artifact carries attn_v/attn_w params;
            # auto-detect so the CLI can serve either fusion mode without
            # a flag that could contradict the checkpoint
            if "attn_v" in variables["params"]:
                fusion = "attention"
            model = HierarchicalPatchClassifier(
                levels=levels, fusion=fusion
            )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        calibration = dict(variables.get("calibration", {}) or {})
        has_aux = "aux_head" in params
        temperature = float(calibration.get("temperature", 1.0))
        aux_temperature = float(calibration.get("aux_temperature", 1.0))
        ensemble_weight = float(
            calibration.get("ensemble_weight", 1.0 if not has_aux else 0.5)
        )
        ensemble_base_weight = float(
            calibration.get(
                "ensemble_base_weight",
                # legacy round-3 artifacts wrote the weight under the
                # misnamed key (see evaluation.calibration._LEGACY_COMBINE)
                calibration.get("ensemble_fine_weight", 0.5),
            )
        )
        if input_mode is None:
            # the artifact records how it was trained (0=resize, 1=crop);
            # serving must match or the fine stream's semantics flip
            input_mode = (
                "crop" if int(calibration.get("input_mode", 0)) else "resize"
            )
        if combine != "auto" and combine not in COMBINE_COLUMNS:
            raise ValueError(f"unknown combine mode {combine!r}")
        if combine == "auto":
            # the artifact's calibration picks its default surface by a
            # detection-grade criterion (train/multiscale_trainer.py →
            # evaluation.calibration.pick_combine_mode); artifacts from
            # before mode selection shipped ensemble scores in column 0
            from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.calibration import (
                decode_combine,
            )

            combine = decode_combine(calibration.get("combine", "ensemble"))
        if not has_aux and combine != "fusion":
            combine = "fusion"  # pre-calibration artifact: fusion only
        col = COMBINE_COLUMNS.index(combine)
        step_kw = dict(
            temperature=temperature, aux_temperature=aux_temperature,
            ensemble_weight=ensemble_weight, with_aux=has_aux,
            ensemble_base_weight=ensemble_base_weight,
            input_mode=input_mode,
        )
        if mesh is not None:
            from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
                batch_sharding,
                replicate,
            )

            n_dev = int(mesh.devices.size)
            if batch_size % n_dev:
                batch_size = -(-batch_size // n_dev) * n_dev
                log.info(
                    "batch_size rounded up to %d (multiple of the "
                    "%d-device mesh)", batch_size, n_dev,
                )
            params = replicate(mesh, params)
            batch_stats = replicate(mesh, batch_stats)
            variables = {"params": params, "batch_stats": batch_stats}
            _in_sharding = batch_sharding(mesh)

            def _put(tree):
                return {
                    lvl: jax.device_put(x, _in_sharding)
                    for lvl, x in tree.items()
                }
        else:
            variables = {"params": params, "batch_stats": batch_stats}

            def _put(tree):
                return tree
        if int8:
            qstep = make_prob_step_multiscale_int8(
                model, levels, input_size, **step_kw
            )
            qstate: dict = {}
            if qtree is not None:
                # persisted trunk artifact: deterministic scales (see
                # models/quant_artifact.py), no lazy per-slide calibration
                qstate["tree"] = (
                    qtree if mesh is None else replicate(mesh, qtree)
                )
        else:
            step = make_prob_step_multiscale(
                model, levels, input_size, **step_kw
            )

        ps = {lvl: patch_size_for_level(lvl) for lvl in levels}
        ds = {lvl: slide.level_downsamples[lvl] for lvl in levels}
        dims = {lvl: slide.level_dimensions[lvl] for lvl in levels}
        # base-level px → level px (power-of-two pyramid ratios)
        ratio = {lvl: ds[base] / ds[lvl] for lvl in levels}

        def read_bands(
            iy: int, which=levels, cells: tuple[int, int] | None = None,
        ) -> tuple[dict[int, np.ndarray], dict[int, int]]:
            """Co-located band per level for one grid row.

            ``cells=(lo, hi)`` restricts the decode to the x-span covering
            grid cells lo..hi inclusive (the cascade's second pass decodes
            only the survivors' columns); None reads full width. Returns
            (bands, x-offsets): each band's first column sits at level
            pixel ``xoff[lvl]`` — consumers index cells relative to it.
            """
            y0_l0 = int(iy * grid.stride * ds[base])
            out: dict[int, np.ndarray] = {}
            xoffs: dict[int, int] = {}
            for lvl in which:
                w_l, h_l = dims[lvl]
                if cells is None:
                    x_l, wspan = 0, w_l
                else:
                    lo, hi = cells
                    # cell x-starts use the SAME rounding as the consumer's
                    # per-cell index, so relative slicing is pixel-exact
                    x_l = int(round(lo * grid.stride * ratio[lvl]))
                    wspan = (
                        int(round(hi * grid.stride * ratio[lvl]))
                        + ps[lvl] - x_l
                    )
                xoffs[lvl] = x_l
                y_l = int(round(y0_l0 / ds[lvl]))
                h = min(ps[lvl], h_l - y_l)
                if h <= 0:
                    # rounding can put a coarse-level band start at/past the
                    # level height; a zero-height region read is backend-
                    # dependent, so return the all-white band directly
                    out[lvl] = np.full((ps[lvl], wspan, 3), 255, np.uint8)
                    continue
                band = slide.read_region(
                    (int(x_l * ds[lvl]), y0_l0), lvl, (wspan, h)
                )
                if h < ps[lvl]:
                    full = np.full((ps[lvl], wspan, 3), 255, np.uint8)
                    full[:h] = band
                    band = full
                out[lvl] = band
            return out, xoffs

        from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
            BandProducer,
        )

        ny, nx = grid.ny, grid.nx
        n = grid.num_patches
        # log-odds scores (COMBINE_COLUMNS); σ applied at return
        ncol = len(COMBINE_COLUMNS)
        probs = np.full((n, ncol), NON_TISSUE_MARGIN, np.float32)

        screen_margins = None
        cascade_floor = None
        if cascade is not None and cell_filter is None:
            if not has_aux:
                log.info(
                    "cascade requested but the artifact has no aux heads; "
                    "running the full fused pass on every tissue cell"
                )
            elif cascade == "auto" and "cascade_margin" not in calibration:
                log.info(
                    "cascade=auto but the artifact ships no fitted "
                    "operating point (older artifact, or the base-level "
                    "screen was uninformative on val — "
                    "evaluation.calibration.fit_cascade_margin); running "
                    "the full fused pass"
                )
            else:
                from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
                    prob_to_margin,
                )

                if int8 and "tree" in qstate:
                    # persisted --quantize artifact: screen with the
                    # quantized trunk too (float aux head). Lazy int8
                    # calibrates on the first FUSED batch, which doesn't
                    # exist yet at screen time — that path screens float.
                    qscreen = make_screen_step_base_int8(
                        model, input_size, aux_temperature=aux_temperature
                    )
                    screen = lambda p_, bs_, x: qscreen(  # noqa: E731
                        variables, qstate["tree"], x
                    )
                else:
                    screen = make_screen_step_base(
                        model, input_size, aux_temperature=aux_temperature
                    )
                put1 = (
                    (lambda x: jax.device_put(x, _in_sharding))
                    if mesh is not None else (lambda x: x)
                )
                if cascade == "auto":
                    cascade_floor = float(calibration["cascade_margin"])
                else:
                    cascade_floor = prob_to_margin(float(cascade))
                # Mid-flight bailout probe: once enough cells have been
                # screened, a survivor fraction above ``cascade_bailout``
                # means the screen is uninformative on THIS slide's
                # tissue — abandon it and run the full fused pass.
                # Sample floor: 1024 cells, or a quarter of the slide's
                # ESTIMATED TISSUE (grid-cell counts overshoot on sparse
                # slides, where the probe could otherwise never arm),
                # never less than two full batches.
                def probe_min(rows_done: int, screened_so_far: int) -> int:
                    est_tissue = (
                        screened_so_far * ny // max(rows_done, 1)
                        if rows_done else n
                    )
                    return max(
                        2 * batch_size, min(1024, (est_tissue + 3) // 4)
                    )

                screened = survivors = 0
                bailed = False
                screen_margins = np.full(
                    (ny, nx), NON_TISSUE_MARGIN, np.float32
                )
                sproducer = BandProducer(
                    ny, lambda iy: read_bands(iy, (base,))[0]
                )
                try:
                  with Timer(f"cascade screen[{n} cells]", log):
                    sbatch = np.full(
                        (batch_size, ps[base], ps[base], 3), 255, np.uint8
                    )
                    spos: list[tuple[int, int]] = []
                    # depth-k pipeline with async result copies (see
                    # sliding_window.predict_slide) — shallower than the
                    # fused pass so the bailout probe's survivor tally
                    # stays at most a couple of batches behind
                    from collections import deque

                    spending: deque = deque()

                    def sdrain_one():
                        nonlocal screened, survivors
                        prev, prev_pos = spending.popleft()
                        vals = np.asarray(prev)[: len(prev_pos)]
                        ys = [p[0] for p in prev_pos]
                        xs = [p[1] for p in prev_pos]
                        screen_margins[ys, xs] = vals
                        screened += len(prev_pos)
                        survivors += int((vals >= cascade_floor).sum())

                    def sflush():
                        while spending:
                            sdrain_one()

                    def sdispatch(b, positions):
                        dev = screen(params, batch_stats, put1(b))
                        try:
                            dev.copy_to_host_async()
                        except Exception:
                            pass
                        spending.append((dev, list(positions)))
                        if len(spending) > 2:
                            sdrain_one()

                    rows_done = 0
                    while True:
                        item = sproducer.get()
                        if item is None:
                            break
                        iy, bands = item
                        band = bands[base]
                        for ix in range(nx):
                            x_l = ix * grid.stride
                            patch = band[:, x_l : x_l + ps[base]]
                            if patch.shape[1] < ps[base]:
                                full = np.full(
                                    (ps[base], ps[base], 3), 255, np.uint8
                                )
                                full[:, : patch.shape[1]] = patch
                                patch = full
                            if patch.mean() > tissue_threshold:
                                continue
                            sbatch[len(spos)] = patch
                            spos.append((iy, ix))
                            if len(spos) == batch_size:
                                sdispatch(sbatch, spos)
                                sbatch = np.full(
                                    (batch_size, ps[base], ps[base], 3),
                                    255, np.uint8,
                                )
                                spos = []
                        rows_done += 1
                        if (
                            cascade_bailout < 1.0
                            and screened >= probe_min(rows_done, screened)
                            and survivors > cascade_bailout * screened
                        ):
                            bailed = True
                            break
                    if not bailed:
                        if spos:
                            sdispatch(sbatch, spos)
                        sflush()
                        # The probe can only arm mid-flight once its sample
                        # floor is met; on small/sparse slides the screen
                        # can finish first. Apply the same test to the
                        # FINAL tally: an uninformative screen must not
                        # ship a mostly-screen-margin surface just because
                        # the slide was small (recall-safe — bailing runs
                        # the full fused pass on every tissue cell).
                        if (
                            cascade_bailout < 1.0
                            and screened > 0
                            and survivors > cascade_bailout * screened
                        ):
                            bailed = True
                            log.info(
                                "cascade: probe never armed mid-flight "
                                "(%d cells screened < sample floor); "
                                "final survivor fraction %.2f exceeds "
                                "the bailout threshold",
                                screened, survivors / screened,
                            )
                finally:
                    sproducer.stop()
                if bailed:
                    log.info(
                        "cascade: bailout — %d / %d probed cells survive "
                        "the screen floor %g (> %g of tissue): the "
                        "operating point is uninformative on this "
                        "slide's tissue; abandoning the screen and "
                        "running the full fused pass (recall-safe)",
                        survivors, screened, cascade_floor,
                        cascade_bailout,
                    )
                    cascade_floor = None
                    screen_margins = None  # full pass scores every cell
                else:
                    cell_filter = screen_margins >= cascade_floor
                    log.info(
                        "cascade: %d / %d tissue cells survive the "
                        "base-level screen (margin >= %g%s)",
                        int(cell_filter.sum()),
                        int((screen_margins > NON_TISSUE_MARGIN).sum()),
                        cascade_floor,
                        ", artifact operating point" if cascade == "auto"
                        else "",
                    )

        def fresh_batch():
            return {
                lvl: np.full(
                    (batch_size, ps[lvl], ps[lvl], 3), 255, np.uint8
                )
                for lvl in levels
            }

        if cell_filter is None:
            rows = list(range(ny))

            def read_row(k: int):
                return read_bands(rows[k])
        else:
            # rows with no surviving cell are never decoded in pass 2, and
            # surviving rows decode only the x-span covering their
            # survivors (sparse survivors on a gigapixel slide would
            # otherwise re-decode the full fine-level width per row)
            rows = [iy for iy in range(ny) if bool(cell_filter[iy].any())]

            def read_row(k: int):
                xs = np.flatnonzero(cell_filter[rows[k]])
                return read_bands(
                    rows[k], cells=(int(xs[0]), int(xs[-1]))
                )

        producer = BandProducer(len(rows), read_row)
        try:
          with Timer(f"predict_slide_multiscale[{n} cells]", log):
            batch = fresh_batch()
            batch_pos: list[int] = []
            # depth-k pipeline with async result copies (see
            # sliding_window.predict_slide)
            from collections import deque

            pending: deque = deque()
            PIPELINE_DEPTH = 4

            def drain_one():
                prev, prev_pos = pending.popleft()
                probs[prev_pos] = np.asarray(prev)[: len(prev_pos)]

            def dispatch(b, positions):
                batch_by_level = {lvl: b[lvl] for lvl in levels}
                if int8:
                    if "tree" not in qstate:
                        # calibrate the trunk on this slide's first tissue
                        # batch, resized the same way the step resizes
                        import jax.numpy as jnp

                        from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
                            quantize_resnet18,
                        )

                        cal = []
                        for lvl in levels:
                            x = batch_by_level[lvl]
                            if x.shape[1] != input_size:
                                f = jax.image.resize(
                                    jnp.asarray(x, jnp.float32),
                                    (x.shape[0], input_size, input_size, 3),
                                    method="bilinear",
                                )
                                x = np.asarray(
                                    jnp.clip(jnp.round(f), 0, 255).astype(
                                        jnp.uint8
                                    )
                                )
                            cal.append(np.asarray(x))
                        trunk_vars = {
                            "params": jax.device_get(params["trunk"]),
                            "batch_stats": jax.device_get(
                                batch_stats.get("trunk", {})
                            ),
                        }
                        tree = quantize_resnet18(
                            trunk_vars, [np.concatenate(cal, axis=0)]
                        ).tree()
                        if mesh is not None:
                            from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
                                replicate as _rep,
                            )

                            tree = _rep(mesh, tree)
                        qstate["tree"] = tree
                    dev = qstep(variables, qstate["tree"], _put(batch_by_level))
                else:
                    dev = step(params, batch_stats, _put(batch_by_level))
                try:
                    dev.copy_to_host_async()
                except Exception:
                    pass
                pending.append((dev, np.asarray(positions)))
                if len(pending) > PIPELINE_DEPTH:
                    drain_one()

            while True:
                item = producer.get()
                if item is None:
                    break
                k, (bands, xoffs) = item
                iy = rows[k]
                for ix in range(nx):
                    if cell_filter is not None and not cell_filter[iy, ix]:
                        continue
                    cut = {}
                    for lvl in levels:
                        x_l = (
                            int(round(ix * grid.stride * ratio[lvl]))
                            - xoffs[lvl]
                        )
                        patch = bands[lvl][:, x_l : x_l + ps[lvl]]
                        if patch.shape[1] < ps[lvl]:
                            full = np.full(
                                (ps[lvl], ps[lvl], 3), 255, np.uint8
                            )
                            full[:, : patch.shape[1]] = patch
                            patch = full
                        cut[lvl] = patch
                    if cut[base].mean() > tissue_threshold:
                        continue
                    for lvl in levels:
                        batch[lvl][len(batch_pos)] = cut[lvl]
                    batch_pos.append(ix * ny + iy)  # reference x-major order
                    if len(batch_pos) == batch_size:
                        dispatch(batch, batch_pos)
                        batch = fresh_batch()
                        batch_pos = []
            if batch_pos:
                dispatch(batch, batch_pos)
            while pending:
                drain_one()
        finally:
            # stop/join BEFORE the outer finally closes the slide handle
            producer.stop()

        grids = np.full((ncol, ny, nx), NON_TISSUE_MARGIN, np.float32)
        for i in range(n):
            ix, iy = divmod(i, ny)
            grids[:, iy, ix] = probs[i]
        if screen_margins is not None:
            # screened-out tissue cells carry the base-level screen margin
            # ONLY where it is genuinely that estimate: the aux_base
            # column (the screen IS the aux_base head) and the SELECTED
            # output column (keeps the shipped surface dense for overlays
            # and threshold sweeps). The other component columns stay
            # non-tissue — a fusion/aux CSV exported under cascade must
            # not silently mix in screen values (it reports the fused
            # surface restricted to the survivors).
            fill = (screen_margins > NON_TISSUE_MARGIN) & ~cell_filter
            grids[COMBINE_COLUMNS.index("aux_base"), fill] = (
                screen_margins[fill]
            )
            grids[col, fill] = screen_margins[fill]
        if output == "prob":
            grids = sigmoid(grids)
        out = grids[col]
        if return_components:
            components = {
                name: grids[i] for i, name in enumerate(COMBINE_COLUMNS)
            }
            return out, grid, components
        return out, grid
    finally:
        if own:
            slide.close()


#: component surfaces `--ms_components` exports next to the main CSV
#: (dirs ``<csv_dir>_<name>``); "ensemble" is omitted — it is the main
#: CSV whenever the calibration selects it
COMPONENT_EXPORTS = ("fusion", "aux", "aux_base", "ensemble_base")


def predict_and_export_multiscale(
    slide_path: str,
    variables: dict,
    csv_dir: str,
    levels=(2, 3),
    threshold: float | None = None,
    export_components: bool = False,
    **kw,
) -> tuple[np.ndarray, str]:
    """Multiscale producer: probability grid + detection CSV for one slide
    (same CSV contract as the single-level producer). ``threshold`` is in
    probability space (default ``DETECTION_PROB_THRESHOLD``); ranking and
    emission run on the calibrated log-odds surface.
    ``export_components=True`` additionally writes one detection CSV per
    ``COMPONENT_EXPORTS`` surface (same single inference pass) into
    ``<csv_dir>_<component>/``."""
    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        DETECTION_PROB_THRESHOLD,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
        slide_name,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        margin_detections,
        sigmoid,
        write_detection_csv,
    )

    if threshold is None:
        threshold = DETECTION_PROB_THRESHOLD
    name = slide_name(os.path.basename(slide_path))
    if export_components:
        margins, grid, comps = predict_slide_multiscale(
            slide_path, variables, levels=levels, output="margin",
            return_components=True, **kw,
        )
        for comp in COMPONENT_EXPORTS:
            write_detection_csv(
                os.path.join(f"{csv_dir}_{comp}", f"{name}.csv"),
                margin_detections(comps[comp], grid, threshold),
            )
    else:
        margins, grid = predict_slide_multiscale(
            slide_path, variables, levels=levels, output="margin", **kw
        )
    detections = margin_detections(margins, grid, threshold)
    csv_path = os.path.join(csv_dir, f"{name}.csv")
    write_detection_csv(csv_path, detections)
    log.info(
        "%s: %d multiscale detections → %s", name, len(detections), csv_path
    )
    return sigmoid(margins), csv_path

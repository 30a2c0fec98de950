"""Full-slide sliding-window inference → probability grid → detections.

The reference's FROC stage consumes per-slide detection CSVs of ``prob,x,y``
rows in level-0 coordinates (``src/utils/evaluation_FROC.py:67-88``) but the
producer of those CSVs is **not in the repo** (SURVEY.md §3.5). This module
implements it TPU-natively:

1. grid the slide at a level (stride = patch size by default, finer for
   smoother heatmaps);
2. stream tissue patches through the jitted classifier in static batches
   (white patches short-circuit to probability 0, mirroring the extraction
   tissue filter ``src/main.py:718-719``);
3. assemble the (ny, nx) tumor-probability grid;
4. emit candidate detections via greedy grid non-max suppression, with
   coordinates mapped to level-0 pixel centers for the FROC hit test
   (``evaluation_FROC.py:134``).
"""

from __future__ import annotations

import csv
import os

import jax
import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    TISSUE_MEAN_RGB_THRESHOLD,
)
from ss25_hierarchical_multiscale_image_classification_tpu.grid.pyramid import (
    PatchGrid,
)
from ss25_hierarchical_multiscale_image_classification_tpu.io.slide import (
    Slide,
    open_slide,
)
from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    Timer,
    get_logger,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
    ResNet18Classifier,
)

log = get_logger("infer.sliding_window")


class BandProducer:
    """Band-prefetch thread with a bounded queue and SAFE shutdown.

    The consumer may exit early (exception in the jitted step, bad
    checkpoint, ...) while the producer is blocked on ``put`` or mid
    ``read_region``; closing the slide then would free the native TIFF
    handle under the reader. ``stop()`` unblocks the producer, waits for
    it to finish, and only then should the caller close the slide.

    Items arrive via :meth:`get`: ``(index, bands)`` tuples, ``None`` at
    end of stream; producer exceptions re-raise in the consumer.
    """

    def __init__(self, n_items: int, read_fn, maxsize: int = 2):
        import queue as _queue
        import threading as _threading

        self._queue_mod = _queue
        self._q: "_queue.Queue" = _queue.Queue(maxsize=maxsize)
        self._stop = _threading.Event()
        self._n = n_items
        self._read = read_fn
        self._thread = _threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except self._queue_mod.Full:
                continue
        return False

    def _run(self) -> None:
        try:
            for i in range(self._n):
                if self._stop.is_set():
                    return
                if not self._put((i, self._read(i))):
                    return
            self._put(None)
        except BaseException as e:  # propagate to the consumer
            self._put(e)

    def get(self):
        item = self._q.get()
        if isinstance(item, BaseException):
            raise item
        return item

    def stop(self) -> None:
        """Idempotent: unblock and join the producer (call before closing
        the slide handle, on every exit path)."""
        self._stop.set()
        while True:
            try:
                self._q.get_nowait()
            except self._queue_mod.Empty:
                break
        # unbounded: a band decode in flight must finish before the caller
        # frees the slide handle (gigapixel level-0 bands take ~45 s)
        self._thread.join()


import functools


# Margin assigned to cells the tissue filter skipped: sigmoid(-1e4) is
# exactly 0.0f (matches the old all-zero prob init) and any real tissue
# margin ranks above it.
NON_TISSUE_MARGIN: float = -1.0e4


def sigmoid(m: np.ndarray) -> np.ndarray:
    """Numerically-safe elementwise logistic on host (margin → prob).

    Only exponentiates non-positive values, so it never overflows and
    :data:`NON_TISSUE_MARGIN` underflows to exactly 0.0 (matching the
    historical all-zero background of probability grids)."""
    m = np.asarray(m, np.float32)
    pos = m >= 0
    z = np.exp(np.where(pos, -m, m))  # exponent ≤ 0: safe
    return np.where(pos, 1.0 / (1.0 + z), z / (1.0 + z)).astype(np.float32)


def prob_to_margin(p: float) -> float:
    """Inverse logistic: probability-space threshold → margin space."""
    p = min(max(float(p), 1e-12), 1.0 - 1e-12)
    return float(np.log(p / (1.0 - p)))


def margin_to_score(m) -> np.ndarray:
    """Detection score for the CSV: a softsign squash of the logit margin,
    ``0.5 + 0.5*m/(1+|m|)`` ∈ (0, 1).

    The logistic would be the calibrated choice but saturates to exactly
    1.0 in float for margins ≳ 17, tying every confident detection — and
    the FROC consumer ranks detections by this value, so ties collapse its
    operating points (the round-2→3 multiscale regression). Softsign is
    monotone in the margin (rank-identical to any temperature scaling),
    crosses 0.5 at margin 0 exactly like the logistic, and keeps distinct
    float64 values out to |m| ~ 1e6.
    """
    m = np.asarray(m, np.float64)
    return 0.5 + 0.5 * m / (1.0 + np.abs(m))


@functools.lru_cache(maxsize=8)
def make_prob_step(model, input_size: int = 224,
                   device_tissue_threshold: float | None = None):
    """Jitted margin step, CACHED per (model, input_size): a fleet run calls
    ``predict_slide`` once per slide, and a fresh ``@jax.jit`` closure per
    slide would recompile (or at best re-hit the persistent cache) every
    time — linen modules are frozen dataclasses, so they key an lru_cache.

    Returns the tumor logit margin ``logits[:,1] - logits[:,0]`` rather
    than the softmax probability: the margin carries full ranking
    resolution where float32 softmax saturates to exact 0/1 ties
    (probability = ``sigmoid(margin)`` when one is needed).

    With ``device_tissue_threshold`` set, the step runs the fused Pallas
    preprocessing kernel (``ops/pallas/preprocess.py``): ImageNet normalize
    AND the per-patch mean-RGB tissue statistic come out of ONE HBM pass
    over the uint8 batch, and white patches (mean > threshold,
    ``src/main.py:718-719``) short-circuit to :data:`NON_TISSUE_MARGIN` on
    device — the host never touches patch pixels (see ``predict_slide``'s
    ``tissue_filter="device"`` mode).
    """
    from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
        preprocess_batch,
    )
    import jax.numpy as jnp

    @jax.jit
    def prob_step(params, batch_stats, imgs_u8):
        means = None
        if device_tissue_threshold is None:
            imgs = preprocess_batch(jax.random.key(0), imgs_u8,
                                    training=False)
        else:
            from ss25_hierarchical_multiscale_image_classification_tpu.ops.pallas.preprocess import (
                fused_normalize,
            )

            imgs, means = fused_normalize(imgs_u8, dtype=jnp.float32)
        if imgs.shape[1] != input_size:
            # patches from coarser/finer levels resize on device (normalize
            # is per-channel affine, so it commutes with bilinear resize)
            imgs = jax.image.resize(
                imgs,
                (imgs.shape[0], input_size, input_size, 3),
                method="bilinear",
            )
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, imgs, train=False
        ).astype(jnp.float32)
        margin = logits[:, 1] - logits[:, 0]
        if means is not None:
            margin = jnp.where(
                means > device_tissue_threshold, NON_TISSUE_MARGIN, margin
            )
        return margin

    return prob_step


@functools.lru_cache(maxsize=8)
def make_prob_step_int8(input_size: int = 224):
    """int8 (w8a8) classifier margin step over a quantized tree
    (``models/quantized.py``); u8 patches resize on device if needed.
    Cached per input size (see :func:`make_prob_step`)."""
    import jax.numpy as jnp

    from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
        quant_forward,
    )

    @jax.jit
    def prob_step(qtree, imgs_u8):
        if imgs_u8.shape[1] != input_size:
            f = jax.image.resize(
                imgs_u8.astype(jnp.float32),
                (imgs_u8.shape[0], input_size, input_size, 3),
                method="bilinear",
            )
            imgs_u8 = jnp.clip(jnp.round(f), 0, 255).astype(jnp.uint8)
        logits = quant_forward(qtree, imgs_u8, with_fc=True).astype(
            jnp.float32
        )
        return logits[:, 1] - logits[:, 0]

    return prob_step


def predict_slide(
    slide_or_path: Slide | str,
    variables: dict,
    level: int = 3,
    stride: int | None = None,
    batch_size: int = 512,
    model=None,
    tissue_threshold: float = TISSUE_MEAN_RGB_THRESHOLD,
    input_size: int = 224,
    mesh=None,
    int8: bool = False,
    warmup: bool = False,
    qtree: dict | None = None,
    output: str = "prob",
    tissue_filter: str = "host",
) -> tuple[np.ndarray, PatchGrid]:
    """Tumor probability per grid cell.

    Returns (probs (ny, nx) float32 indexed [y_idx, x_idx], grid). Non-tissue
    cells are 0. ``output="margin"`` returns the logit-margin grid instead
    (non-tissue = :data:`NON_TISSUE_MARGIN`) — rank-identical to the
    probability but free of float32 softmax saturation, which the detection
    producers need because the FROC consumer ranks by the emitted score.
    With a ``mesh``, each batch is sharded across the data axis
    — the slide's patch grid is spatially data-parallel over ICI (the
    multi-chip path behind the <60 s full-slide target; SURVEY.md §5).
    ``int8=True`` quantizes the classifier and runs the MXU int8 path:
    with a ``qtree`` (a persisted ``models/quant_artifact.py`` tree,
    calibrated once on training tissue) outputs are deterministic across
    batch sizes and slides; without one, scales calibrate lazily on this
    slide's first tissue batch.

    ``tissue_filter`` picks where the white-patch short-circuit runs:

    - ``"host"`` (default): per-cell ``mean > threshold`` on the host
      before batching — white cells are never uploaded. Right whenever
      host→device bandwidth is the scarce resource.
    - ``"device"``: every cell uploads and the jitted step runs the fused
      normalize+statistic Pallas kernel, clamping white cells on device —
      the host never computes per-patch means. Right when host CPU is the
      scarce resource and the feed link is full-rate (PCIe/DMA): it removes
      the host's O(pixels) filter pass from the critical path at the cost
      of uploading background cells. Float single-chip path only (the int8
      stem consumes raw uint8 with the normalize folded into its weights,
      and a pallas_call under a GSPMD mesh jit would replicate per device).
    """
    if output not in ("prob", "margin"):
        raise ValueError(f"unknown output mode {output!r}")
    if tissue_filter not in ("host", "device"):
        raise ValueError(f"unknown tissue_filter {tissue_filter!r}")
    if tissue_filter == "device" and (int8 or mesh is not None):
        raise ValueError(
            "tissue_filter='device' is the float single-chip path: the int8 "
            "stem folds normalization into its weights, and the meshed step "
            "would replicate the pallas_call per device"
        )
    slide = (
        open_slide(slide_or_path) if isinstance(slide_or_path, str) else slide_or_path
    )
    own = isinstance(slide_or_path, str)
    try:
        grid = PatchGrid.for_slide_level(
            level,
            slide.level_dimensions[level],
            slide.level_downsamples[level],
            stride=stride,
        )
        coords = grid.coords_array()
        model = model or ResNet18Classifier()
        step = make_prob_step(
            model,
            input_size,
            device_tissue_threshold=(
                float(tissue_threshold) if tissue_filter == "device" else None
            ),
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if tissue_filter == "device" and batch_size % 8:
            # the fused kernel blocks the batch dim at 8 (TPU sublane tiling)
            batch_size = -(-batch_size // 8) * 8
        qstep = make_prob_step_int8(input_size) if int8 else None
        qstate: dict = {}
        if mesh is not None:
            from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
                batch_sharding,
                replicate,
            )

            n_dev = int(mesh.devices.size)
            if batch_size % n_dev:
                batch_size = -(-batch_size // n_dev) * n_dev
                log.info(
                    "batch_size rounded up to %d (multiple of the %d-device mesh)",
                    batch_size, n_dev,
                )
            params = replicate(mesh, params)
            batch_stats = replicate(mesh, batch_stats)
            _in_sharding = batch_sharding(mesh)

            def _put(x):
                return jax.device_put(x, _in_sharding)
        else:
            def _put(x):
                return x

        if int8 and qtree is not None:
            # persisted artifact (calibrated once on training tissue):
            # deterministic scales, no lazy per-slide calibration
            qstate["tree"] = qtree if mesh is None else replicate(mesh, qtree)

        def run_batch(imgs_u8: np.ndarray):
            """Dispatch one device batch; returns the (async) device array."""
            if qstep is None:
                return step(params, batch_stats, _put(imgs_u8))
            if "tree" not in qstate:
                # calibrate on this slide's first tissue batch, resized the
                # same way the step resizes (the folded stem's bias map is
                # shape-bound to the calibration input size)
                from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
                    quantize_resnet18,
                )

                cal = imgs_u8
                if cal.shape[1] != input_size:
                    import jax.numpy as jnp

                    f = jax.image.resize(
                        jnp.asarray(cal, jnp.float32),
                        (cal.shape[0], input_size, input_size, 3),
                        method="bilinear",
                    )
                    cal = np.asarray(
                        jnp.clip(jnp.round(f), 0, 255).astype(jnp.uint8)
                    )
                q = quantize_resnet18(variables, [cal])
                tree = q.tree()
                if mesh is not None:
                    from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
                        replicate as _rep,
                    )

                    tree = _rep(mesh, tree)
                qstate["tree"] = tree
            return qstep(qstate["tree"], _put(imgs_u8))

        ps = grid.patch_size
        stride_px = grid.stride
        n = len(coords)
        # margins throughout; converted to probability at return if asked
        probs = np.full((n,), NON_TISSUE_MARGIN, np.float32)
        level_w, level_h = slide.level_dimensions[level]

        if warmup and qstep is None:
            # compile the step before the timed loop (a test-set run pays
            # one compile; per-slide wall-clock should not include it).
            # int8 skips this: its lazy calibration must see real tissue.
            np.asarray(
                run_batch(np.full((batch_size, ps, ps, 3), 255, np.uint8))
            )

        def read_band(iy: int) -> np.ndarray:
            """Decode one full-width grid row band (each compressed tile is
            decoded at most twice per slide instead of ~10x for per-patch
            region reads at 224-px cells over 512-px tiles)."""
            y = iy * stride_px
            h = min(ps, level_h - y)
            band = slide.read_region(grid.level0_origin(0, y), level,
                                     (level_w, h))
            if h < ps:
                full = np.full((ps, level_w, 3), 255, np.uint8)
                full[:h] = band
                band = full
            return band

        ny, nx_cells = grid.ny, grid.nx
        producer = BandProducer(ny, read_band)
        try:
          with Timer(f"predict_slide[{n} cells]", log):
            batch_imgs = np.full((batch_size, ps, ps, 3), 255, np.uint8)
            batch_pos: list[int] = []
            # Depth-k pipeline with ASYNC result copies: keep several
            # batches in flight and start each result's device→host copy
            # at dispatch time, fetching only once it falls off the
            # window. A single-batch lag with a synchronous fetch stalls
            # the host a full link round-trip per batch — on the
            # tunneled dev setup that fetch of 512 B measured ~1 s/batch
            # queued behind the next 19 MB upload (docs/PERFORMANCE.md
            # round-4 gigapixel decomposition); on real hosts it still
            # hides device latency.
            from collections import deque

            pending: deque = deque()  # (device_probs, positions)
            PIPELINE_DEPTH = 4

            def drain_one() -> None:
                prev_dev, prev_pos = pending.popleft()
                probs[prev_pos] = np.asarray(prev_dev)[: len(prev_pos)]

            def dispatch(imgs: np.ndarray, positions: list[int]) -> None:
                dev = run_batch(imgs)
                try:
                    dev.copy_to_host_async()
                except Exception:
                    pass  # not all array types expose it (e.g. sharded)
                pending.append((dev, np.asarray(positions)))
                if len(pending) > PIPELINE_DEPTH:
                    drain_one()

            while True:
                item = producer.get()
                if item is None:
                    break
                iy, band = item
                # per-cell tissue filter on the band (vectorized means)
                for ix in range(nx_cells):
                    x = ix * stride_px
                    patch = band[:, x : x + ps]
                    if patch.shape[1] < ps:
                        full = np.full((ps, ps, 3), 255, np.uint8)
                        full[:, : patch.shape[1]] = patch
                        patch = full
                    if (
                        tissue_filter == "host"
                        and patch.mean() > tissue_threshold
                    ):
                        continue
                    batch_imgs[len(batch_pos)] = patch
                    # coords_array order is x-outer / y-inner (reference
                    # enumeration): flat index = ix * ny + iy
                    batch_pos.append(ix * ny + iy)
                    if len(batch_pos) == batch_size:
                        dispatch(batch_imgs, batch_pos)
                        # fresh buffer: the dispatched one may still be in
                        # flight (host→device copy is asynchronous)
                        batch_imgs = np.full(
                            (batch_size, ps, ps, 3), 255, np.uint8
                        )
                        batch_pos = []
            if batch_pos:
                dispatch(batch_imgs, batch_pos)
            while pending:
                drain_one()
        finally:
            # stop/join BEFORE the outer finally closes the slide handle
            producer.stop()

        # scatter into the (ny, nx) grid
        stride_px = grid.stride
        nx = len({int(c[0]) for c in coords})
        ny = len({int(c[1]) for c in coords})
        out = np.full((ny, nx), NON_TISSUE_MARGIN, np.float32)
        for i, (x, y) in enumerate(coords):
            out[y // stride_px, x // stride_px] = probs[i]
        if output == "prob":
            out = sigmoid(out)
        return out, grid
    finally:
        if own:
            slide.close()


def _component_mask(
    positive: np.ndarray, sy: int, sx: int
) -> np.ndarray:
    """4-connected component of True cells containing (sy, sx), within a
    small NMS localization window (≤ (2*com_radius+1)² cells)."""
    from collections import deque

    keep = np.zeros_like(positive, bool)
    keep[sy, sx] = True
    q = deque([(sy, sx)])
    h, w = positive.shape
    while q:
        y, x = q.popleft()
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            yy, xx = y + dy, x + dx
            if 0 <= yy < h and 0 <= xx < w and positive[yy, xx] and not keep[yy, xx]:
                keep[yy, xx] = True
                q.append((yy, xx))
    return keep


def nms_detections(
    prob_grid: np.ndarray,
    grid: PatchGrid,
    threshold: float = 0.5,
    radius_cells: int = 1,
    max_detections: int = 1000,
    com_radius: int = 2,
    com_weight=None,
) -> list[tuple[float, int, int]]:
    """Greedy grid NMS → [(score, x_level0, y_level0)].

    Space-agnostic: operates on whatever monotone score the grid carries
    (probability or logit margin); ``threshold`` must be in the same space.

    Each emitted coordinate is the tumor-mass CENTROID of the
    ``(2*com_radius+1)²`` window around the peak, not the raw argmax cell
    center: a peak on a stride-``s`` grid is quantized to ±s/2, and for
    lesions near or below one patch footprint the classifier's response
    plateau is wider than the lesion itself, so the argmax center can land
    outside the lesion entirely (on the 48-slide proof set this capped
    every producer at 21/22 lesions — the official hit test
    ``evaluation_FROC.py:134`` uses only the reported point). Weights are
    the probability mass ABOVE the decision boundary
    (``max(p - 0.5, 0)``): cells the model does not call tumor carry no
    localization information, and non-tissue sentinels underflow to
    weight 0. Weights are further restricted to the 4-connected component
    of positive-weight cells containing the peak, so a weaker lesion's
    centroid is never dragged toward a distinct nearby lesion across a
    below-boundary gap. ``com_radius=2`` spans the 4-cell overlap
    footprint of one 224/56 patch; ``com_radius=0`` restores raw argmax
    centers. Centroids always weigh the ORIGINAL field, including cells
    suppressed by an earlier (necessarily ≥2 cells away) detection.
    """
    probs = prob_grid.copy()
    out: list[tuple[float, int, int]] = []
    ds = grid.downsample
    half = grid.patch_size // 2
    if com_weight is None:
        com_weight = lambda v: np.clip(v - 0.5, 0.0, None)  # noqa: E731
    weights = np.asarray(com_weight(prob_grid), np.float64)
    ny, nx = probs.shape
    while len(out) < max_detections:
        idx = np.unravel_index(np.argmax(probs), probs.shape)
        p = float(probs[idx])
        if p < threshold:
            break
        gy, gx = int(idx[0]), int(idx[1])
        cy, cx = float(gy), float(gx)
        if com_radius > 0:
            wy_lo, wy_hi = max(0, gy - com_radius), min(ny, gy + com_radius + 1)
            wx_lo, wx_hi = max(0, gx - com_radius), min(nx, gx + com_radius + 1)
            w = weights[wy_lo:wy_hi, wx_lo:wx_hi].copy()
            # a zero-weight peak (emitted below the decision boundary)
            # carries no localization information of its own and has no
            # component to restrict to — keep its argmax center rather
            # than letting a DIFFERENT lesion's residual mass inside the
            # window drag the reported point away
            if w[gy - wy_lo, gx - wx_lo] <= 0.0:
                w[:] = 0.0
            else:
                w = np.where(
                    _component_mask(w > 0.0, gy - wy_lo, gx - wx_lo), w, 0.0
                )
            total = float(w.sum())
            if total > 0.0:
                yy, xx = np.mgrid[wy_lo:wy_hi, wx_lo:wx_hi]
                cy = float((yy * w).sum() / total)
                cx = float((xx * w).sum() / total)
        x0 = int((cx * grid.stride + half) * ds)
        y0 = int((cy * grid.stride + half) * ds)
        out.append((p, x0, y0))
        y_lo, y_hi = max(0, gy - radius_cells), gy + radius_cells + 1
        x_lo, x_hi = max(0, gx - radius_cells), gx + radius_cells + 1
        # -inf, not a finite sentinel: in margin space any finite value
        # can sit above the emission threshold
        probs[y_lo:y_hi, x_lo:x_hi] = -np.inf
    return out


def write_detection_csv(
    path: str, detections: list[tuple[float, int, int]]
) -> None:
    """CSV rows ``prob,x,y`` as the FROC reader expects
    (``evaluation_FROC.py:67-88``: no header, 3 columns)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        for prob, x, y in detections:
            w.writerow([prob, x, y])


def margin_detections(
    margin_grid: np.ndarray,
    grid: PatchGrid,
    threshold: float,
    **nms_kw,
) -> list[tuple[float, int, int]]:
    """NMS on a margin grid, scores squashed for the CSV.

    ``threshold`` is in probability space (the user-facing knob); it maps
    to margin space for the floor, and emitted scores are
    :func:`margin_to_score` — rank-faithful to the margin with no float
    saturation ties (the FROC consumer sorts on this value). Centroid
    localization weights are the probability mass above the decision
    boundary, computed through the safe :func:`sigmoid` (non-tissue
    margins underflow to exactly 0).
    """
    nms_kw.setdefault(
        "com_weight", lambda m: np.clip(sigmoid(m) - 0.5, 0.0, None)
    )
    dets = nms_detections(
        margin_grid, grid, threshold=prob_to_margin(threshold), **nms_kw
    )
    return [(float(margin_to_score(m)), x, y) for m, x, y in dets]


def predict_and_export(
    slide_path: str,
    variables: dict,
    csv_dir: str,
    level: int = 3,
    threshold: float | None = None,
    **kw,
) -> tuple[np.ndarray, str]:
    """Full producer: probability grid + detection CSV for one slide."""
    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        DETECTION_PROB_THRESHOLD,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
        slide_name,
    )

    if threshold is None:
        threshold = DETECTION_PROB_THRESHOLD
    name = slide_name(os.path.basename(slide_path))
    margins, grid = predict_slide(
        slide_path, variables, level=level, output="margin", **kw
    )
    detections = margin_detections(margins, grid, threshold)
    csv_path = os.path.join(csv_dir, f"{name}.csv")
    write_detection_csv(csv_path, detections)
    log.info("%s: %d detections → %s", name, len(detections), csv_path)
    return sigmoid(margins), csv_path

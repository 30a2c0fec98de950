"""Pod-scale slide fleet inference: one slide per chip group.

The reference processes slides strictly sequentially on one GPU
(``src/main.py:1168-1225`` iterates the test set slide by slide). On a TPU
pod slice the natural layout is two-level: partition the mesh's devices into
*groups*, give each group its own slide queue, and let each group run the
mesh-sharded :func:`~..infer.sliding_window.predict_slide` on its slides —
within a group the patch grid is data-parallel over ICI, across groups the
slides are embarrassingly parallel. XLA programs on disjoint device sets
execute concurrently, so a v5e-8 with ``group_size=4`` runs two full-slide
heatmaps at once, each with 4-way sharded batches.

Host-side decode runs on one worker thread per group (the native libtiff
batch decoder is already threaded internally per read), so decode for group
A overlaps device compute for group B even on a single host.
"""

from __future__ import annotations

import os
import queue
import threading

import jax
import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    Timer,
    get_logger,
)

log = get_logger("infer.fleet")


def device_groups(group_size: int | None = None, devices=None) -> list[list]:
    """Partition devices into contiguous groups (contiguous = ICI-adjacent
    on a v5e slice's 1-D order). ``group_size=None`` → one group with all
    devices (pure within-slide sharding); ``group_size=1`` → one slide per
    chip.

    The two-level layout is mesh-native: this is the row decomposition of
    a ``(group, data)`` mesh (``parallel.mesh.make_mesh`` with
    ``shape=(-1, group_size)``) — the data axis varies fastest, so
    within-group collectives ride ICI."""
    from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
        DATA_AXIS,
        group_submeshes,
        make_mesh,
    )

    devices = list(devices if devices is not None else jax.devices())
    if group_size is None:
        return [devices]
    if group_size < 1 or len(devices) % group_size:
        raise ValueError(
            f"group_size {group_size} must divide the {len(devices)} devices"
        )
    mesh = make_mesh(
        devices=devices, axis_names=("group", DATA_AXIS),
        shape=(-1, group_size),
    )
    return [list(m.devices) for m in group_submeshes(mesh)]


def predict_slide_fleet(
    slide_paths: list[str],
    variables: dict,
    csv_dir: str,
    level: int = 3,
    group_size: int | None = None,
    threshold: float | None = None,
    devices=None,
    predict_fn=None,
    **predict_kw,
) -> dict[str, np.ndarray]:
    """Run the full detection producer over many slides concurrently.

    Returns ``{slide_path: prob_grid}``; detection CSVs land in ``csv_dir``
    (one per slide, the FROC consumer's expected layout). ``predict_kw``
    forwards to :func:`predict_slide` (``batch_size``, ``stride``,
    ``int8``, ``model``, ``input_size``, ...). ``threshold`` is the
    emission floor in probability space (default
    :data:`~..config.DETECTION_PROB_THRESHOLD`).

    ``predict_fn`` swaps the per-slide producer — signature
    ``(path, variables, mesh=..., **predict_kw) -> (grid_scores, grid)``;
    the default is the single-level :func:`predict_slide`. It is called
    with ``output="margin"`` so detection ranking survives float32
    saturation; custom producers must honor that kwarg (both built-in
    producers do). The multiscale CLI path passes the hierarchical
    producer here so fleet × multiscale composes (one slide per chip
    group, meshed within the group).
    """
    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        DETECTION_PROB_THRESHOLD,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
        slide_name,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        margin_detections,
        predict_slide,
        sigmoid,
        write_detection_csv,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
        make_mesh,
    )

    if threshold is None:
        threshold = DETECTION_PROB_THRESHOLD
    if predict_fn is None:
        def predict_fn(path, variables, *, mesh, **kw):
            return predict_slide(path, variables, level=level, mesh=mesh, **kw)

    groups = device_groups(group_size, devices)
    work: queue.Queue[str] = queue.Queue()
    for p in slide_paths:
        work.put(p)

    results: dict[str, np.ndarray] = {}
    errors: list[tuple[str, BaseException]] = []
    lock = threading.Lock()
    os.makedirs(csv_dir, exist_ok=True)

    def group_worker(gi: int, group_devices: list) -> None:
        # always a mesh (even size 1): device_put then pins this group's
        # devices, so single-chip groups don't all land on device 0
        mesh = make_mesh(num_devices=len(group_devices), devices=group_devices)
        while True:
            try:
                path = work.get_nowait()
            except queue.Empty:
                return
            # slide_name strips the full container suffix (".wsi.npz" →
            # "tumor_001") so CSVs match the FROC consumer's mask names
            name = slide_name(os.path.basename(path))
            try:
                margins, grid = predict_fn(
                    path, variables, mesh=mesh, output="margin", **predict_kw
                )
                detections = margin_detections(margins, grid, threshold)
                write_detection_csv(
                    os.path.join(csv_dir, f"{name}.csv"), detections
                )
                with lock:
                    results[path] = sigmoid(margins)
                log.info(
                    "group %d: %s → %d detections", gi, name, len(detections)
                )
            except BaseException as e:  # surface, don't hang the fleet
                with lock:
                    errors.append((path, e))
                log.error("group %d: %s failed: %s", gi, name, e)

    with Timer(f"fleet[{len(slide_paths)} slides / {len(groups)} groups]", log):
        threads = [
            threading.Thread(target=group_worker, args=(gi, g), daemon=True)
            for gi, g in enumerate(groups)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    if errors:
        path, e = errors[0]
        raise RuntimeError(
            f"{len(errors)} slide(s) failed; first: {path}"
        ) from e
    return results

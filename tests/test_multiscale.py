"""Hierarchical multiscale: co-located sampling + fusion classifier."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    DataConfig,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data import (
    extract_patches,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.multiscale import (
    MultiscaleDataset,
    join_levels,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.hierarchical import (
    HierarchicalPatchClassifier,
)


@pytest.fixture(scope="module")
def two_level_patches(synthetic_case):
    data = DataConfig(data_dir=synthetic_case)
    m2 = extract_patches(data, level=2, store_format="packed")
    m3 = extract_patches(data, level=3, store_format="packed")
    return {2: m2, 3: m3}


def test_join_levels_aligns_cells(two_level_patches):
    samples = join_levels(two_level_patches)
    assert len(samples) > 0
    for s in samples:
        rec2 = two_level_patches[2][s.indices[2]]
        rec3 = two_level_patches[3][s.indices[3]]
        assert rec2.slide == rec3.slide == s.slide
        # same level-0 origin → same field of view
        assert rec2.x * 4 == rec3.x * 8 == s.cell[0]
        assert rec2.y * 4 == rec3.y * 8 == s.cell[1]
        # label = tumor iff any level says tumor
        assert s.label == max(rec2.label, rec3.label)


def test_multiscale_dataset_batches(two_level_patches):
    ds = MultiscaleDataset(two_level_patches, resize_to=64)
    assert len(ds) > 0
    imgs, labels, valid = next(iter(ds.batches(4, shuffle=False)))
    assert set(imgs) == {2, 3}
    assert imgs[2].shape == (4, 64, 64, 3) and imgs[2].dtype == np.uint8
    assert imgs[3].shape == (4, 64, 64, 3)
    assert labels.shape == (4,) and valid.shape == (4,)


@pytest.mark.parametrize("fusion", ["concat", "attention"])
def test_hierarchical_classifier_forward(fusion):
    model = HierarchicalPatchClassifier(
        levels=(2, 3), fusion=fusion, dtype=jnp.float32
    )
    batch = {
        2: jnp.zeros((2, 64, 64, 3), jnp.float32),
        3: jnp.ones((2, 64, 64, 3), jnp.float32),
    }
    variables = model.init(jax.random.key(0), batch, train=False)
    logits = model.apply(variables, batch, train=False)
    assert logits.shape == (2, 2)
    # shared trunk: exactly one extractor's params
    assert "trunk" in variables["params"]
    assert variables["params"]["scale_embed"].shape == (2, 512)


def test_hierarchical_classifier_trains_step(two_level_patches):
    """One jitted fused train step over real multiscale batches."""
    import optax

    ds = MultiscaleDataset(two_level_patches, resize_to=64)
    model = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    imgs, labels, valid = next(iter(ds.batches(4, shuffle=True)))
    batch = {lvl: jnp.asarray(x, jnp.float32) / 255.0 for lvl, x in imgs.items()}

    variables = model.init(jax.random.key(0), batch, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, batch, labels, valid):
        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, batch,
                train=True, mutable=["batch_stats"],
            )
            from ss25_hierarchical_multiscale_image_classification_tpu.train.losses import (
                weighted_cross_entropy,
            )

            return weighted_cross_entropy(logits, labels, None, valid), upd

        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), upd["batch_stats"], opt_state, loss

    params2, _stats, _opt, loss = step(
        params, batch_stats, opt_state,
        batch, jnp.asarray(labels), jnp.asarray(valid),
    )
    assert np.isfinite(float(loss))
    assert not np.allclose(
        np.asarray(params["head_out"]["kernel"]),
        np.asarray(params2["head_out"]["kernel"]),
    )


def test_multiscale_trainer_end_to_end(two_level_patches, tmp_path, synthetic_case):
    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        Config,
        DataConfig,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.multiscale_trainer import (
        train_multiscale_classifier,
    )

    cfg = Config(
        data=DataConfig(data_dir=synthetic_case),
        models_dir=str(tmp_path / "models"),
    )
    ds = MultiscaleDataset(two_level_patches, resize_to=64)
    result = train_multiscale_classifier(
        cfg, dataset=ds, epochs=1, batch_size=8
    )
    assert result["levels"] == (2, 3)
    assert np.isfinite(result["history"][0]["loss"])
    # the artifact ships a detection-grade-selected default surface
    cal = result["calibration"]
    assert cal["combine"] in ("fusion", "ensemble", "aux")
    assert 0.0 <= cal["ensemble_weight"] <= 1.0
    import os

    assert os.path.exists(
        os.path.join(str(tmp_path / "models"), "hierarchical_classifier")
    )


def test_predict_slide_multiscale(synthetic_case, tmp_path):
    """Multiscale slide producer: co-located (2,3) cells through the fusion
    classifier → probability grid + detection CSV (the namesake capability
    wired into inference, not just training)."""
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        predict_and_export_multiscale,
        predict_slide_multiscale,
    )

    model = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    s = 64
    init = {lvl: jnp.zeros((1, s, s, 3), jnp.float32) for lvl in (2, 3)}
    variables = model.init(jax.random.key(0), init, train=False)

    slide_path = os.path.join(
        synthetic_case, "train", "img", "tumor_001.wsi.npz"
    )
    probs, grid = predict_slide_multiscale(
        slide_path, dict(variables), levels=(2, 3), stride=112,
        batch_size=4, model=model, input_size=s,
    )
    assert probs.shape == (grid.ny, grid.nx) == (2, 2)
    assert np.isfinite(probs).all()
    assert (probs >= 0).all() and (probs <= 1).all()

    _probs, csv_path = predict_and_export_multiscale(
        slide_path, dict(variables), str(tmp_path / "csv"), levels=(2, 3),
        threshold=0.0, stride=112, batch_size=4, model=model, input_size=s,
    )
    assert os.path.exists(csv_path)
    with open(csv_path) as f:
        rows = [line for line in f if line.strip()]
    assert rows  # tissue cells produced detections at threshold 0


def test_join_levels_strided_extraction():
    """Overlapping extraction (stride < patch) still joins exactly: the
    key is the level-0 origin, so half-stride cells at different levels
    pair iff their fields of view coincide."""
    from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
        PatchManifest,
        PatchRecord,
    )

    def man(level, ps, stride, n):
        m = PatchManifest()
        for i in range(n):
            m.append(PatchRecord(
                slide="s", level=level, x=i * stride, y=0,
                label=i % 2, store="png", path=f"p{level}_{i}.png",
            ))
        return m

    # level 3: ps 224, stride 112 → origins 0, 896, 1792, ...
    # level 2: ps 448, stride 224 → origins 0, 896, 1792, ...
    m3 = man(3, 224, 112, 5)
    m2 = man(2, 448, 224, 5)
    samples = join_levels({2: m2, 3: m3})
    assert len(samples) == 5
    for s in samples:
        r2, r3 = m2[s.indices[2]], m3[s.indices[3]]
        assert r2.x * 4 == r3.x * 8  # identical level-0 origin


def test_predict_slide_multiscale_int8(synthetic_case):
    """--multiscale --int8: quantized shared trunk + float fusion head
    tracks the float multiscale probabilities."""
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        predict_slide_multiscale,
    )

    model = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    s = 64
    init = {lvl: jnp.zeros((1, s, s, 3), jnp.float32) for lvl in (2, 3)}
    variables = model.init(jax.random.key(0), init, train=False)

    slide_path = os.path.join(
        synthetic_case, "train", "img", "tumor_001.wsi.npz"
    )
    kw = dict(levels=(2, 3), stride=112, batch_size=4, model=model,
              input_size=s)
    probs_f, grid = predict_slide_multiscale(
        slide_path, dict(variables), **kw
    )
    probs_q, _ = predict_slide_multiscale(
        slide_path, dict(variables), int8=True, **kw
    )
    assert probs_q.shape == probs_f.shape
    assert np.isfinite(probs_q).all()
    assert (probs_q >= 0).all() and (probs_q <= 1).all()
    # quantization keeps the probability field close to float
    tissue = probs_f > 0
    assert np.abs(probs_q[tissue] - probs_f[tissue]).max() < 0.15, (
        probs_q, probs_f,
    )


def test_predict_slide_multiscale_meshed(synthetic_case):
    """Mesh-sharded multiscale prediction (spatial data parallelism over
    the virtual 8-device mesh) matches the single-device result."""
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        predict_slide_multiscale,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
        make_mesh,
    )

    model = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    s = 64
    init = {lvl: jnp.zeros((1, s, s, 3), jnp.float32) for lvl in (2, 3)}
    variables = model.init(jax.random.key(0), init, train=False)

    slide_path = os.path.join(
        synthetic_case, "train", "img", "tumor_001.wsi.npz"
    )
    kw = dict(levels=(2, 3), stride=112, batch_size=8, model=model,
              input_size=s)
    ref, _ = predict_slide_multiscale(slide_path, dict(variables), **kw)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    got, _ = predict_slide_multiscale(
        slide_path, dict(variables), mesh=mesh, **kw
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_predict_multiscale_calibrated_components(synthetic_case):
    """One pass yields all three surfaces; in log-odds space the ensemble
    is the calibrated linear mix of fusion and per-scale-aux (round-3
    capability: calibrated detection scores for the namesake model —
    mixing happens in margin space so confident cells never tie at
    probability 1.0)."""
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        predict_slide_multiscale,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        sigmoid,
    )

    model = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    s = 64
    init = {lvl: jnp.zeros((1, s, s, 3), jnp.float32) for lvl in (2, 3)}
    variables = dict(
        model.init(jax.random.key(0), init, train=False, with_aux=True)
    )
    variables["calibration"] = {
        "temperature": 2.0, "aux_temperature": 1.5, "ensemble_weight": 0.25
    }
    slide_path = os.path.join(
        synthetic_case, "train", "img", "tumor_001.wsi.npz"
    )
    kw = dict(levels=(2, 3), stride=112, batch_size=4, model=model,
              input_size=s)
    margins, grid, mcomps = predict_slide_multiscale(
        slide_path, variables, return_components=True, output="margin", **kw
    )
    assert set(mcomps) == {
        "ensemble", "fusion", "aux", "aux_base", "ensemble_base"
    }
    np.testing.assert_allclose(margins, mcomps["ensemble"], atol=1e-6)
    np.testing.assert_allclose(
        mcomps["ensemble"],
        0.25 * mcomps["fusion"] + 0.75 * mcomps["aux"],
        atol=1e-4, rtol=1e-5,
    )
    # default ensemble_base_weight = 0.5 mix of fusion and the base aux
    np.testing.assert_allclose(
        mcomps["ensemble_base"],
        0.5 * mcomps["fusion"] + 0.5 * mcomps["aux_base"],
        atol=1e-4, rtol=1e-5,
    )
    # the surfaces differ (different heads) on at least one tissue cell
    assert not np.allclose(mcomps["fusion"], mcomps["aux"])

    # default probability output is the logistic of the margin surface
    probs, _grid2, comps = predict_slide_multiscale(
        slide_path, variables, return_components=True, **kw
    )
    assert (probs >= 0).all() and (probs <= 1).all()
    np.testing.assert_allclose(probs, sigmoid(margins), atol=1e-6)

    # combine="fusion" reports the fusion surface
    p_f, _ = predict_slide_multiscale(
        slide_path, variables, combine="fusion", **kw
    )
    np.testing.assert_allclose(p_f, comps["fusion"], atol=1e-6)


def test_predict_multiscale_pre_calibration_artifact_falls_back(
    synthetic_case,
):
    """Artifacts saved before the aux head existed still predict: combine
    modes needing aux fall back to fusion-only."""
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        predict_slide_multiscale,
    )

    model = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    s = 64
    init = {lvl: jnp.zeros((1, s, s, 3), jnp.float32) for lvl in (2, 3)}
    variables = dict(model.init(jax.random.key(0), init, train=False))
    assert "aux_head" not in variables["params"]
    slide_path = os.path.join(
        synthetic_case, "train", "img", "tumor_001.wsi.npz"
    )
    probs, grid, comps = predict_slide_multiscale(
        slide_path, variables, levels=(2, 3), stride=112, batch_size=4,
        model=model, input_size=s, return_components=True,
    )
    np.testing.assert_allclose(comps["fusion"], comps["aux"], atol=1e-6)
    np.testing.assert_allclose(probs, comps["fusion"], atol=1e-6)


def test_multiscale_augment_is_scale_consistent():
    """The same cell's levels get the SAME flip/rotation/jitter draw: feed
    identical pixels at both levels — augmented outputs must be identical
    (independent draws would almost surely flip/rotate them apart)."""
    from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
        preprocess_multiscale_batch,
    )

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (8, 32, 32, 3), np.uint8)
    out = preprocess_multiscale_batch(
        jax.random.key(1), {2: jnp.asarray(imgs), 3: jnp.asarray(imgs)},
        training=True,
    )
    np.testing.assert_allclose(
        np.asarray(out[2]), np.asarray(out[3]), atol=1e-5
    )
    # and it actually augments: differs from plain normalization
    ev = preprocess_multiscale_batch(
        jax.random.key(1), {2: jnp.asarray(imgs)}, training=False
    )
    assert not np.allclose(np.asarray(out[2]), np.asarray(ev[2]), atol=1e-3)


def test_multiscale_warm_start_from_classifier():
    """Trunk and aux head seed from a single-level classifier artifact;
    fusion head stays fresh. Logit parity: the warm-started aux logits at
    zero scale-embedding must equal the classifier's own logits."""
    from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
        ResNet18Classifier,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.multiscale_trainer import (
        warm_start_from_classifier,
    )

    clf = ResNet18Classifier(dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (2, 64, 64, 3), np.uint8),
        jnp.float32,
    )
    clf_vars = clf.init(jax.random.key(0), x, train=False)

    model = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    init = {lvl: jnp.zeros((1, 64, 64, 3), jnp.float32) for lvl in (2, 3)}
    variables = model.init(jax.random.key(1), init, train=False,
                           with_aux=True)
    params, batch_stats = warm_start_from_classifier(
        dict(variables["params"]), dict(variables["batch_stats"]),
        {"params": dict(clf_vars["params"]),
         "batch_stats": dict(clf_vars["batch_stats"])},
    )
    # trunk copied exactly
    np.testing.assert_array_equal(
        np.asarray(params["trunk"]["stem_conv"]["kernel"]),
        np.asarray(clf_vars["params"]["stem_conv"]["kernel"]),
    )
    # aux head == classifier fc
    np.testing.assert_array_equal(
        np.asarray(params["aux_head"]["kernel"]),
        np.asarray(clf_vars["params"]["fc"]["kernel"]),
    )
    # fusion head untouched
    np.testing.assert_array_equal(
        np.asarray(params["head_out"]["kernel"]),
        np.asarray(variables["params"]["head_out"]["kernel"]),
    )
    # functional parity: zero the scale embedding → aux logits per scale
    # equal the classifier's logits on the same input
    params_z = dict(params)
    params_z["scale_embed"] = jnp.zeros_like(params["scale_embed"])
    clf_logits = clf.apply(clf_vars, x, train=False)
    out, aux = model.apply(
        {"params": params_z, "batch_stats": batch_stats},
        {2: x, 3: x}, train=False, with_aux=True,
    )
    np.testing.assert_allclose(
        np.asarray(aux[:, 0]), np.asarray(clf_logits), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(aux[:, 1]), np.asarray(clf_logits), atol=1e-4
    )


def test_multiscale_trainer_auto_warm_start(two_level_patches, tmp_path,
                                            synthetic_case):
    """With a ``resnet18_patch_classifier`` artifact present, the trainer
    auto-seeds trunk+aux from it (reference encoder-reuse semantics)."""
    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        Config,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
        ResNet18Classifier,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.checkpoints import (
        model_artifact_path,
        save_model,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.multiscale_trainer import (
        train_multiscale_classifier,
    )

    models_dir = str(tmp_path / "models")
    clf = ResNet18Classifier(dtype=jnp.float32)
    clf_vars = clf.init(
        jax.random.key(3), jnp.zeros((1, 64, 64, 3), jnp.float32),
        train=False,
    )
    save_model(
        model_artifact_path(models_dir, "resnet18_patch_classifier"),
        {"params": jax.device_get(dict(clf_vars["params"])),
         "batch_stats": jax.device_get(dict(clf_vars["batch_stats"]))},
    )
    cfg = Config(
        data=DataConfig(data_dir=synthetic_case), models_dir=models_dir
    )
    ds = MultiscaleDataset(two_level_patches, resize_to=64)
    result = train_multiscale_classifier(
        cfg, dataset=ds, epochs=1, batch_size=8
    )
    assert np.isfinite(result["history"][0]["loss"])


def test_predict_multiscale_auto_honors_calibrated_combine(synthetic_case):
    """combine="auto" must report the surface the artifact's calibration
    selected (round-3 fix: pooled-AUC ensemble selection shipped a default
    surface that lost to its own fusion component on test FROC)."""
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        predict_slide_multiscale,
    )

    model = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    s = 64
    init = {lvl: jnp.zeros((1, s, s, 3), jnp.float32) for lvl in (2, 3)}
    variables = dict(
        model.init(jax.random.key(0), init, train=False, with_aux=True)
    )
    variables["calibration"] = {
        "temperature": 2.0, "aux_temperature": 1.5,
        "ensemble_weight": 1.0, "combine": "fusion",
    }
    slide_path = os.path.join(
        synthetic_case, "train", "img", "tumor_001.wsi.npz"
    )
    kw = dict(levels=(2, 3), stride=112, batch_size=4, model=model,
              input_size=s)
    probs, _grid, comps = predict_slide_multiscale(
        slide_path, variables, return_components=True, **kw
    )
    np.testing.assert_allclose(probs, comps["fusion"], atol=1e-6)
    assert not np.allclose(comps["fusion"], comps["aux"])


def test_predict_multiscale_cascade(synthetic_case):
    """Hierarchical cascade inference: with a floor every tissue cell
    clears, the two-pass result is IDENTICAL to the full fused pass; with
    a selective floor, surviving cells carry their full fused values and
    screened-out tissue cells carry the base-level screen margin (the
    aux_base surface) in every column."""
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        predict_slide_multiscale,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        NON_TISSUE_MARGIN,
        sigmoid,
    )

    model = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    s = 64
    init = {lvl: jnp.zeros((1, s, s, 3), jnp.float32) for lvl in (2, 3)}
    variables = dict(
        model.init(jax.random.key(0), init, train=False, with_aux=True)
    )
    variables["calibration"] = {
        "temperature": 2.0, "aux_temperature": 1.5, "ensemble_weight": 0.25
    }
    slide_path = os.path.join(
        synthetic_case, "train", "img", "tumor_001.wsi.npz"
    )
    kw = dict(levels=(2, 3), stride=112, batch_size=4, model=model,
              input_size=s, output="margin", return_components=True)
    full, grid, fcomps = predict_slide_multiscale(slide_path, variables, **kw)

    # floor ~0: every tissue cell survives -> bit-identical surfaces
    casc, _, ccomps = predict_slide_multiscale(
        slide_path, variables, cascade=1e-9, **kw
    )
    for k in fcomps:
        np.testing.assert_array_equal(fcomps[k], ccomps[k])

    # a floor BETWEEN two distinct sorted tissue probabilities near the
    # median: some cells screened out, and no cell sits exactly on the
    # boundary (robust to ~1e-7 drift between screen and fused programs)
    tissue = fcomps["aux_base"] > NON_TISSUE_MARGIN
    u = np.unique(sigmoid(fcomps["aux_base"][tissue]))
    assert len(u) >= 2
    k = len(u) // 2
    floor = float(0.5 * (u[k - 1] + u[k]))
    sel, _, scomps = predict_slide_multiscale(
        slide_path, variables, cascade=floor, **kw
    )
    survived = tissue & (sigmoid(fcomps["aux_base"]) >= floor)
    screened = tissue & ~survived
    assert screened.any() and survived.any()
    for k in fcomps:
        # survivors: full fused values
        np.testing.assert_allclose(
            scomps[k][survived], fcomps[k][survived], atol=1e-5
        )
    # screened out: the screen margin ONLY in aux_base and the selected
    # output column (ensemble here — the pre-mode-selection default);
    # other component surfaces stay non-tissue so exported CSVs never mix
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        NON_TISSUE_MARGIN as NTM,
    )

    for k in ("aux_base", "ensemble"):
        np.testing.assert_allclose(
            scomps[k][screened], fcomps["aux_base"][screened], atol=1e-5
        )
    for k in ("fusion", "aux", "ensemble_base"):
        np.testing.assert_array_equal(
            scomps[k][screened], np.full(int(screened.sum()), NTM)
        )
    # non-tissue untouched
    np.testing.assert_array_equal(
        scomps["fusion"][~tissue], fcomps["fusion"][~tissue]
    )


def test_predict_multiscale_cascade_int8_artifact(synthetic_case):
    """--cascade with --int8 and a persisted quantization artifact: the
    screen runs the quantized trunk; a floor every cell clears reproduces
    the full int8 two-level pass exactly."""
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        predict_slide_multiscale,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
        quantize_resnet18,
    )

    model = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    s = 64
    init = {lvl: jnp.zeros((1, s, s, 3), jnp.float32) for lvl in (2, 3)}
    variables = dict(
        model.init(jax.random.key(0), init, train=False, with_aux=True)
    )
    variables["calibration"] = {"temperature": 1.0, "aux_temperature": 1.0,
                                "ensemble_weight": 0.5}
    rng = np.random.default_rng(0)
    calib = [rng.integers(0, 256, (8, s, s, 3), dtype=np.uint8)]
    qtree = quantize_resnet18(
        {"params": variables["params"]["trunk"],
         "batch_stats": variables["batch_stats"]["trunk"]},
        calib,
    ).tree()
    slide_path = os.path.join(
        synthetic_case, "train", "img", "tumor_001.wsi.npz"
    )
    kw = dict(levels=(2, 3), stride=112, batch_size=4, model=model,
              input_size=s, int8=True, qtree=qtree, output="margin")
    full, _ = predict_slide_multiscale(slide_path, variables, **kw)
    casc, _ = predict_slide_multiscale(
        slide_path, variables, cascade=1e-9, **kw
    )
    np.testing.assert_array_equal(full, casc)


def test_predict_multiscale_cascade_auto_operating_point(synthetic_case):
    """``cascade="auto"`` uses the artifact's fitted screen-margin floor;
    artifacts without one fall back to the full pass with a log line."""
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        predict_slide_multiscale,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        NON_TISSUE_MARGIN,
    )

    model = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    s = 64
    init = {lvl: jnp.zeros((1, s, s, 3), jnp.float32) for lvl in (2, 3)}
    variables = dict(
        model.init(jax.random.key(0), init, train=False, with_aux=True)
    )
    variables["calibration"] = {
        "temperature": 2.0, "aux_temperature": 1.5, "ensemble_weight": 0.25
    }
    slide_path = os.path.join(
        synthetic_case, "train", "img", "tumor_001.wsi.npz"
    )
    kw = dict(levels=(2, 3), stride=112, batch_size=4, model=model,
              input_size=s, output="margin", return_components=True)
    full, _, fcomps = predict_slide_multiscale(slide_path, variables, **kw)

    # no fitted operating point -> auto degrades to the full pass
    auto_missing, _, mcomps = predict_slide_multiscale(
        slide_path, variables, cascade="auto", **kw
    )
    np.testing.assert_array_equal(full, auto_missing)

    # fit a floor BETWEEN two distinct sorted screen margins near the
    # median (a floor AT a data point would make the boundary cell's
    # side depend on ~1e-7 drift between the screen and fused programs)
    tissue = fcomps["aux_base"] > NON_TISSUE_MARGIN
    u = np.unique(fcomps["aux_base"][tissue])
    assert len(u) >= 2
    k = len(u) // 2
    floor = float(0.5 * (u[k - 1] + u[k]))
    variables["calibration"]["cascade_margin"] = floor
    sel, _, scomps = predict_slide_multiscale(
        slide_path, variables, cascade="auto", **kw
    )
    survived = tissue & (fcomps["aux_base"] >= floor)
    screened = tissue & ~survived
    assert survived.any() and screened.any()
    np.testing.assert_allclose(
        scomps["fusion"][survived], fcomps["fusion"][survived], atol=1e-5
    )
    # screened-out cells: fusion stays non-tissue; aux_base carries the
    # screen margin
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        NON_TISSUE_MARGIN as NTM,
    )

    np.testing.assert_array_equal(
        scomps["fusion"][screened], np.full(int(screened.sum()), NTM)
    )
    np.testing.assert_allclose(
        scomps["aux_base"][screened], fcomps["aux_base"][screened],
        atol=1e-5,
    )


def test_predict_multiscale_autodetects_attention_artifact(synthetic_case):
    """Prediction rebuilds the fusion mode from the artifact's params
    (attention artifacts carry attn_v/attn_w), so the CLI serves either
    mode without a flag that could contradict the checkpoint."""
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        predict_slide_multiscale,
    )

    model = HierarchicalPatchClassifier(
        levels=(2, 3), fusion="attention", dtype=jnp.float32
    )
    s = 64
    init = {lvl: jnp.zeros((1, s, s, 3), jnp.float32) for lvl in (2, 3)}
    variables = dict(
        model.init(jax.random.key(0), init, train=False, with_aux=True)
    )
    slide_path = os.path.join(
        synthetic_case, "train", "img", "tumor_001.wsi.npz"
    )
    # model=None: must auto-detect attention from the params
    probs, grid = predict_slide_multiscale(
        slide_path, variables, levels=(2, 3), stride=112, batch_size=4,
        input_size=s,
    )
    assert probs.shape == (grid.ny, grid.nx)
    assert np.isfinite(probs).all()
    assert (probs >= 0).all() and (probs <= 1).all()


def test_predict_multiscale_cascade_meshed(synthetic_case):
    """Cascade x mesh composition: the two-pass producer sharded over the
    virtual 8-device mesh matches the single-device cascade run (screen
    batches and fused batches both ride the data axis)."""
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        predict_slide_multiscale,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        NON_TISSUE_MARGIN,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
        make_mesh,
    )

    model = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    s = 64
    init = {lvl: jnp.zeros((1, s, s, 3), jnp.float32) for lvl in (2, 3)}
    variables = dict(
        model.init(jax.random.key(0), init, train=False, with_aux=True)
    )

    slide_path = os.path.join(
        synthetic_case, "train", "img", "tumor_001.wsi.npz"
    )
    kw = dict(levels=(2, 3), stride=112, batch_size=8, model=model,
              input_size=s, output="margin")
    # pick a floor between distinct screen margins so both runs partition
    # the cells identically
    _, _, comps = predict_slide_multiscale(
        slide_path, variables, return_components=True, **kw
    )
    tissue = comps["aux_base"] > NON_TISSUE_MARGIN
    u = np.unique(comps["aux_base"][tissue])
    variables["calibration"] = {
        "cascade_margin": float(0.5 * (u[len(u) // 2 - 1] + u[len(u) // 2]))
    }
    ref, _ = predict_slide_multiscale(
        slide_path, variables, cascade="auto", **kw
    )
    mesh = make_mesh()
    assert mesh.devices.size == 8
    got, _ = predict_slide_multiscale(
        slide_path, variables, cascade="auto", mesh=mesh, **kw
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_multiscale_dataset_crop_mode(two_level_patches):
    """input_mode="crop": the finer level keeps NATIVE magnification (center
    crop) instead of box-resizing — which at the standard 2x ratio composes
    to the coarse level's own box average (fine stream redundant)."""
    ds_c = MultiscaleDataset(
        two_level_patches, resize_to=64, input_mode="crop"
    )
    ds_r = MultiscaleDataset(two_level_patches, resize_to=64)
    imgs_c, labels_c = ds_c.read_batch([0, 1])
    imgs_r, labels_r = ds_r.read_batch([0, 1])
    np.testing.assert_array_equal(labels_c, labels_r)
    for lvl in (2, 3):
        assert imgs_c[lvl].shape == imgs_r[lvl].shape == (2, 64, 64, 3)
    # fine level: exact center crop of the native patch, no resampling
    rows = [ds_c.samples[i].indices[2] for i in (0, 1)]
    native = ds_c.readers[2].read_batch(rows)
    assert native.shape[1] > 64
    off = (native.shape[1] - 64) // 2
    np.testing.assert_array_equal(
        imgs_c[2], native[:, off:off + 64, off:off + 64]
    )
    # base level is input-sized the same way in both modes
    np.testing.assert_array_equal(imgs_c[3], imgs_r[3])
    with pytest.raises(ValueError):
        MultiscaleDataset(two_level_patches, input_mode="zoom")


def test_prob_step_crop_matches_host_crop():
    """The in-step device crop lands on the same pixels the dataset's host
    crop does: crop-mode step on native fine patches == resize-mode step on
    host-pre-cropped fine patches (resize is identity at equal size)."""
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        make_prob_step_multiscale,
    )

    s = 64
    model = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    init = {lvl: jnp.zeros((1, s, s, 3), jnp.float32) for lvl in (2, 3)}
    variables = model.init(jax.random.key(0), init, train=False)
    params, bstats = variables["params"], variables["batch_stats"]

    rng = np.random.default_rng(0)
    fine = rng.integers(0, 256, (2, 2 * s, 2 * s, 3), dtype=np.uint8)
    coarse = rng.integers(0, 256, (2, s, s, 3), dtype=np.uint8)
    off = (2 * s - s) // 2
    pre = np.ascontiguousarray(fine[:, off:off + s, off:off + s])

    step_crop = make_prob_step_multiscale(
        model, (2, 3), input_size=s, input_mode="crop"
    )
    step_id = make_prob_step_multiscale(
        model, (2, 3), input_size=s, input_mode="resize"
    )
    out_crop = step_crop(
        params, bstats, {2: jnp.asarray(fine), 3: jnp.asarray(coarse)}
    )
    out_pre = step_id(
        params, bstats, {2: jnp.asarray(pre), 3: jnp.asarray(coarse)}
    )
    np.testing.assert_allclose(
        np.asarray(out_crop), np.asarray(out_pre), rtol=1e-5, atol=1e-5
    )


def test_multiscale_trainer_records_input_mode(
    two_level_patches, tmp_path, synthetic_case
):
    """The artifact must record crop vs resize (serving rebuilds the same
    fine-stream semantics from calibration["input_mode"])."""
    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        Config,
        DataConfig,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.multiscale_trainer import (
        train_multiscale_classifier,
    )

    cfg = Config(
        data=DataConfig(data_dir=synthetic_case),
        models_dir=str(tmp_path / "models_crop"),
    )
    ds = MultiscaleDataset(
        two_level_patches, resize_to=64, input_mode="crop"
    )
    result = train_multiscale_classifier(
        cfg, dataset=ds, epochs=1, batch_size=8
    )
    assert result["calibration"]["input_mode"] == 1

    from ss25_hierarchical_multiscale_image_classification_tpu.train.checkpoints import (
        load_model,
        model_artifact_path,
    )

    saved = load_model(
        model_artifact_path(
            str(tmp_path / "models_crop"), "hierarchical_classifier"
        )
    )
    assert int(saved["calibration"]["input_mode"]) == 1


def test_deep_supervision_pairs_labels_sample_major():
    """(B, S, C) aux logits flatten sample-major — the aux CE must repeat
    labels (row r ↔ sample r // S), never tile them (row r ↔ sample r % B,
    which pairs almost every row with the wrong sample's label)."""
    from ss25_hierarchical_multiscale_image_classification_tpu.train.multiscale_trainer import (
        deep_supervision_loss,
    )

    b, s, c = 8, 3, 2
    labels = jnp.arange(b) % c
    valid = jnp.ones((b,), jnp.float32)
    # every scale's logits strongly favor the sample's own label
    one_hot = jax.nn.one_hot(labels, c) * 20.0
    aux = jnp.broadcast_to(one_hot[:, None, :], (b, s, c))

    loss_correct = float(deep_supervision_loss(aux, labels, None, valid))
    assert loss_correct < 1e-3

    # the tile pairing would have scored this same aux as near-chance
    flat = aux.reshape(-1, c)
    tiled = jnp.tile(labels, s)
    from ss25_hierarchical_multiscale_image_classification_tpu.train.losses import (
        weighted_cross_entropy,
    )
    loss_tiled = float(weighted_cross_entropy(flat, tiled, None,
                                              jnp.tile(valid, s)))
    assert loss_tiled > 1.0

    # masked (wrap-pad) rows: only the invalid SAMPLE's scale rows drop out
    valid2 = valid.at[0].set(0.0)
    bad_row = aux.at[0, :, :].set(
        jax.nn.one_hot(1 - labels[0], c)[None, :] * 20.0
    )
    loss_masked = float(deep_supervision_loss(bad_row, labels, None, valid2))
    assert loss_masked < 1e-3


def test_predict_multiscale_cascade_bailout(synthetic_case):
    """Mid-flight bailout: a floor that keeps (nearly) every probed cell
    means the screen is uninformative on this slide — the cascade
    abandons the screen pass and returns the FULL fused surfaces
    (recall-safe worst case, bounding the gigapixel negative in
    docs/PERFORMANCE.md). ``cascade_bailout >= 1`` restores the
    screen-everything behavior."""
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        predict_slide_multiscale,
    )

    model = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    s = 64
    init = {lvl: jnp.zeros((1, s, s, 3), jnp.float32) for lvl in (2, 3)}
    variables = dict(
        model.init(jax.random.key(0), init, train=False, with_aux=True)
    )
    variables["calibration"] = {
        "temperature": 2.0, "aux_temperature": 1.5, "ensemble_weight": 0.25
    }
    slide_path = os.path.join(
        synthetic_case, "train", "img", "tumor_001.wsi.npz"
    )
    kw = dict(levels=(2, 3), stride=112, batch_size=4, model=model,
              input_size=s, output="margin", return_components=True)
    full, grid, fcomps = predict_slide_multiscale(slide_path, variables, **kw)

    # keep-everything floor + probe on: the bailout fires once the probe
    # sample (a quarter of this small grid) is in, and the result is the
    # full fused pass on EVERY component — no screen-margin fill anywhere
    casc, _, ccomps = predict_slide_multiscale(
        slide_path, variables, cascade=1e-9, cascade_bailout=0.6, **kw
    )
    for k in fcomps:
        np.testing.assert_array_equal(fcomps[k], ccomps[k])

    # probe disabled: identical surfaces too (keep-everything floor),
    # via the screen-everything code path of round 2
    off, _, ocomps = predict_slide_multiscale(
        slide_path, variables, cascade=1e-9, cascade_bailout=1.0, **kw
    )
    for k in fcomps:
        np.testing.assert_array_equal(fcomps[k], ocomps[k])

    # a selective floor (median) keeps ~half the tissue — BELOW the 0.6
    # bailout — so the cascade still screens: screened-out cells stay
    # non-tissue in the fusion component (the cascade actually ran)
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        NON_TISSUE_MARGIN as NTM,
        sigmoid,
    )

    tissue = fcomps["aux_base"] > NTM
    u = np.unique(sigmoid(fcomps["aux_base"][tissue]))
    assert len(u) >= 2
    k = len(u) // 2
    floor = float(0.5 * (u[k - 1] + u[k]))
    sel, _, scomps = predict_slide_multiscale(
        slide_path, variables, cascade=floor, cascade_bailout=0.6, **kw
    )
    screened = tissue & (sigmoid(fcomps["aux_base"]) < floor)
    if screened.any():
        np.testing.assert_array_equal(
            scomps["fusion"][screened],
            np.full(int(screened.sum()), NTM),
        )


def test_predict_multiscale_cascade_end_of_screen_bailout(synthetic_case):
    """When the screen finishes before the probe's sample floor is met
    (batch_size bigger than the slide's tissue), the same survivor-rate
    test applies to the final tally: a keep-everything floor bails and
    every component carries the full fused surface."""
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        predict_slide_multiscale,
    )

    model = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    s = 64
    init = {lvl: jnp.zeros((1, s, s, 3), jnp.float32) for lvl in (2, 3)}
    variables = dict(
        model.init(jax.random.key(0), init, train=False, with_aux=True)
    )
    variables["calibration"] = {
        "temperature": 2.0, "aux_temperature": 1.5, "ensemble_weight": 0.25
    }
    slide_path = os.path.join(
        synthetic_case, "train", "img", "tumor_001.wsi.npz"
    )
    # batch_size chosen so 2 * batch_size > tissue cells: the mid-flight
    # probe can never arm, so only the end-of-screen check can bail
    kw = dict(levels=(2, 3), stride=112, batch_size=64, model=model,
              input_size=s, output="margin", return_components=True)
    full, grid, fcomps = predict_slide_multiscale(slide_path, variables, **kw)
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        NON_TISSUE_MARGIN,
    )

    assert (fcomps["fusion"] > NON_TISSUE_MARGIN).sum() < 128, (
        "fixture grew: tissue must stay under 2*batch_size for this test"
    )
    casc, _, ccomps = predict_slide_multiscale(
        slide_path, variables, cascade=1e-9, cascade_bailout=0.6, **kw
    )
    for k in fcomps:
        np.testing.assert_array_equal(fcomps[k], ccomps[k])


def test_cascade_tissue_shift_bailout_regression(tmp_path):
    """Tissue-shift regression gate (the measured round-3 gigapixel
    negative): a cascade floor fitted on tissue A transfers badly to
    tissue B with different statistics — most of B survives the screen,
    making it pure overhead. The bailout probe must catch this and the
    deployed surfaces must equal the full fused pass (recall holds)."""
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        predict_slide_multiscale,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        NON_TISSUE_MARGIN,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
        tumor_spec,
        write_synthetic_case,
    )

    root = str(tmp_path)
    # fabricator A: the calibration tissue; fabricator B: same geometry,
    # different texture statistics (higher stain noise)
    path_a = write_synthetic_case(
        root, "tumor_a",
        tumor_spec(width=3584, height=2688, tissue_radii=(0.46, 0.46),
                   seed=5, noise=6.0),
    )
    path_b = write_synthetic_case(
        root, "tumor_b",
        tumor_spec(width=3584, height=2688, tissue_radii=(0.46, 0.46),
                   seed=9, noise=28.0),
    )

    model = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    s = 64
    init = {lvl: jnp.zeros((1, s, s, 3), jnp.float32) for lvl in (2, 3)}
    variables = dict(
        model.init(jax.random.key(3), init, train=False, with_aux=True)
    )
    variables["calibration"] = {
        "temperature": 2.0, "aux_temperature": 1.5, "ensemble_weight": 0.5
    }
    kw = dict(levels=(2, 3), stride=112, batch_size=4, model=model,
              input_size=s, output="margin", return_components=True)

    # "fit" the operating point on A: scan plausible operating quantiles
    # (screen 45% .. 10% of A's tissue) for one that fails to transfer —
    # keeps more of B than the bailout threshold. Such a floor is exactly
    # the scenario the gate exists for; with different tissue statistics
    # one always exists unless the two margin distributions coincide.
    _, _, comps_a = predict_slide_multiscale(path_a, variables, **kw)
    ma = comps_a["aux_base"]
    ma_tissue = ma[ma > NON_TISSUE_MARGIN]

    full_b, _, comps_b = predict_slide_multiscale(path_b, variables, **kw)
    mb = comps_b["aux_base"]
    mb_tissue = mb[mb > NON_TISSUE_MARGIN]

    floor = None
    # quantile floors, then the production fit's own form (min reference
    # minus a safety fraction of the spread — fit_cascade_margin)
    cands = [float(np.quantile(ma_tissue, q)) for q in (0.45, 0.3, 0.15)]
    cands.append(float(ma_tissue.min()) - 0.1 * float(np.std(ma_tissue)))
    for cand in cands:
        if float((mb_tissue >= cand).mean()) > 0.6:
            floor = cand
            break
    assert floor is not None, (
        "fixture drift: no A-fitted operating quantile fails to transfer "
        f"to B (A margins {np.sort(ma_tissue)}, B margins "
        f"{np.sort(mb_tissue)})"
    )
    variables["calibration"]["cascade_margin"] = floor

    # deploy on B with the production cascade: the probe must bail and
    # every component must carry the full fused surface (recall-safe)
    casc_b, _, casc_comps = predict_slide_multiscale(
        path_b, variables, cascade="auto", **kw
    )
    np.testing.assert_array_equal(casc_b, full_b)
    for k in comps_b:
        np.testing.assert_array_equal(comps_b[k], casc_comps[k])

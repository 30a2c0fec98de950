"""Model layer: shapes, head-strip semantics, NT-Xent parity, MIL masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ss25_hierarchical_multiscale_image_classification_tpu.models import (
    CNNEncoder,
    MILClassifier,
    ResNet18Classifier,
    ResNet18FeatureExtractor,
    SimCLRModel,
    UnifiedResNet,
    UNetClassifier,
    nt_xent_loss,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.mil import (
    pad_bag,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
    merge_trunk,
    strip_head,
)


@pytest.fixture(scope="module")
def resnet18_vars():
    model = ResNet18Classifier(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    return model, model.init(jax.random.key(0), x, train=False)


def test_resnet18_classifier_shapes(resnet18_vars):
    model, variables = resnet18_vars
    x = jnp.zeros((2, 64, 64, 3))
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 2)
    assert logits.dtype == jnp.float32


def test_resnet18_feature_extractor_512(resnet18_vars):
    _, cls_vars = resnet18_vars
    fx = ResNet18FeatureExtractor(dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3))
    fx_vars = fx.init(jax.random.key(0), x, train=False)
    feats = fx.apply(fx_vars, x, train=False)
    assert feats.shape == (2, 512)

    # fc-strip merge: classifier trunk → extractor (resnet.py:27-31 semantics)
    stripped = strip_head(
        {k: dict(v) for k, v in cls_vars.items()}
    )
    merged = merge_trunk(
        {k: dict(v) for k, v in fx_vars.items()}, stripped
    )
    feats2 = fx.apply(merged, x, train=False)
    assert feats2.shape == (2, 512)


def test_unified_resnet_modes():
    assert UnifiedResNet("features").num_classes is None
    assert UnifiedResNet("classifier", num_classes=2).num_classes == 2
    with pytest.raises(ValueError):
        UnifiedResNet("nope")


def test_resnet18_train_mode_updates_batch_stats(resnet18_vars):
    model, variables = resnet18_vars
    x = jnp.ones((2, 64, 64, 3))
    _, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    old = variables["batch_stats"]["stem_norm"]["mean"]
    new = mutated["batch_stats"]["stem_norm"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_simclr_model_shapes():
    model = SimCLRModel(dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    z = model.apply(variables, x, train=False)
    assert z.shape == (2, 128)
    h = model.apply(variables, x, train=False, method=model.encode)
    assert h.shape == (2, 512)


def _reference_nt_xent(z_i, z_j, tau=0.5):
    """Direct transcription of the math (simclr.py:31-54) in numpy."""
    z = np.concatenate([z_i, z_j])
    z = z / np.linalg.norm(z, axis=1, keepdims=True)
    sim = z @ z.T / tau
    np.fill_diagonal(sim, -1e9)
    n = len(z_i)
    pos = np.concatenate([np.diag(sim, n), np.diag(sim, -n)])
    lse = np.log(np.exp(sim).sum(axis=1))
    return float(np.mean(-pos + lse))


def test_nt_xent_matches_reference_math():
    rng = np.random.default_rng(0)
    z_i = rng.normal(size=(16, 32)).astype(np.float32)
    z_j = rng.normal(size=(16, 32)).astype(np.float32)
    ours = float(nt_xent_loss(jnp.asarray(z_i), jnp.asarray(z_j)))
    ref = _reference_nt_xent(z_i, z_j)
    assert ours == pytest.approx(ref, rel=1e-4)


def test_nt_xent_sharded_equals_global():
    """The all-gather NT-Xent on an 8-device mesh must equal the single-
    device loss on the same global batch."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    devices = jax.devices()
    assert len(devices) == 8, "conftest must force 8 virtual devices"
    mesh = Mesh(np.array(devices), ("data",))

    rng = np.random.default_rng(1)
    z_i = rng.normal(size=(32, 16)).astype(np.float32)
    z_j = rng.normal(size=(32, 16)).astype(np.float32)

    global_loss = float(nt_xent_loss(jnp.asarray(z_i), jnp.asarray(z_j)))

    sharded = shard_map(
        lambda a, b: nt_xent_loss(a, b, axis_name="data"),
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P(),
    )
    sharded_loss = float(jax.jit(sharded)(jnp.asarray(z_i), jnp.asarray(z_j)))
    assert sharded_loss == pytest.approx(global_loss, rel=1e-4)


def test_mil_classifier_mask_invariance():
    """Padded slots must not affect attention-pooled logits."""
    model = MILClassifier(pooling="attention")
    k, d = 8, 32
    feats = np.random.default_rng(0).normal(size=(1, k, d)).astype(np.float32)
    mask = np.ones((1, k), bool)
    variables = model.init(jax.random.key(0), jnp.asarray(feats), jnp.asarray(mask))

    logits_a, attn = model.apply(variables, jnp.asarray(feats), jnp.asarray(mask))
    # pad with garbage rows, masked out
    feats_pad = np.concatenate(
        [feats, 99.0 * np.ones((1, 4, d), np.float32)], axis=1
    )
    mask_pad = np.concatenate([mask, np.zeros((1, 4), bool)], axis=1)
    logits_b, attn_b = model.apply(
        variables, jnp.asarray(feats_pad), jnp.asarray(mask_pad)
    )
    np.testing.assert_allclose(
        np.asarray(logits_a), np.asarray(logits_b), atol=1e-5
    )
    assert np.asarray(attn_b)[0, k:].max() < 1e-6


@pytest.mark.parametrize("pooling", ["mean", "max"])
def test_mil_pooling_variants(pooling):
    model = MILClassifier(pooling=pooling)
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, 16)), jnp.float32)
    mask = jnp.ones((2, 6), bool)
    variables = model.init(jax.random.key(0), feats, mask)
    logits, attn = model.apply(variables, feats, mask)
    assert logits.shape == (2, 2)
    assert attn is None


def test_pad_bag():
    feats = np.arange(20, dtype=np.float32).reshape(10, 2)
    padded, mask = pad_bag(feats, 16)
    assert padded.shape == (16, 2) and mask.sum() == 10
    truncated, mask2 = pad_bag(feats, 4)
    assert truncated.shape == (4, 2) and mask2.all()
    assert truncated[0, 0] == 0.0 and truncated[-1, 0] == 18.0  # strided


def test_cnn_encoder_projection():
    model = CNNEncoder(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 512)


def test_unet_classifier():
    model = UNetClassifier(num_classes=10, features=(8, 16), dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x)
    logits = model.apply(variables, x)
    assert logits.shape == (1, 10)


def test_torch_import_roundtrip():
    """Fabricate a torchvision-shaped state dict and verify conversion."""
    torch = pytest.importorskip("torch")
    from ss25_hierarchical_multiscale_image_classification_tpu.models.torch_import import (
        from_torch_state_dict,
    )

    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = torch.randn(o, i, k, k)

    def bn(name, c):
        sd[f"{name}.weight"] = torch.randn(c)
        sd[f"{name}.bias"] = torch.randn(c)
        sd[f"{name}.running_mean"] = torch.randn(c)
        sd[f"{name}.running_var"] = torch.rand(c) + 0.5

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    chans = {1: 64, 2: 128, 3: 256, 4: 512}
    for stage in range(1, 5):
        c = chans[stage]
        c_in = chans.get(stage - 1, 64)
        for block in range(2):
            p = f"layer{stage}.{block}"
            conv(f"{p}.conv1", c, c if block or stage == 1 else c_in, 3)
            bn(f"{p}.bn1", c)
            conv(f"{p}.conv2", c, c, 3)
            bn(f"{p}.bn2", c)
            if stage > 1 and block == 0:
                conv(f"{p}.downsample.0", c, c_in, 1)
                bn(f"{p}.downsample.1", c)
    sd["fc.weight"] = torch.randn(2, 512)
    sd["fc.bias"] = torch.randn(2)
    # simulate a reference DataParallel checkpoint prefix (main.py:481-482)
    sd = {f"module.{k}": v for k, v in sd.items()}

    variables = from_torch_state_dict(sd)
    model = ResNet18Classifier(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    ref_vars = model.init(jax.random.key(0), x, train=False)

    # converted tree must be shape-compatible with the model's own init
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_vars)
    converted = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    flat_conv = dict(
        (jax.tree_util.keystr(p), v.shape)
        for p, v in jax.tree_util.tree_leaves_with_path(converted)
    )
    for path, leaf in flat_ref:
        key = jax.tree_util.keystr(path)
        assert key in flat_conv, f"missing converted leaf {key}"
        assert flat_conv[key] == leaf.shape, f"shape mismatch at {key}"

    logits = model.apply(converted, x, train=False)
    assert logits.shape == (1, 2)


def test_sharded_attention_pool_matches_single_device():
    """Instance-sharded MIL pooling over 8 devices == pooled full bag."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from ss25_hierarchical_multiscale_image_classification_tpu.models.mil import (
        sharded_attention_pool,
    )

    rng = np.random.default_rng(11)
    k, d, h = 64, 32, 16
    feats = rng.normal(size=(k, d)).astype(np.float32)
    mask = rng.random(k) > 0.25
    v = rng.normal(size=(d, h)).astype(np.float32)
    vb = rng.normal(size=(h,)).astype(np.float32)
    w = rng.normal(size=(h,)).astype(np.float32)

    # single-device reference: explicit softmax pooling
    a = np.tanh(feats @ v + vb) @ w
    a = np.where(mask, a, -1e30)
    p = np.exp(a - a.max())
    p = np.where(mask, p, 0.0)
    ref = (p / p.sum()) @ feats

    mesh = Mesh(np.array(jax.devices()), ("data",))
    pooled = shard_map(
        lambda hh, mm: sharded_attention_pool(hh, mm, v, w, v_bias=vb,
                                              axis_name="data"),
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P(),
    )(jnp.asarray(feats), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(pooled), ref, rtol=1e-4, atol=1e-5)

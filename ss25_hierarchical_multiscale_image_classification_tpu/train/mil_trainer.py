"""Attention-MIL slide-classifier training.

Wires the reference's designed-but-unwired MIL track (SURVEY.md C23-C27):
bags from the feature store → masked attention-MIL classifier → slide-level
train/eval with MC-dropout uncertainty and per-instance attention export for
heatmap visualization. Hyperparameters follow the aspirational
``experiments/experiment_configs.yaml`` where the reference specified them.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
import optax

from ss25_hierarchical_multiscale_image_classification_tpu.config import Config
from ss25_hierarchical_multiscale_image_classification_tpu.data.mil import (
    Bag,
    MILBagIterator,
    bags_from_artifacts,
)
from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    get_logger,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.mil import (
    MILClassifier,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train.checkpoints import (
    model_artifact_path,
    save_model,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train.losses import (
    weighted_cross_entropy,
)

log = get_logger("train.mil")


def train_mil_classifier(
    cfg: Config,
    level: int = 3,
    bags: list[Bag] | None = None,
    epochs: int | None = None,
    val_fraction: float = 0.2,
) -> dict:
    """Train the attention-MIL bag classifier on the feature store.

    Returns {"variables", "history", "val_accuracy"} and writes the
    ``mil_classifier`` artifact.
    """
    mc = cfg.mil
    if bags is None:
        bags = bags_from_artifacts(cfg.data.features_dir, level)
    if not bags:
        raise FileNotFoundError(
            "no feature artifacts to build bags from; run --extract_features"
        )
    # slide-level split (same philosophy as the patch trainers)
    rng_np = np.random.default_rng(cfg.train.seed)
    order = rng_np.permutation(len(bags))
    n_val = max(1, int(len(bags) * val_fraction)) if len(bags) > 1 else 0
    val_bags = [bags[i] for i in order[:n_val]]
    train_bags = [bags[i] for i in order[n_val:]] or bags

    model = MILClassifier(
        num_classes=mc.num_classes,
        attention_hidden_dim=mc.attention_hidden_dim,
        head_hidden_dim=mc.head_hidden_dim,
        pooling=mc.pooling,
        dropout_rate=mc.dropout_rate,
    )
    d = train_bags[0].features.shape[1]
    max_bag = min(mc.max_bag_size, max(len(b.features) for b in bags))
    init_feats = jnp.zeros((1, max_bag, d), jnp.float32)
    init_mask = jnp.ones((1, max_bag), bool)
    variables = model.init(jax.random.key(cfg.train.seed), init_feats, init_mask)
    params = variables["params"]
    tx = optax.adam(mc.learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, rng, feats, mask, labels, valid):
        def loss_fn(p):
            logits, _ = model.apply(
                {"params": p}, feats, mask, train=True,
                rngs={"dropout": rng},
            )
            return weighted_cross_entropy(logits, labels, None, valid), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        correct = jnp.sum((jnp.argmax(logits, -1) == labels) * valid)
        return params, opt_state, loss, correct, jnp.sum(valid)

    @jax.jit
    def eval_step(params, feats, mask):
        logits, attn = model.apply({"params": params}, feats, mask, train=False)
        return logits, attn

    epochs = epochs or mc.epochs
    batches = MILBagIterator(
        train_bags, batch_size=8, max_bag_size=max_bag, seed=cfg.train.seed
    )
    rng = jax.random.key(cfg.train.seed + 5)
    history = []
    for epoch in range(epochs):
        step_out = []  # device scalars; fetched once per epoch
        for feats, mask, labels, valid in batches:
            rng, step_rng = jax.random.split(rng)
            params, opt_state, loss, c, n = train_step(
                params, opt_state, step_rng,
                jnp.asarray(feats), jnp.asarray(mask),
                jnp.asarray(labels), jnp.asarray(valid),
            )
            step_out.append((loss, c, n))
        fetched = jax.device_get(step_out)
        total_loss = float(sum(v[0] for v in fetched))
        correct = float(sum(v[1] for v in fetched))
        count = float(sum(v[2] for v in fetched))
        acc = correct / max(count, 1.0)
        history.append({"epoch": epoch, "loss": total_loss, "acc": acc})
        log.info("MIL epoch %d/%d: loss %.4f acc %.4f", epoch + 1, epochs,
                 total_loss, acc)

    # validation
    val_correct = 0
    for bag in val_bags:
        feats, mask, labels, valid = next(
            iter(MILBagIterator([bag], 1, max_bag, shuffle=False))
        )
        logits, _ = eval_step(params, jnp.asarray(feats), jnp.asarray(mask))
        val_correct += int(np.argmax(np.asarray(logits)[0]) == bag.label)
    val_acc = val_correct / len(val_bags) if val_bags else float("nan")
    log.info("MIL validation accuracy: %.4f (%d slides)", val_acc, len(val_bags))

    out = {"params": jax.device_get(params)}
    prefix = model_artifact_path(cfg.models_dir, "mil_classifier")
    save_model(prefix, out)
    return {"variables": out, "history": history, "val_accuracy": val_acc,
            "max_bag_size": max_bag}


def mil_predict(
    variables: dict,
    bag_features: np.ndarray,
    cfg: Config,
    mc_dropout: bool = False,
    rng=None,
    return_attention: bool = True,
    streaming: bool | None = None,
) -> dict:
    """Slide-level prediction (+ attention, + MC-dropout uncertainty),
    fixing the reference's broken numpy/torch ``predict``
    (``mil_classifier.py:47-54``) and implementing its uncertainty TODO
    (``mil_classifier.py:56-58``).

    Bags of ``cfg.mil.streaming_bag_threshold``+ instances pool through the
    streaming Pallas kernel (``ops/pallas/mil_pool.py``) instead of the XLA
    module — same numbers, no (K, H) HBM intermediates — and MC-dropout
    then samples only the MLP head over the once-pooled bag (dropout sits
    entirely after the pooling, so re-pooling per sample is pure waste).
    ``streaming`` forces the choice either way.
    """
    mc = cfg.mil
    model = MILClassifier(
        num_classes=mc.num_classes,
        attention_hidden_dim=mc.attention_hidden_dim,
        head_hidden_dim=mc.head_hidden_dim,
        pooling=mc.pooling,
        dropout_rate=mc.dropout_rate,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.mil import (
        apply_head,
        attention_weights,
        pad_bag,
        streaming_attention_pool,
    )

    k = min(len(bag_features), mc.max_bag_size)
    feats, mask = pad_bag(bag_features.astype(np.float32), max(k, 1))
    feats = jnp.asarray(feats[None])
    mask = jnp.asarray(mask[None])
    params = variables["params"]
    if streaming is None:
        streaming = (
            mc.pooling == "attention" and k >= mc.streaming_bag_threshold
        )

    pooled = None
    if streaming:
        pooled = streaming_attention_pool(params, feats, mask)  # (1, D)
        logits = apply_head(params, pooled)
        attn = (
            attention_weights(params, feats, mask)
            if return_attention
            else None
        )
    else:
        logits, attn = model.apply({"params": params}, feats, mask)
        if not return_attention:
            attn = None
    probs = jax.nn.softmax(logits, axis=-1)
    out = {
        "probs": np.asarray(probs)[0],
        "prediction": int(np.argmax(np.asarray(probs)[0])),
        "attention": None if attn is None else np.asarray(attn)[0, :k],
    }
    if mc_dropout:
        n_samples = cfg.uncertainty.monte_carlo_samples
        rng = rng if rng is not None else jax.random.key(0)
        if mc.pooling == "attention" and pooled is None:
            # pooling is deterministic for every mode; reuse it across
            # samples on the XLA path too
            pooled = streaming_attention_pool(params, feats, mask)
        if pooled is not None:
            keys = jax.random.split(rng, n_samples)
            sample_probs = jax.vmap(
                lambda key: jax.nn.softmax(
                    apply_head(params, pooled, mc.dropout_rate, rng=key),
                    axis=-1,
                )
            )(keys)  # (S, 1, C)
            out["mc_mean"] = np.asarray(jnp.mean(sample_probs, axis=0))[0]
            out["mc_variance"] = np.asarray(jnp.var(sample_probs, axis=0))[0]
        else:
            from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.uncertainty import (
                monte_carlo_dropout,
            )

            mean, var = monte_carlo_dropout(
                lambda v, x, **kw: model.apply(v, x, mask, train=True, **kw),
                {"params": params},
                feats,
                rng,
                n_samples=n_samples,
            )
            out["mc_mean"] = np.asarray(mean)[0]
            out["mc_variance"] = np.asarray(var)[0]
    return out

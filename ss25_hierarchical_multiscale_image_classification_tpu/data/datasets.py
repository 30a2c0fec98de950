"""Manifest-backed patch datasets, slide-level splits, and batch iteration.

TPU rebuild of ``PatchDataset`` + ``get_dataloaders``
(``src/datasets/patch_dataset.py:8-85``, ``src/main.py:412-470``) with the
same statistical semantics:

- **slide-level** 80/20 train/val split with a fixed seed (split by slide so
  no slide leaks across the split, ``src/main.py:414`` random_state=42);
- optional class balancing to the min class count capped at ``max_samples``
  (``patch_dataset.py:34-46``);
- validation-set balancing by seeded subsampling to the min class count
  (``src/main.py:448-465``).

Batches are raw uint8 images + int labels; normalization and augmentation
happen **on device** (see ``data/augment.py``) instead of on loader workers.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Sequence

import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    INPUT_SIZE,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
    PatchManifest,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.patch_store import (
    PatchReader,
)
from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    get_logger,
)

log = get_logger("data.datasets")


def slide_level_split(
    slides: Sequence[str], val_fraction: float = 0.2, seed: int = 42
) -> tuple[list[str], list[str]]:
    """Deterministic slide-level train/val split, mirroring sklearn
    ``train_test_split(..., test_size=0.2, random_state=42)`` semantics
    (``src/main.py:414``): shuffle then slice."""
    from sklearn.model_selection import train_test_split

    slides = sorted(slides)
    if len(slides) < 2:
        return list(slides), list(slides)
    train, val = train_test_split(slides, test_size=val_fraction, random_state=seed)
    return list(train), list(val)


@dataclasses.dataclass
class PatchDataset:
    """An index over a manifest subset with a random-access reader."""

    manifest: PatchManifest
    resize_to: int = INPUT_SIZE
    #: emit batches in the stem's space-to-depth layout (B, H/2, W/2, 12)
    #: — the int8 inference feed (io/native_lib.gather_rows_s2d)
    s2d: bool = False

    def __post_init__(self):
        self.reader = PatchReader(self.manifest)
        counts = self.manifest.class_counts()
        log.info(
            "PatchDataset initialized: %d total patches. Tumor: %d | Normal: %d",
            len(self.manifest), counts.get(1, 0), counts.get(0, 0),
        )

    def __len__(self) -> int:
        return len(self.manifest)

    @property
    def labels(self) -> np.ndarray:
        return self.manifest.labels()

    def class_counts(self) -> dict[int, int]:
        return self.manifest.class_counts()

    def read_batch(self, indices: Sequence[int]) -> tuple[np.ndarray, np.ndarray]:
        imgs = self.reader.read_batch(
            indices, resize_to=self.resize_to, s2d=self.s2d
        )
        labels = self.labels[np.asarray(indices, dtype=np.int64)]
        return imgs, labels

    # ------------------------------------------------------------------
    @classmethod
    def from_manifest(
        cls,
        manifest: PatchManifest,
        slide_names: Sequence[str] | None = None,
        balanced: bool = False,
        max_samples: int | None = None,
        seed: int = 0,
        resize_to: int = INPUT_SIZE,
    ) -> "PatchDataset":
        """Build a dataset with the reference's balancing semantics
        (``patch_dataset.py:34-46``)."""
        if slide_names is not None:
            manifest = manifest.for_slides(slide_names)
        labels = manifest.labels()
        rng = np.random.default_rng(seed)
        by_class = {c: np.flatnonzero(labels == c) for c in np.unique(labels)}
        selected: list[int] = []
        if balanced and by_class:
            min_count = min(len(v) for v in by_class.values())
            count = min(min_count, max_samples) if max_samples else min_count
            for idxs in by_class.values():
                take = min(count, len(idxs))
                selected.extend(rng.choice(idxs, size=take, replace=False))
        else:
            for idxs in by_class.values():
                if max_samples and len(idxs) > max_samples:
                    idxs = rng.choice(idxs, size=max_samples, replace=False)
                selected.extend(idxs)
        rng.shuffle(selected)
        sub = PatchManifest([manifest[int(i)] for i in selected])
        return cls(sub, resize_to=resize_to)


def balance_to_min_class(
    manifest: PatchManifest, seed: int = 42
) -> PatchManifest:
    """Subsample every class down to the min class count with a seeded RNG —
    the reference's validation-set balancing (``src/main.py:448-465``)."""
    labels = manifest.labels()
    rng = np.random.default_rng(seed)
    by_class = {c: np.flatnonzero(labels == c) for c in np.unique(labels)}
    if not by_class:
        return manifest
    min_count = min(len(v) for v in by_class.values())
    selected = []
    for idxs in by_class.values():
        selected.extend(rng.choice(idxs, size=min_count, replace=False))
    selected.sort()
    return PatchManifest([manifest[int(i)] for i in selected])


def make_train_val_datasets(
    manifest: PatchManifest,
    val_fraction: float = 0.2,
    split_seed: int = 42,
    balance_val_seed: int = 42,
    resize_to: int = INPUT_SIZE,
) -> tuple[PatchDataset, PatchDataset]:
    """Slide-level split + balanced validation set, as ``get_dataloaders``
    builds them (``src/main.py:412-470``)."""
    train_slides, val_slides = slide_level_split(
        manifest.slides(), val_fraction, split_seed
    )
    train_ds = PatchDataset(manifest.for_slides(train_slides), resize_to=resize_to)
    val_manifest = balance_to_min_class(
        manifest.for_slides(val_slides), seed=balance_val_seed
    )
    val_ds = PatchDataset(val_manifest, resize_to=resize_to)
    return train_ds, val_ds


# ---------------------------------------------------------------------------
# Batch iteration
# ---------------------------------------------------------------------------


class BatchIterator:
    """Epoch iterator yielding (images u8 (B,H,W,3), labels i32 (B,)) with a
    **static batch size** — the final short batch is padded by wrapping to
    keep XLA shapes constant; a weight mask marks real rows."""

    def __init__(
        self,
        dataset: PatchDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        sampler: "Sampler | None" = None,
        drop_remainder: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.sampler = sampler
        self.drop_remainder = drop_remainder
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_remainder:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        n = len(self.dataset)
        if self.sampler is not None:
            order = self.sampler.epoch_indices(self._epoch)
        else:
            order = np.arange(n)
            if self.shuffle:
                np.random.default_rng(self.seed + self._epoch).shuffle(order)
        self._epoch += 1
        bs = self.batch_size
        stop = (len(order) // bs) * bs if self.drop_remainder else len(order)
        for start in range(0, stop, bs):
            idx = order[start : start + bs]
            valid = np.ones((bs,), np.float32)
            if len(idx) < bs:
                valid[len(idx):] = 0.0
                # wrap-pad (tiling as needed for datasets smaller than a batch)
                pad = np.resize(order, bs - len(idx))
                idx = np.concatenate([idx, pad])
            imgs, labels = self.dataset.read_batch(idx)
            yield imgs, labels.astype(np.int32), valid


class Sampler:
    def epoch_indices(self, epoch: int) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError


class BalancedSampler(Sampler):
    """Class-balanced sampling with replacement — the reference's
    ``balanced`` strategy (``src/main.py:544`` balanced dataloaders)."""

    def __init__(self, labels: np.ndarray, num_samples: int | None = None, seed: int = 0):
        self.labels = np.asarray(labels)
        self.num_samples = num_samples or len(self.labels)
        self.seed = seed

    def epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed + epoch)
        classes = np.unique(self.labels)
        per_class = -(-self.num_samples // len(classes))
        out = []
        for c in classes:
            idxs = np.flatnonzero(self.labels == c)
            out.append(rng.choice(idxs, size=per_class, replace=True))
        order = np.concatenate(out)[: self.num_samples]
        rng.shuffle(order)
        return order

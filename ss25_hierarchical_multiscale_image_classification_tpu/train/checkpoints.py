"""Orbax checkpointing with the reference's artifact semantics.

The reference saves raw ``state_dict`` files: every-10-epoch + final
classifier checkpoints (``src/main.py:528-533``), per-strategy finals
(``src/main.py:605``), and SimCLR best/periodic/final encoders
(``src/models/simclr.py:100-122``); loading strips ``fc`` keys to reuse the
trunk (``src/models/resnet.py:27-31``). Here:

- full train state (params + opt state + batch stats + step) checkpoints for
  true resume (the reference cannot resume optimizer state — SURVEY.md §5);
- ``save_model`` / ``load_model`` for final params-only artifacts (the
  ``.pth`` equivalent), with fc-strip helpers for encoder reuse;
- reference ``.pth`` files load via ``models.torch_import`` for migration.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def _abspath(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


class CheckpointManager:
    """Step-indexed train-state checkpoints (resume support)."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = _abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(jax.tree.map(lambda x: x, state)))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, target: Any, step: int | None = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def close(self) -> None:
        self._mgr.close()


def save_model(path: str, variables: dict) -> None:
    """Final model artifact: ``{"params": ..., "batch_stats": ...}``."""
    path = _abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(lambda x: x, variables), force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_model(path: str, target: dict | None = None) -> dict:
    path = _abspath(path)
    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(path, target=target)
    finally:
        ckptr.close()


def model_artifact_path(models_dir: str, name: str) -> str:
    """Reference artifact names, minus the .pth extension:
    ``resnet18_patch_classifier``, ``resnet18_patch_classifier_{strategy}``,
    ``simclr_encoder`` ... (``src/main.py:533,605``; ``simclr.py:106,122``)."""
    return os.path.join(models_dir, name)

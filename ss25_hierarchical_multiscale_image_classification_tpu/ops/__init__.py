"""Custom TPU ops: Pallas kernels with XLA reference implementations.

Each kernel is parity-tested against its XLA reference and runs in
interpret mode automatically off-TPU. Production call-sites:

- ``pallas.nt_xent``: flash-style streaming NT-Xent — never materializes the
  (2N, 2N) similarity matrix (the reference builds it densely,
  ``src/models/simclr.py:37-53``), with a custom VJP that recomputes score
  blocks in the backward pass. Wired: ``train/simclr_trainer.py`` via
  ``SimCLRConfig.loss_impl="pallas"`` (sole option past 2N≈64k where the
  dense matrix exceeds HBM; 2.3× XLA at 2N=32k, ``docs/PERFORMANCE.md``).
- ``pallas.preprocess``: fused uint8→normalized conversion + per-patch
  mean-RGB tissue statistic in one HBM pass. Wired:
  ``infer/sliding_window.predict_slide(tissue_filter="device")`` /
  CLI ``--tissue_filter device`` — the white-patch short-circuit moves
  on-device so the host never touches patch pixels.
- ``pallas.mil_pool``: masked streaming attention pooling over huge bags
  (no (K, H) HBM intermediates). Wired: ``train/mil_trainer.mil_predict``
  for bags ≥ ``MILConfig.streaming_bag_threshold`` instances, and as the
  once-pooled bag under MC-dropout head sampling.

Negative results, kept as parity-tested building blocks (measured slower
than XLA's conv customs on these shapes — ``docs/PERFORMANCE.md``):

- ``pallas.fused_stem``: fully-fused s2d stem (conv+BN+ReLU+maxpool, one
  HBM round-trip) and the hybrid bias/ReLU/pool variant.
- ``pallas.int8_block``: both int8 stage-1 residual blocks in one kernel.
"""

from ss25_hierarchical_multiscale_image_classification_tpu.ops.pallas.nt_xent import (  # noqa: F401
    nt_xent_loss_pallas,
)
from ss25_hierarchical_multiscale_image_classification_tpu.ops.pallas.preprocess import (  # noqa: F401
    fused_normalize,
)

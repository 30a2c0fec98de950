"""Custom TPU ops: Pallas kernels with XLA reference implementations.

Hot-path kernels for the pipeline, each with a parity-tested XLA fallback
(used automatically off-TPU / in interpret mode):

- ``pallas.nt_xent``: flash-style streaming NT-Xent — never materializes the
  (2N, 2N) similarity matrix (the reference builds it densely,
  ``src/models/simclr.py:37-53``), with a custom VJP that recomputes score
  blocks in the backward pass.
- ``pallas.preprocess``: fused uint8→normalized-bf16 conversion + per-patch
  tissue statistic in one HBM pass.
- ``pallas.mil_pool``: masked streaming attention pooling over huge bags.
"""

from ss25_hierarchical_multiscale_image_classification_tpu.ops.pallas.nt_xent import (  # noqa: F401
    nt_xent_loss_pallas,
)
from ss25_hierarchical_multiscale_image_classification_tpu.ops.pallas.preprocess import (  # noqa: F401
    fused_normalize,
)

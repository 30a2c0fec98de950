"""CLI orchestration layer (reference ``src/main.py:1073-1228``)."""

from ss25_hierarchical_multiscale_image_classification_tpu.cli.main import (  # noqa: F401
    build_parser,
    main,
)

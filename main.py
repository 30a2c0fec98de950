#!/usr/bin/env python
"""Top-level entry point mirroring the reference's ``python src/main.py``
invocation (``README.md:29-138``): ``python main.py --patch --train ...``."""

import sys

from ss25_hierarchical_multiscale_image_classification_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main())

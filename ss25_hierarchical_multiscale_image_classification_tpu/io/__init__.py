"""Host-side I/O: slide readers, annotations, downloads, synthetic fixtures.

This layer is the TPU rebuild of the reference's L0/L1 host substrate
(OpenSlide decode, lxml XML parsing, GigaDB download — ``src/main.py:27,52-171,
372-410``) plus a native C++ tile-decoding runtime replacing OpenSlide.
"""

from ss25_hierarchical_multiscale_image_classification_tpu.io.annotations import (  # noqa: F401
    parse_annotation_xml,
    write_annotation_xml,
)
from ss25_hierarchical_multiscale_image_classification_tpu.io.slide import (  # noqa: F401
    ArraySlide,
    Slide,
    open_slide,
)
from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (  # noqa: F401
    SyntheticSlideSpec,
    make_synthetic_slide,
    write_synthetic_case,
)

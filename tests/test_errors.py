"""Error paths and guard rails."""

import numpy as np
import pytest

from ss25_hierarchical_multiscale_image_classification_tpu.io.slide import (
    ArraySlide,
    open_slide,
)


def test_open_slide_unsupported_extension(tmp_path):
    p = tmp_path / "slide.svs"
    p.write_bytes(b"xx")
    with pytest.raises(ValueError, match="Unsupported slide container"):
        open_slide(str(p))


def test_array_slide_requires_levels():
    with pytest.raises(ValueError, match="at least one level"):
        ArraySlide([])


def test_tiff_slide_missing_file():
    from ss25_hierarchical_multiscale_image_classification_tpu.io import (
        native_lib,
    )

    if not native_lib.native_available():
        pytest.skip("native decoder unavailable")
    from ss25_hierarchical_multiscale_image_classification_tpu.io.tiff_slide import (
        TiffSlide,
    )

    with pytest.raises(IOError):
        TiffSlide("/nonexistent/slide.tif")


def test_packed_writer_rejects_wrong_shape(tmp_path):
    from ss25_hierarchical_multiscale_image_classification_tpu.data.patch_store import (
        PackedPatchWriter,
    )

    w = PackedPatchWriter(str(tmp_path), 3, "s", patch_size=224)
    with pytest.raises(ValueError, match="patch shape"):
        w.write(np.zeros((64, 64, 3), np.uint8), 0, 0, 0)
    w.close()


def test_empty_pack_removed(tmp_path):
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.data.patch_store import (
        PackedPatchWriter,
    )

    w = PackedPatchWriter(str(tmp_path), 3, "empty_slide", patch_size=32)
    w.close()
    assert not os.path.exists(os.path.join(str(tmp_path), "level_3", "empty_slide.pack"))


def test_extraction_survives_bad_slide(tmp_path):
    """One corrupt WSI must not kill the run (src/main.py:649-653)."""
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        DataConfig,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data import (
        extract_patches,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
        tumor_spec,
        write_synthetic_case,
    )

    root = str(tmp_path / "camelyon16")
    write_synthetic_case(
        root, "tumor_001",
        tumor_spec(width=1792, height=1344, tissue_radii=(0.45, 0.45)),
    )
    # a corrupt container alongside the good one
    os.makedirs(os.path.join(root, "train", "img"), exist_ok=True)
    with open(os.path.join(root, "train", "img", "broken_001.wsi.npz"), "wb") as f:
        f.write(b"not a npz")

    data = DataConfig(data_dir=root)
    manifest = extract_patches(data, level=2, stride=112)
    assert "tumor_001" in manifest.slides()
    assert "broken_001" not in manifest.slides()


def test_multiscale_requires_alignment():
    from ss25_hierarchical_multiscale_image_classification_tpu.models.hierarchical import (
        HierarchicalPatchClassifier,
    )
    import jax
    import jax.numpy as jnp

    model = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    with pytest.raises(ValueError, match="expected levels"):
        model.init(
            jax.random.key(0), {1: jnp.zeros((1, 32, 32, 3))}, train=False
        )

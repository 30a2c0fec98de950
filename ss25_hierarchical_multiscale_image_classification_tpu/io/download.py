"""CAMELYON16 dataset acquisition and preparation.

Rebuild of the reference downloader and prep stages
(``src/main.py:52-171,204-250,934-961``): streams the GigaDB-mirrored
CAMELYON16 TIFFs and annotation zips with progress, skip-if-exists resume,
subset-vs-remote limits (50 normal / 110 tumor / 30 test; 1-per-class when
not remote), annotation-zip extraction with completeness checks, and the
dataset-balancing flow (download the tumor tail, extract tumor-only patches).
"""

from __future__ import annotations

import os
import shutil
import zipfile
from typing import Sequence

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    CAMELYON16_BASE_URL,
    SUBSET_LIMITS,
    DataConfig,
)
from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    get_logger,
)

log = get_logger("io.download")

#: remote paths per category (reference ``src/main.py:59-71``)
CAMELYON16_FILES: dict[str, list[str]] = {
    "train_normal": [
        f"CAMELYON16/training/normal/normal_{i:03d}.tif" for i in range(1, 112)
    ],
    "train_tumor": [
        f"CAMELYON16/training/tumor/tumor_{i:03d}.tif" for i in range(1, 112)
    ],
    "test_images": [
        f"CAMELYON16/testing/images/test_{i:03d}.tif" for i in range(1, 51)
    ],
    "train_masks": ["CAMELYON16/training/lesion_annotations.zip"],
    "test_masks": ["CAMELYON16/testing/lesion_annotations.zip"],
}


def download_file(url: str, destination_path: str) -> bool:
    """Streamed download with a tqdm progress bar
    (``src/main.py:83-110``). Returns success."""
    import requests
    from tqdm import tqdm

    try:
        log.info("Downloading: %s into %s", url, destination_path)
        os.makedirs(os.path.dirname(destination_path) or ".", exist_ok=True)
        with requests.get(url, stream=True, timeout=60) as r:
            r.raise_for_status()
            total = int(r.headers.get("content-length", 0))
            with open(destination_path, "wb") as f, tqdm(
                total=total, unit="iB", unit_scale=True, unit_divisor=1024,
                desc=f"Downloading {os.path.basename(destination_path)}",
            ) as bar:
                for chunk in r.iter_content(chunk_size=1 << 20):
                    bar.update(f.write(chunk))
        log.info("Successfully downloaded %s.", os.path.basename(destination_path))
        return True
    except Exception as e:  # requests errors + disk errors, keep the run alive
        log.error("Failed to download %s: %s", url, e)
        if os.path.exists(destination_path):
            os.remove(destination_path)  # never leave truncated files
        return False


def download_dataset(data: DataConfig, remote: bool = False) -> None:
    """Download the CAMELYON16 subset (or full set when ``remote``), matching
    reference layout and resume semantics (``src/main.py:112-171``)."""
    mask_train_dir = os.path.join(data.data_dir, "train", "mask")
    mask_test_dir = os.path.join(data.data_dir, "test", "mask")
    target_dirs = {
        "train_normal": data.train_img_dir,
        "train_tumor": data.train_img_dir,
        "test_images": data.test_img_dir,
        "train_masks": mask_train_dir,
        "test_masks": mask_test_dir,
    }

    for file_type, target_dir in target_dirs.items():
        files = CAMELYON16_FILES[file_type]
        if file_type in SUBSET_LIMITS:
            files = files[: SUBSET_LIMITS[file_type]]
        if not remote and file_type in ("train_normal", "train_tumor", "test_images"):
            files = files[:1]  # 1-per-class smoke subset (main.py:148-149)
        for remote_path in files:
            name = os.path.basename(remote_path)
            destination = os.path.join(target_dir, name)
            if os.path.exists(destination):
                log.info("Skipping: %s already exists.", name)
                continue
            download_file(CAMELYON16_BASE_URL + remote_path, destination)


def extract_zip(zip_path: str, extract_to: str,
                expected: Sequence[str] | None = None) -> None:
    """Unzip with completeness check + re-extract on mismatch
    (``src/main.py:204-229``)."""
    expected = list(
        expected
        if expected is not None
        else [f"tumor_{i:03d}.xml" for i in range(1, 51)]
    )
    if os.path.exists(extract_to):
        existing = set(os.listdir(extract_to))
        if all(x in existing for x in expected):
            log.info(
                "Directory %s already contains all expected XMLs; skipping.",
                extract_to,
            )
            return
        log.warning("Directory %s is missing XMLs; re-extracting...", extract_to)
        shutil.rmtree(extract_to)
    os.makedirs(extract_to, exist_ok=True)
    with zipfile.ZipFile(zip_path, "r") as zf:
        zf.extractall(extract_to)
    log.info("Extracted %s to %s", zip_path, extract_to)


def prepare_data(data: DataConfig) -> None:
    """``--prep``: extract lesion annotations into ``annotations/``
    (``src/main.py:934-961``)."""
    zip_path = os.path.join(
        data.data_dir, "train", "mask", "lesion_annotations.zip"
    )
    if not os.path.exists(zip_path):
        log.error(
            "Annotation zip not found at %s; run --download first.", zip_path
        )
        return
    extract_zip(zip_path, data.annotations_dir)
    test_zip = os.path.join(
        data.data_dir, "test", "mask", "lesion_annotations.zip"
    )
    if os.path.exists(test_zip):
        extract_zip(
            test_zip,
            os.path.join(data.data_dir, "test", "mask", "annotations"),
            expected=[],
        )


def download_all_tumor_extract_patches(
    data: DataConfig, level: int = 3, start: int = 36, end: int = 111
) -> None:
    """``--balance_dataset``: pull the tumor tail (tumor_036..111) and
    extract tumor-only patches (``src/main.py:231-250``)."""
    from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
        extract_patches,
    )

    for i in range(start, end + 1):
        name = f"tumor_{i:03d}"
        remote_path = f"CAMELYON16/training/tumor/{name}.tif"
        destination = os.path.join(data.train_img_dir, f"{name}.tif")
        if not os.path.exists(destination):
            if not download_file(CAMELYON16_BASE_URL + remote_path, destination):
                continue
        extract_patches(
            data, level=level, only_tumor=True, slide_filter=[name]
        )


def images_downloaded(data: DataConfig) -> bool:
    """Stage gate (``src/main.py:963-966``)."""
    from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
        list_slides,
    )

    return len(list_slides(data.train_img_dir)) > 0


def patches_extracted(data: DataConfig, level: int) -> bool:
    """Stage gate (``src/main.py:967-969``)."""
    from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
        load_or_scan_manifest,
    )

    try:
        return len(load_or_scan_manifest(data.patches_dir, level)) > 0
    except Exception:
        return False


def features_extracted(data: DataConfig, level: int) -> bool:
    """Stage gate (``src/main.py:970-972``)."""
    return os.path.exists(
        os.path.join(data.features_dir, f"patch_features_{level}.npy")
    )

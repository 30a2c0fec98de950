"""Patch manifests.

The reference addresses patches purely through the filesystem — a recursive
``**/*.png`` glob with labels parsed back out of filenames
(``src/datasets/patch_dataset.py:19-31``). At 90k+ patches per level that
costs a directory walk per dataset construction and makes packed storage
impossible. Here every extraction emits a **manifest**: one parquet table per
(level) with columns

    slide, level, x, y, label, store, path, row

where ``store`` is "png" (path = PNG file, reference-compatible) or "packed"
(path = pack file, row = index into the memmap). Filename parsing of the
reference convention (``{slide}_x{x}_y{y}_{label}.png``, ``src/main.py:722``)
is still supported for interop with reference-produced patch directories.
"""

from __future__ import annotations

import dataclasses
import glob
import os
import re
from typing import Iterable, Sequence

import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.grid.labeling import (
    LABEL_NAMES,
)

_FNAME_RE = re.compile(r"^(?P<slide>.+)_x(?P<x>\d+)_y(?P<y>\d+)_(?P<label>normal|tumor)\.png$")


@dataclasses.dataclass(frozen=True)
class PatchRecord:
    slide: str
    level: int
    x: int
    y: int
    label: int  # 0 normal / 1 tumor
    store: str  # "png" | "packed"
    path: str
    row: int = -1  # row in the pack file when store == "packed"

    @property
    def patch_name(self) -> str:
        """Reference filename convention (``src/main.py:722``)."""
        return f"{self.slide}_x{self.x}_y{self.y}_{LABEL_NAMES[self.label]}.png"


class PatchManifest:
    """Columnar patch manifest with parquet persistence."""

    COLUMNS = ("slide", "level", "x", "y", "label", "store", "path", "row")

    def __init__(self, records: Sequence[PatchRecord] | None = None):
        self._records: list[PatchRecord] = list(records or [])

    # -- construction ---------------------------------------------------
    def append(self, rec: PatchRecord) -> None:
        self._records.append(rec)

    def extend(self, recs: Iterable[PatchRecord]) -> None:
        self._records.extend(recs)

    # -- access ---------------------------------------------------------
    def __len__(self) -> int:
        return len(self._records)

    def __getitem__(self, i: int) -> PatchRecord:
        return self._records[i]

    def __iter__(self):
        return iter(self._records)

    @property
    def records(self) -> list[PatchRecord]:
        return self._records

    def labels(self) -> np.ndarray:
        return np.array([r.label for r in self._records], dtype=np.int32)

    def slides(self) -> list[str]:
        return sorted({r.slide for r in self._records})

    def filter(self, fn) -> "PatchManifest":
        return PatchManifest([r for r in self._records if fn(r)])

    def for_slides(self, slide_names: Iterable[str]) -> "PatchManifest":
        names = set(slide_names)
        return self.filter(lambda r: r.slide in names)

    def class_counts(self) -> dict[int, int]:
        labels = self.labels()
        return {c: int((labels == c).sum()) for c in np.unique(labels)}

    # -- persistence ------------------------------------------------------
    def save(self, path: str) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        cols = {
            "slide": pa.array([r.slide for r in self._records], pa.string()),
            "level": pa.array([r.level for r in self._records], pa.int32()),
            "x": pa.array([r.x for r in self._records], pa.int64()),
            "y": pa.array([r.y for r in self._records], pa.int64()),
            "label": pa.array([r.label for r in self._records], pa.int32()),
            "store": pa.array([r.store for r in self._records], pa.string()),
            "path": pa.array([r.path for r in self._records], pa.string()),
            "row": pa.array([r.row for r in self._records], pa.int64()),
        }
        pq.write_table(pa.table(cols), path)

    @classmethod
    def load(cls, path: str) -> "PatchManifest":
        import pyarrow.parquet as pq

        table = pq.read_table(path)
        d = {name: table.column(name).to_pylist() for name in cls.COLUMNS}
        recs = [
            PatchRecord(
                slide=d["slide"][i],
                level=int(d["level"][i]),
                x=int(d["x"][i]),
                y=int(d["y"][i]),
                label=int(d["label"][i]),
                store=d["store"][i],
                path=d["path"][i],
                row=int(d["row"][i]),
            )
            for i in range(len(d["slide"]))
        ]
        return cls(recs)

    @classmethod
    def from_png_dir(cls, level_dir: str, level: int) -> "PatchManifest":
        """Build a manifest by scanning a reference-layout PNG directory
        (``patches/level_{L}/{slide}/{slide}_x{x}_y{y}_{label}.png``)."""
        recs = []
        for path in sorted(
            glob.glob(os.path.join(level_dir, "**", "*.png"), recursive=True)
        ):
            m = _FNAME_RE.match(os.path.basename(path))
            if not m:
                continue
            recs.append(
                PatchRecord(
                    slide=m.group("slide"),
                    level=level,
                    x=int(m.group("x")),
                    y=int(m.group("y")),
                    label=1 if m.group("label") == "tumor" else 0,
                    store="png",
                    path=path,
                )
            )
        return cls(recs)


def manifest_path(patches_dir: str, level: int) -> str:
    return os.path.join(patches_dir, f"level_{level}", "manifest.parquet")


def load_or_scan_manifest(patches_dir: str, level: int) -> PatchManifest:
    """Load the manifest for a level, falling back to a PNG-directory scan for
    interop with reference-produced patch trees."""
    mpath = manifest_path(patches_dir, level)
    if os.path.exists(mpath):
        return PatchManifest.load(mpath)
    return PatchManifest.from_png_dir(
        os.path.join(patches_dir, f"level_{level}"), level
    )

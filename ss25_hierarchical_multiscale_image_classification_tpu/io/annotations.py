"""ASAP-style annotation XML parsing and writing.

Parses the CAMELYON16 lesion-annotation format the reference consumes via the
xpath ``//Annotation/Coordinates | //Annotations/Annotation/Coordinates``
(``src/main.py:395``), returning level-0 float polygons. The writer emits the
same format so hermetic tests can fabricate annotated synthetic cases.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    get_logger,
)

log = get_logger("io.annotations")

_XPATH = "//Annotation/Coordinates | //Annotations/Annotation/Coordinates"


def parse_annotation_xml(xml_path: str) -> list[np.ndarray]:
    """Parse an ASAP annotation XML into level-0 polygons.

    Returns a list of (K, 2) float64 arrays of (X, Y) vertices in annotation
    order. Unparseable coordinates are skipped with a warning, matching the
    reference's tolerance (``src/main.py:405-407``). A syntactically invalid
    file returns an empty list.
    """
    from lxml import etree

    try:
        tree = etree.parse(xml_path)
    except etree.XMLSyntaxError as e:
        log.error("Error parsing XML file %s: %s", xml_path, e)
        return []

    polygons: list[np.ndarray] = []
    for coordinates_node in tree.xpath(_XPATH):
        coords = []
        for coord_node in coordinates_node.findall("Coordinate"):
            try:
                x = float(coord_node.get("X"))
                y = float(coord_node.get("Y"))
            except (ValueError, TypeError) as e:
                log.warning(
                    "Could not parse coordinate (X,Y) from %s: %s", xml_path, e
                )
                continue
            coords.append((x, y))
        if coords:
            polygons.append(np.asarray(coords, dtype=np.float64))
    return polygons


def write_annotation_xml(
    xml_path: str,
    polygons: Sequence[np.ndarray],
    group: str = "Tumor",
) -> None:
    """Write polygons as an ASAP-format annotation XML (fixture generator)."""
    from lxml import etree

    root = etree.Element("ASAP_Annotations")
    annotations = etree.SubElement(root, "Annotations")
    for i, poly in enumerate(polygons):
        ann = etree.SubElement(
            annotations,
            "Annotation",
            Name=f"Annotation {i}",
            Type="Polygon",
            PartOfGroup=group,
            Color="#F4FA58",
        )
        coords = etree.SubElement(ann, "Coordinates")
        for order, (x, y) in enumerate(np.asarray(poly, dtype=np.float64)):
            etree.SubElement(
                coords,
                "Coordinate",
                Order=str(order),
                X=f"{x:.4f}",
                Y=f"{y:.4f}",
            )
    groups = etree.SubElement(root, "AnnotationGroups")
    etree.SubElement(
        groups, "Group", Name=group, PartOfGroup="None", Color="#F4FA58"
    )
    os.makedirs(os.path.dirname(xml_path) or ".", exist_ok=True)
    etree.ElementTree(root).write(
        xml_path, pretty_print=True, xml_declaration=True, encoding="utf-8"
    )

"""Minimal WKB (well-known binary) codec, numpy-backed, written from scratch.

The reference stores PostGIS typed geometry columns
(/root/reference/flex-config/style/road.lua:24,50,74). Spark has no geometry
type, so layer tables carry standard little-endian WKB in a ``binary`` column
(SRID by convention: EPSG:4326 lon/lat; web-mercator math lives in the cell
index). This module is deliberately small: Point, LineString, Polygon (with
holes), MultiLineString, MultiPolygon — the exact surface the reference's
tables use.

Coordinates decode to float64 numpy arrays; no per-vertex Python objects.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6

_HDR = struct.Struct("<BI")
_U32 = struct.Struct("<I")


@dataclass
class Geom:
    """Decoded geometry.

    kind: one of the WKB type codes above.
    rings: list of (n, 2) float64 arrays.
      - POINT: single (1, 2) array
      - LINESTRING: single array (the line)
      - POLYGON: outer ring first, then holes (rings closed: first==last)
      - MULTILINESTRING: one array per part
      - MULTIPOLYGON: flattened rings; ``part_ring_counts[i]`` rings belong
        to polygon part i (outer first within each part)
    """

    kind: int
    rings: list[np.ndarray]
    part_ring_counts: list[int] | None = None

    @property
    def bbox(self) -> tuple[float, float, float, float]:
        allc = np.concatenate(self.rings, axis=0)
        return (
            float(allc[:, 0].min()),
            float(allc[:, 1].min()),
            float(allc[:, 0].max()),
            float(allc[:, 1].max()),
        )


def _coords_bytes(arr: np.ndarray) -> bytes:
    a = np.ascontiguousarray(np.asarray(arr, dtype="<f8"))
    return _U32.pack(a.shape[0]) + a.tobytes()


def encode_point(x: float, y: float) -> bytes:
    return _HDR.pack(1, POINT) + struct.pack("<dd", x, y)


def encode_linestring(coords: np.ndarray) -> bytes:
    return _HDR.pack(1, LINESTRING) + _coords_bytes(coords)


def encode_polygon(rings: list[np.ndarray]) -> bytes:
    """rings: outer first; each ring closed (first vertex == last)."""
    out = [_HDR.pack(1, POLYGON), _U32.pack(len(rings))]
    out.extend(_coords_bytes(r) for r in rings)
    return b"".join(out)


def encode_rect(x0: float, y0: float, x1: float, y1: float) -> bytes:
    """Axis-aligned rectangle → WKB polygon (CCW ring, closed). The one
    shared implementation for every synthetic-world builder — ring
    orientation/closure conventions live here, next to the codec."""
    ring = np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
    )
    return encode_polygon([ring])


def encode_multilinestring(parts: list[np.ndarray]) -> bytes:
    out = [_HDR.pack(1, MULTILINESTRING), _U32.pack(len(parts))]
    out.extend(encode_linestring(p) for p in parts)
    return b"".join(out)


def encode_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    out = [_HDR.pack(1, MULTIPOLYGON), _U32.pack(len(polys))]
    out.extend(encode_polygon(rings) for rings in polys)
    return b"".join(out)


def _read_coords(buf: memoryview, off: int) -> tuple[np.ndarray, int]:
    (n,) = _U32.unpack_from(buf, off)
    off += 4
    arr = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
    return arr.astype(np.float64, copy=False), off + 16 * n


def decode(wkb: bytes) -> Geom:
    buf = memoryview(wkb)
    byte_order, kind = _HDR.unpack_from(buf, 0)
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    if kind & 0xFFFFFF00:
        # EWKB high bits change the wire layout (SRID flag 0x20000000 inserts
        # a 4-byte SRID word; Z/M flags change the coordinate stride). Parsing
        # on as if they were absent would yield garbage coordinates — fail
        # loudly instead so foreign WKB is rejected, not misread.
        raise ValueError(
            f"EWKB/ISO flag bits 0x{kind & 0xFFFFFF00:x} not supported "
            "(2D little-endian WKB only)"
        )
    off = 5
    if kind == POINT:
        x, y = struct.unpack_from("<dd", buf, off)
        return Geom(POINT, [np.array([[x, y]], dtype=np.float64)])
    if kind == LINESTRING:
        arr, _ = _read_coords(buf, off)
        return Geom(LINESTRING, [arr])
    if kind == POLYGON:
        (nrings,) = _U32.unpack_from(buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            r, off = _read_coords(buf, off)
            rings.append(r)
        return Geom(POLYGON, rings)
    if kind == MULTILINESTRING:
        (nparts,) = _U32.unpack_from(buf, off)
        off += 4
        parts = []
        for _ in range(nparts):
            _, sub_kind = _HDR.unpack_from(buf, off)
            if sub_kind != LINESTRING:
                raise ValueError("multilinestring part is not a linestring")
            off += 5
            arr, off = _read_coords(buf, off)
            parts.append(arr)
        return Geom(MULTILINESTRING, parts)
    if kind == MULTIPOLYGON:
        (nparts,) = _U32.unpack_from(buf, off)
        off += 4
        rings: list[np.ndarray] = []
        counts: list[int] = []
        for _ in range(nparts):
            _, sub_kind = _HDR.unpack_from(buf, off)
            if sub_kind != POLYGON:
                raise ValueError("multipolygon part is not a polygon")
            off += 5
            (nrings,) = _U32.unpack_from(buf, off)
            off += 4
            counts.append(nrings)
            for _ in range(nrings):
                r, off = _read_coords(buf, off)
                rings.append(r)
        return Geom(MULTIPOLYGON, rings, counts)
    raise ValueError(f"unsupported WKB geometry type {kind}")


def rebuild(g: Geom, rings: list[np.ndarray]) -> bytes:
    """Re-encode a decoded geometry with replacement ring arrays —
    kind-preserving (the shared tail of every coordinate-mapping kernel:
    reprojection, fixture-world translation)."""
    if g.kind == POINT:
        return encode_point(float(rings[0][0, 0]), float(rings[0][0, 1]))
    if g.kind == LINESTRING:
        return encode_linestring(rings[0])
    if g.kind == POLYGON:
        return encode_polygon(rings)
    if g.kind == MULTILINESTRING:
        return encode_multilinestring(rings)
    if g.kind == MULTIPOLYGON:
        polys, i = [], 0
        for n in g.part_ring_counts:
            polys.append(rings[i : i + n])
            i += n
        return encode_multipolygon(polys)
    raise ValueError(f"unsupported kind {g.kind}")


def geom_type_name(kind: int) -> str:
    return {
        POINT: "ST_Point",
        LINESTRING: "ST_LineString",
        POLYGON: "ST_Polygon",
        MULTIPOINT: "ST_MultiPoint",
        MULTILINESTRING: "ST_MultiLineString",
        MULTIPOLYGON: "ST_MultiPolygon",
    }[kind]

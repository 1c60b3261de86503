"""Geospatial string-format kernels (SURVEY.md §2.3 F4–F10), pure Python.

Reference: ``/root/reference/solrindexer/spatial.py``.  The reference uses
shapely/pygml; this container has neither, and the operations the reference
actually performs on bboxes are closed-form — envelope formatting, rectangle
polygons, centroids, segmentization — so they are implemented directly.
F10 (GML XML -> WKT, ``solrindexer/spatial.py:80-83``) is a clean-room
stdlib-``xml.etree`` parser for the GML geometry subset the reference's
metadata path feeds it (Point/LineString/Polygon, posList/pos/coordinates,
EPSG:4326 axis-order handling).
"""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as _ET


class SpatialError(ValueError):
    pass


def _validate_bbox(min_x, max_x, min_y, max_y, allow_idl=True):
    for v, lo, hi, name in (
        (min_y, -90.0, 90.0, "min_y"),
        (max_y, -90.0, 90.0, "max_y"),
        (min_x, -180.0, 180.0, "min_x"),
        (max_x, -180.0, 180.0, "max_x"),
    ):
        if not (lo <= v <= hi):
            raise SpatialError(f"{name}={v} outside EPSG:4326 bounds")
    if max_y < min_y:
        raise SpatialError("max_y < min_y")
    if max_x < min_x and not allow_idl:
        raise SpatialError("max_x < min_x")


def generate_solr_envelope(min_x, max_x, max_y, min_y) -> str:
    """bbox -> ``ENVELOPE(w, e, n, s)`` with EPSG:4326 validation;
    ``max_x < min_x`` means dateline crossing and is allowed
    (``solrindexer/spatial.py:86-112`` F4)."""
    _validate_bbox(min_x, max_x, min_y, max_y, allow_idl=True)
    return f"ENVELOPE({min_x},{max_x},{max_y},{min_y})"


_ENVELOPE = re.compile(
    r"^ENVELOPE\(\s*([-\d.eE]+)\s*,\s*([-\d.eE]+)\s*,\s*([-\d.eE]+)\s*,\s*([-\d.eE]+)\s*\)$"
)


def parse_envelope_to_bbox(envelope: str):
    """Inverse of F4 with validation and 9-decimal rounding
    (``solrindexer/spatial.py:163-199`` F6) -> (min_x, min_y, max_x, max_y)."""
    m = _ENVELOPE.match((envelope or "").strip())
    if not m:
        raise SpatialError(f"not an ENVELOPE literal: {envelope!r}")
    min_x, max_x, max_y, min_y = (round(float(g), 9) for g in m.groups())
    _validate_bbox(min_x, max_x, min_y, max_y, allow_idl=True)
    return (min_x, min_y, max_x, max_y)


def create_polygon_wkt_from_bbox(min_x, max_x, max_y, min_y):
    """bbox -> CCW polygon WKT (CW when crossing the dateline), degenerate
    bbox -> POINT; returns (wkt, centroid_wkt)
    (``solrindexer/spatial.py:115-160`` F5)."""
    _validate_bbox(min_x, max_x, min_y, max_y, allow_idl=True)
    cx, cy = (min_x + max_x) / 2.0, (min_y + max_y) / 2.0
    if min_x == max_x and min_y == max_y:
        pt = f"POINT ({min_x} {min_y})"
        return pt, pt
    idl = max_x < min_x
    if idl:
        # clockwise ring for dateline-crossing rectangles
        ring = [
            (min_x, min_y), (min_x, max_y), (max_x, max_y),
            (max_x, min_y), (min_x, min_y),
        ]
        cx = ((min_x + max_x + 360.0) / 2.0 + 180.0) % 360.0 - 180.0
    else:
        # counter-clockwise
        ring = [
            (min_x, min_y), (max_x, min_y), (max_x, max_y),
            (min_x, max_y), (min_x, min_y),
        ]
    coords = ", ".join(f"{x} {y}" for x, y in ring)
    return f"POLYGON (({coords}))", f"POINT ({cx} {cy})"


_WKT_POLY = re.compile(r"^POLYGON\s*\(\((.+)\)\)$", re.I)
_WKT_POINT = re.compile(r"^POINT\s*\(([-\d.eE]+)\s+([-\d.eE]+)\)$", re.I)
_WKT_LINE = re.compile(r"^LINESTRING\s*\((.+)\)$", re.I)


def _parse_ring(body: str):
    return [tuple(float(v) for v in pt.split()) for pt in body.split(",")]


def wkt_to_geojson(wkt: str) -> str:
    """WKT -> GeoJSON string for POINT/LINESTRING/POLYGON
    (``solrindexer/spatial.py:230-236`` F8)."""
    wkt = (wkt or "").strip()
    m = _WKT_POINT.match(wkt)
    if m:
        return json.dumps(
            {"type": "Point",
             "coordinates": [float(m.group(1)), float(m.group(2))]}
        )
    m = _WKT_LINE.match(wkt)
    if m:
        return json.dumps(
            {"type": "LineString",
             "coordinates": [list(p) for p in _parse_ring(m.group(1))]}
        )
    m = _WKT_POLY.match(wkt)
    if m:
        rings = re.split(r"\)\s*,\s*\(", m.group(1))
        return json.dumps(
            {"type": "Polygon",
             "coordinates": [[list(p) for p in _parse_ring(r)]
                             for r in rings]}
        )
    raise SpatialError(f"unsupported WKT: {wkt!r}")


def get_center_from(wkt: str) -> str:
    """Vertex-average centroid as POINT WKT
    (``solrindexer/spatial.py:238-240`` F8)."""
    m = _WKT_POINT.match((wkt or "").strip())
    if m:
        return f"POINT ({float(m.group(1))} {float(m.group(2))})"
    for rx, ring_fn in ((_WKT_POLY, lambda b: _parse_ring(b)[:-1]),
                        (_WKT_LINE, _parse_ring)):
        m = rx.match(wkt.strip())
        if m:
            pts = ring_fn(m.group(1))
            cx = sum(p[0] for p in pts) / len(pts)
            cy = sum(p[1] for p in pts) / len(pts)
            return f"POINT ({cx} {cy})"
    raise SpatialError(f"unsupported WKT: {wkt!r}")


def segmentize_wkt(wkt: str, max_segment: float = 10.0, geojson: bool = False):
    """Insert vertices so no segment exceeds ``max_segment`` degrees —
    rectangles/linestrings for visualization
    (``solrindexer/spatial.py:202-227`` F7)."""
    wkt = (wkt or "").strip()

    def densify(pts):
        out = [pts[0]]
        for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
            dist = max(abs(x1 - x0), abs(y1 - y0))
            n = max(1, int(dist // max_segment) + (1 if dist % max_segment else 0))
            for i in range(1, n + 1):
                out.append((x0 + (x1 - x0) * i / n, y0 + (y1 - y0) * i / n))
        return out

    m = _WKT_POLY.match(wkt)
    if m:
        pts = densify(_parse_ring(m.group(1)))
        coords = ", ".join(f"{x} {y}" for x, y in pts)
        out = f"POLYGON (({coords}))"
    else:
        m = _WKT_LINE.match(wkt)
        if not m:
            raise SpatialError(f"unsupported WKT: {wkt!r}")
        pts = densify(_parse_ring(m.group(1)))
        coords = ", ".join(f"{x} {y}" for x, y in pts)
        out = f"LINESTRING ({coords})"
    return wkt_to_geojson(out) if geojson else out


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _axis_latlon(srs: str | None) -> bool:
    """True when the srsName declares lat/lon axis order.

    GML 3 with ``urn:ogc:def:crs:EPSG::4326`` (or any EPSG 4326 spelling
    other than CRS84) lists latitude first; WKT wants lon/lat, so those
    coordinates must be swapped.  ``CRS84`` and unqualified geometries are
    already lon/lat.
    """
    if not srs:
        return False
    s = srs.lower()
    if "crs84" in s:
        return False
    return "4326" in s


def _gml_coords(node, srs: str | None):
    """Collect the coordinate pairs under one GML geometry/ring node."""
    latlon = _axis_latlon(srs)
    dim = 2
    for el in node.iter():
        name = _localname(el.tag)
        if name in ("poslist", "pos"):
            d = el.get("srsDimension") or node.get("srsDimension")
            if d:
                dim = int(d)
            vals = [float(v) for v in (el.text or "").split()]
            if len(vals) % dim:
                raise SpatialError(
                    f"GML {name} has {len(vals)} values, not a multiple of "
                    f"srsDimension={dim}")
            pts = [tuple(vals[i:i + 2]) for i in range(0, len(vals), dim)]
            return [(y, x) for x, y in pts] if latlon else pts
        if name == "coordinates":
            # GML 2 style: "x,y x,y ..." (cs=",", ts=" " defaults)
            cs = el.get("cs", ",")
            ts = el.get("ts", " ")
            pts = []
            for tok in (el.text or "").replace("\n", ts).split(ts):
                tok = tok.strip()
                if not tok:
                    continue
                x, y = (float(v) for v in tok.split(cs)[:2])
                pts.append((x, y))
            # GML 2 <coordinates> are x,y (lon/lat) by spec regardless of
            # srsName — pygml does not swap them either; only the GML 3
            # posList/pos branch above honours EPSG:4326 lat/lon order.
            return pts
    raise SpatialError("GML geometry has no posList/pos/coordinates")


def _fmt_pts(pts) -> str:
    # same float formatting as the bbox->WKT kernels above ("0.0", not "0")
    return ", ".join(f"{float(x)} {float(y)}" for x, y in pts)


def parse_gml_to_wkt(gml: str) -> str:
    """GML geometry XML string -> WKT (``solrindexer/spatial.py:80-83`` F10).

    Clean-room stdlib parser for the subset the reference's pygml/pygeoif
    path consumes from metadata polygons: ``gml:Point`` (pos),
    ``gml:LineString`` (posList), ``gml:Polygon`` (exterior + interior
    LinearRings), GML 2 ``coordinates``, any/no namespace, and EPSG:4326
    lat/lon axis order via ``srsName`` (swapped to WKT lon/lat; ``CRS84``
    and bare geometries pass through; GML 2 ``coordinates`` are always
    x,y by spec, so srsName never swaps them).  Unclosed rings are closed,
    matching
    the reference's downstream ``validate_fix_geometry`` behavior.
    """
    try:
        root = _ET.fromstring((gml or "").strip())
    except _ET.ParseError as exc:
        raise SpatialError(f"invalid GML XML: {exc}") from exc
    srs = root.get("srsName")
    kind = _localname(root.tag)
    if kind == "point":
        pts = _gml_coords(root, srs)
        if not pts:
            raise SpatialError("GML Point with no coordinates")
        return f"POINT ({_fmt_pts(pts[:1])})"
    if kind in ("linestring", "curve"):
        pts = _gml_coords(root, srs)
        if len(pts) < 2:
            raise SpatialError("GML LineString needs >= 2 points")
        return f"LINESTRING ({_fmt_pts(pts)})"
    if kind == "polygon":
        exterior, interiors = None, []
        for child in root:
            role = _localname(child.tag)
            if role not in ("exterior", "interior", "outerboundaryis",
                            "innerboundaryis"):
                continue
            pts = _gml_coords(child, srs)
            if pts and pts[0] != pts[-1]:
                pts.append(pts[0])
            if len(pts) < 4:
                raise SpatialError("GML ring needs >= 3 distinct points")
            if role in ("exterior", "outerboundaryis"):
                exterior = pts
            else:
                interiors.append(pts)
        if exterior is None:
            raise SpatialError("GML Polygon has no exterior ring")
        body = ", ".join(f"({_fmt_pts(pts)})"
                         for pts in [exterior, *interiors])
        return f"POLYGON ({body})"
    raise SpatialError(f"unsupported GML geometry: {kind!r}")


def validate_fix_geometry(wkt: str):
    """Best-effort repair (``solrindexer/spatial.py:243-267`` F9): closes an
    unclosed polygon ring, drops consecutive duplicate vertices; returns
    (wkt, fixed: bool).  (The reference uses shapely ``buffer(0)``; for the
    rectangle/point geometries this engine produces, ring closure +
    dedup covers the observed failure modes.)"""
    wkt = (wkt or "").strip()
    m = _WKT_POLY.match(wkt)
    if not m:
        return wkt, False
    pts = _parse_ring(m.group(1))
    fixed = False
    dedup = [pts[0]]
    for p in pts[1:]:
        if p != dedup[-1]:
            dedup.append(p)
        else:
            fixed = True
    if dedup[0] != dedup[-1]:
        dedup.append(dedup[0])
        fixed = True
    coords = ", ".join(f"{x} {y}" for x, y in dedup)
    return f"POLYGON (({coords}))", fixed

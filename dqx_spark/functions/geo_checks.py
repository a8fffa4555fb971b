"""Geo checks over WKT strings — the dependency-free subset.

The reference's geo module (geo/check_funcs.py, 1342 LoC) wraps Databricks
spatial SQL (``ST_*`` / ``H3_*``), which does not exist in OSS Spark; Sedona
would provide it but is not a dependency here.  This module re-derives the
checks that are expressible over WKT **as pure Column expressions** (regex +
coordinate extraction), and documents the rest as requiring a spatial
backend.  Covered (reference file:line):

* ``is_latitude`` / ``is_longitude`` (geo/check_funcs.py:63/:86) — in
  row_checks.py.
* ``is_geometry`` (:110) — WKT well-formedness for
  POINT/LINESTRING/POLYGON/MULTIPOINT/MULTILINESTRING/MULTIPOLYGON and
  one-level GEOMETRYCOLLECTION (ref :166-360).
* ``is_point`` / ``is_linestring`` / ``is_polygon`` / ``is_multipoint`` /
  ``is_multilinestring`` / ``is_multipolygon`` / ``is_geometrycollection``
  (:166-360) — type tag.
* ``is_non_empty_geometry`` (:391) — ``... EMPTY`` forms fail.
* ``is_not_null_island`` (:420) — POINT(0 0).
* ``has_x_coordinate_between`` / ``has_y_coordinate_between`` (:487/:520) —
  every coordinate inside the band.
* ``is_area_equal_to`` / ``_not_equal_to`` / ``_not_greater_than`` /
  ``_not_less_than`` and the ``is_num_points_*`` comparators (:553-818) —
  planar shoelace area / coordinate count vs a literal, column or SQL-expr
  limit (srid transform + geodesic modes need a spatial backend and raise).
* ``is_geo_contains`` / ``covers`` / ``intersects`` / ``touches`` /
  ``within`` (:1094-1342) — exact POINT/POLYGON topological predicates vs
  a WKT literal or per-row geometry column (strict/inclusive boundary
  semantics per relation; see each docstring).
* ``are_polygons_mutually_disjoint`` (:893) — EXACT by default: bbox
  bucket-join candidates refined with segment-intersection + ray-cast
  containment over the outer rings (``exact=False`` keeps the conservative
  bbox approximation as a scale escape hatch).
* ``has_area_between`` (shoelace), ``has_num_points_between``,
  ``has_dimension``, ``is_ogc_valid`` (ring closure + non-adjacent edge
  self-intersection), ``is_geography`` (globe bounds),
  ``is_in_geofence`` / ``is_not_in_geofence`` (exact point/polygon vs a
  constant fence, intersects/within predicates) — the ref :362-1342
  families re-derived as pure Column expressions.

The reference's H3-bucketed geofencing variants (h3 library) are re-derived
dependency-free as ``is_in_geofence(..., method='grid')``: a driver-side
square-grid polyfill (full-interior cells -> O(1) set probe; boundary cells
-> exact ray cast), exact overall.
"""

from __future__ import annotations

from dqx_spark.errors import InvalidParameterError

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dqx_spark.functions._helpers import str_value, unique_suffix
from dqx_spark.rule import make_condition, normalize_col_str, register_rule, to_col

__all__ = [
    "is_geometry",
    "is_point",
    "is_linestring",
    "is_polygon",
    "is_multipoint",
    "is_multilinestring",
    "is_multipolygon",
    "is_geometrycollection",
    "is_non_empty_geometry",
    "is_not_null_island",
    "has_x_coordinate_between",
    "has_y_coordinate_between",
    "has_area_between",
    "has_num_points_between",
    "is_area_equal_to",
    "is_area_not_equal_to",
    "is_area_not_greater_than",
    "is_area_not_less_than",
    "is_num_points_equal_to",
    "is_num_points_not_equal_to",
    "is_num_points_not_greater_than",
    "is_num_points_not_less_than",
    "has_dimension",
    "is_ogc_valid",
    "is_geography",
    "is_in_geofence",
    "is_not_in_geofence",
    "is_geo_contains",
    "is_geo_covers",
    "is_geo_intersects",
    "is_geo_touches",
    "is_geo_within",
    "are_polygons_mutually_disjoint",
]

_NUM = r"-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"
_PAIR = rf"{_NUM}\s+{_NUM}"
_RING = rf"\(\s*{_PAIR}(?:\s*,\s*{_PAIR})*\s*\)"
#: unanchored WKT bodies per type (anchored below; also reused as the member
#: grammar inside GEOMETRYCOLLECTION, which nests one level per OGC SF common
#: practice)
_WKT_BODY = {
    "POINT": rf"POINT\s*(?:EMPTY|\(\s*{_PAIR}\s*\))",
    "LINESTRING": rf"LINESTRING\s*(?:EMPTY|{_RING})",
    "POLYGON": rf"POLYGON\s*(?:EMPTY|\(\s*{_RING}(?:\s*,\s*{_RING})*\s*\))",
    "MULTIPOINT": rf"MULTIPOINT\s*(?:EMPTY|\(\s*(?:{_PAIR}|\(\s*{_PAIR}\s*\))(?:\s*,\s*(?:{_PAIR}|\(\s*{_PAIR}\s*\)))*\s*\))",
    "MULTILINESTRING": rf"MULTILINESTRING\s*(?:EMPTY|\(\s*{_RING}(?:\s*,\s*{_RING})*\s*\))",
    "MULTIPOLYGON": rf"MULTIPOLYGON\s*(?:EMPTY|\(\s*\(\s*{_RING}(?:\s*,\s*{_RING})*\s*\)(?:\s*,\s*\(\s*{_RING}(?:\s*,\s*{_RING})*\s*\))*\s*\))",
}
_GC_MEMBER = "(?:" + "|".join(f"(?:{b})" for b in _WKT_BODY.values()) + ")"
_WKT_BODY["GEOMETRYCOLLECTION"] = (
    rf"GEOMETRYCOLLECTION\s*(?:EMPTY|\(\s*{_GC_MEMBER}(?:\s*,\s*{_GC_MEMBER})*\s*\))"
)
WKT_PATTERNS = {t: rf"^\s*{b}\s*$" for t, b in _WKT_BODY.items()}
_ANY_WKT = "|".join(f"(?:{p})" for p in WKT_PATTERNS.values())


def _wkt_upper(col: Column) -> Column:
    return F.upper(F.trim(col))


@register_rule("row")
def is_geometry(column: str | Column) -> Column:
    """Fail when the string is not well-formed WKT of a supported type
    (reference geo/check_funcs.py:110 uses try_to_geometry)."""
    col = to_col(column)
    name = normalize_col_str(column)
    condition = col.isNotNull() & ~_wkt_upper(col).rlike(_ANY_WKT)
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not well-formed WKT", str_value(col)),
        f"{name}_is_not_geometry",
    )


def _typed_check(column, wkt_type: str) -> Column:
    col = to_col(column)
    name = normalize_col_str(column)
    condition = col.isNotNull() & ~_wkt_upper(col).rlike(WKT_PATTERNS[wkt_type])
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not a {wkt_type}", str_value(col)),
        f"{name}_is_not_{wkt_type.lower()}",
    )


@register_rule("row")
def is_point(column: str | Column) -> Column:
    """reference geo/check_funcs.py:166 (st_geometrytype = 'ST_Point')."""
    return _typed_check(column, "POINT")


@register_rule("row")
def is_linestring(column: str | Column) -> Column:
    """reference geo/check_funcs.py:200."""
    return _typed_check(column, "LINESTRING")


@register_rule("row")
def is_polygon(column: str | Column) -> Column:
    """reference geo/check_funcs.py:234."""
    return _typed_check(column, "POLYGON")


@register_rule("row")
def is_multipoint(column: str | Column) -> Column:
    """reference geo/check_funcs.py:250 (st_geometrytype multipoint)."""
    return _typed_check(column, "MULTIPOINT")


@register_rule("row")
def is_multilinestring(column: str | Column) -> Column:
    """reference geo/check_funcs.py:278."""
    return _typed_check(column, "MULTILINESTRING")


@register_rule("row")
def is_multipolygon(column: str | Column) -> Column:
    """reference geo/check_funcs.py:306."""
    return _typed_check(column, "MULTIPOLYGON")


@register_rule("row")
def is_geometrycollection(column: str | Column) -> Column:
    """reference geo/check_funcs.py:334."""
    return _typed_check(column, "GEOMETRYCOLLECTION")


@register_rule("row")
def is_non_empty_geometry(column: str | Column) -> Column:
    """Fail on '<TYPE> EMPTY' (reference geo/check_funcs.py:391)."""
    col = to_col(column)
    name = normalize_col_str(column)
    condition = col.isNotNull() & _wkt_upper(col).rlike(r"^\s*[A-Z]+\s+EMPTY\s*$")
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is an empty geometry", str_value(col)),
        f"{name}_is_empty_geometry",
    )


@register_rule("row")
def is_not_null_island(column: str | Column) -> Column:
    """Fail on POINT(0 0) (reference geo/check_funcs.py:420 — st_x/st_y != 0)."""
    col = to_col(column)
    name = normalize_col_str(column)
    x = F.regexp_extract(_wkt_upper(col), rf"^POINT\s*\(\s*({_NUM})\s+({_NUM})\s*\)$", 1)
    y = F.regexp_extract(_wkt_upper(col), rf"^POINT\s*\(\s*({_NUM})\s+({_NUM})\s*\)$", 2)
    condition = (
        col.isNotNull()
        & (x != "")
        & (x.cast("double") == 0.0)
        & (y.cast("double") == 0.0)
    )
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is null island", str_value(col)),
        f"{name}_is_null_island",
    )


def _coords(col: Column) -> Column:
    """All coordinate pairs of a WKT string as array<struct<x,y>>."""
    pairs = F.regexp_extract_all(_wkt_upper(col), F.lit(f"({_NUM}\\s+{_NUM})"), 1)
    return F.transform(
        pairs,
        lambda p: F.struct(
            F.split(p, r"\s+").getItem(0).cast("double").alias("x"),
            F.split(p, r"\s+").getItem(1).cast("double").alias("y"),
        ),
    )


def _coord_band_check(column, lo: float, hi: float, axis: str) -> Column:
    col = to_col(column)
    name = normalize_col_str(column)
    coords = _coords(col)
    outside = F.exists(coords, lambda c: (c.getField(axis) < lo) | (c.getField(axis) > hi))
    condition = col.isNotNull() & (F.size(coords) > 0) & outside
    return make_condition(
        condition,
        F.format_string(
            f"Value '%s' in Column '{name}' has {axis} coordinates outside [{lo}, {hi}]", str_value(col)
        ),
        f"{name}_has_{axis}_outside_band",
    )


@register_rule("row")
def has_x_coordinate_between(column: str | Column, min_value: float, max_value: float) -> Column:
    """All x coordinates within the band (reference geo/check_funcs.py:487)."""
    return _coord_band_check(column, float(min_value), float(max_value), "x")


@register_rule("row")
def has_y_coordinate_between(column: str | Column, min_value: float, max_value: float) -> Column:
    """All y coordinates within the band (reference geo/check_funcs.py:520)."""
    return _coord_band_check(column, float(min_value), float(max_value), "y")


def _ring(col: Column) -> Column:
    """Outer ring of a WKT POLYGON as array<struct<x,y>> (closed: WKT rings
    repeat the first vertex last).  Holes are ignored — matching the
    intersects-over-exteriors semantic of the reference fixture."""
    body = F.regexp_extract(_wkt_upper(col), r"POLYGON\s*\(\s*\(([^)]*)\)", 1)
    pairs = F.filter(F.split(body, r"\s*,\s*"), lambda s: F.trim(s) != "")
    return F.transform(
        pairs,
        lambda p: F.struct(
            F.split(F.trim(p), r"\s+").getItem(0).cast("double").alias("x"),
            F.split(F.trim(p), r"\s+").getItem(1).cast("double").alias("y"),
        ),
    )


def _rings(col: Column) -> Column:
    """ALL rings of a WKT POLYGON (outer first, then holes) as
    array<array<struct<x,y>>> — the hole-aware twin of :func:`_ring`."""
    bodies = F.regexp_extract_all(_wkt_upper(col), F.lit(r"\(([^()]*)\)"), 1)

    def ring_of(body: Column) -> Column:
        pairs = F.filter(F.split(body, r"\s*,\s*"), lambda s: F.trim(s) != "")
        return F.transform(
            pairs,
            lambda p: F.struct(
                F.split(F.trim(p), r"\s+").getItem(0).cast("double").alias("x"),
                F.split(F.trim(p), r"\s+").getItem(1).cast("double").alias("y"),
            ),
        )

    return F.transform(bodies, ring_of)


def _edges(ring: Column) -> Column:
    """Consecutive vertex pairs of a closed ring as array<struct<p,q>>.

    try_element_at, not element_at: callers guard malformed rings with
    short-circuiting predicates, but Spark's subexpression elimination can
    hoist this transform OUT of the guard and evaluate it eagerly — an
    empty ring must then yield null-vertex edges (which propagate NULL
    through every downstream predicate) rather than throw
    INVALID_ARRAY_INDEX (r4)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(ring) - 1, F.lit(1))),
        lambda i: F.struct(
            F.try_element_at(ring, i).alias("p"), F.try_element_at(ring, i + 1).alias("q")
        ),
    )


def _cross(o: Column, p: Column, q: Column) -> Column:
    """2D cross product (p-o) x (q-o): sign = which side of line o->p q lies."""
    ox, oy = o.getField("x"), o.getField("y")
    return (p.getField("x") - ox) * (q.getField("y") - oy) - (p.getField("y") - oy) * (q.getField("x") - ox)


def _segments_intersect(ea: Column, eb: Column) -> Column:
    """Inclusive segment intersection (touching counts).  The classic
    orientation test; the segment-bbox conjunct settles the all-collinear
    case (d1..d4 all zero) exactly."""
    a1, a2, b1, b2 = ea.getField("p"), ea.getField("q"), eb.getField("p"), eb.getField("q")
    d1, d2 = _cross(b1, b2, a1), _cross(b1, b2, a2)
    d3, d4 = _cross(a1, a2, b1), _cross(a1, a2, b2)

    def lo(p, q, ax):
        return F.least(p.getField(ax), q.getField(ax))

    def hi(p, q, ax):
        return F.greatest(p.getField(ax), q.getField(ax))

    bbox = (
        (lo(a1, a2, "x") <= hi(b1, b2, "x"))
        & (lo(b1, b2, "x") <= hi(a1, a2, "x"))
        & (lo(a1, a2, "y") <= hi(b1, b2, "y"))
        & (lo(b1, b2, "y") <= hi(a1, a2, "y"))
    )
    return (d1 * d2 <= 0) & (d3 * d4 <= 0) & bbox


def _point_in_edges(pt: Column, edges: Column) -> Column:
    """Even-odd ray cast over an edge set: odd number of upward/downward edge
    crossings to the right of the point.  The division is guarded by the
    crossing condition (dy != 0 whenever the branch is evaluated), so it is
    ANSI-safe.  Passing the union of all ring edge sets gives the OGC
    interior test for polygons with holes for free: a point inside a hole
    crosses the outer ring once and the hole ring once — even — outside."""
    px, py = pt.getField("x"), pt.getField("y")

    def crossing(acc, e):
        p, q = e.getField("p"), e.getField("q")
        spans = (p.getField("y") > py) != (q.getField("y") > py)
        xint = p.getField("x") + (q.getField("x") - p.getField("x")) * (py - p.getField("y")) / (
            q.getField("y") - p.getField("y")
        )
        return acc + F.when(spans & (px < xint), F.lit(1)).otherwise(F.lit(0))

    return F.aggregate(edges, F.lit(0), crossing) % 2 == 1


def _point_in_ring(pt: Column, ring: Column) -> Column:
    return _point_in_edges(pt, _edges(ring))


def _polygons_intersect(ra: Column, rb: Column) -> Column:
    """Exact polygon-polygon intersection over outer rings: any edge pair
    intersects, or one polygon contains the other (tested via one vertex,
    sufficient when no edges cross)."""
    edge_hit = F.exists(_edges(ra), lambda ea: F.exists(_edges(rb), lambda eb: _segments_intersect(ea, eb)))
    return edge_hit | _point_in_ring(F.element_at(ra, 1), rb) | _point_in_ring(F.element_at(rb, 1), ra)


def _polygon_edges(rings: Column) -> Column:
    """Every boundary edge of a polygon-with-holes (all rings flattened)."""
    return F.flatten(F.transform(rings, _edges))


def _polygons_intersect_rings(rsa: Column, rsb: Column) -> Column:
    """Hole-aware exact polygon-polygon intersection (OGC ST_Intersects,
    touching counts): any boundary edge pair of any rings intersects, or one
    polygon's first outer vertex lies in the other's interior under the
    even-odd rule over ALL rings — so a polygon sitting entirely inside
    another's hole is correctly disjoint, and crossing or touching a hole
    boundary (part of the polygon's boundary per OGC) correctly intersects."""
    ea, eb = _polygon_edges(rsa), _polygon_edges(rsb)
    edge_hit = F.exists(ea, lambda x: F.exists(eb, lambda y: _segments_intersect(x, y)))
    va = F.element_at(F.element_at(rsa, 1), 1)
    vb = F.element_at(F.element_at(rsb, 1), 1)
    return edge_hit | _point_in_edges(va, eb) | _point_in_edges(vb, ea)


def _indexed_edges(ring: Column) -> Column:
    """Edges with their 1-based position, for adjacency-aware pair tests
    (try_element_at for the same CSE-hoist reason as :func:`_edges`)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(ring) - 1, F.lit(1))),
        lambda i: F.struct(
            i.alias("i"), F.try_element_at(ring, i).alias("p"), F.try_element_at(ring, i + 1).alias("q")
        ),
    )


def _shoelace_area(ring: Column) -> Column:
    """|Σ (x_i·y_{i+1} − x_{i+1}·y_i)| / 2 over the closed outer ring."""
    total = F.aggregate(
        _edges(ring),
        F.lit(0.0),
        lambda acc, e: acc
        + e.getField("p").getField("x") * e.getField("q").getField("y")
        - e.getField("q").getField("x") * e.getField("p").getField("y"),
    )
    return F.abs(total) / 2.0


def _ring_well_formed(ring: Column) -> Column:
    """Closed (first == last) with at least 4 points.

    try_element_at, not element_at: Spark's common-subexpression
    elimination can hoist the extraction OUT of a short-circuiting &/|
    and evaluate it eagerly, so an empty ring (malformed WKT) would throw
    INVALID_ARRAY_INDEX instead of failing the check (r4)."""
    first, last = F.try_element_at(ring, F.lit(1)), F.try_element_at(ring, F.lit(-1))
    return F.coalesce(
        (F.size(ring) >= 4)
        & (first.getField("x") == last.getField("x"))
        & (first.getField("y") == last.getField("y")),
        F.lit(False),
    )


def _ring_self_intersects(ring: Column) -> Column:
    """Any NON-ADJACENT edge pair intersecting (adjacent edges share a
    vertex by construction; the first/last pair wraps around)."""
    ie = _indexed_edges(ring)
    last_edge = F.size(ring) - 1
    return F.exists(
        ie,
        lambda ea: F.exists(
            ie,
            lambda eb: (eb.getField("i") > ea.getField("i") + 1)
            & ~((ea.getField("i") == 1) & (eb.getField("i") == last_edge))
            & _segments_intersect(ea, eb),
        ),
    )


@register_rule("row")
def has_area_between(column: str | Column, min_area: float, max_area: float) -> Column:
    """Polygon (outer-ring shoelace) area within [min_area, max_area] in
    coordinate units² (reference geo/check_funcs.py st_area family, which
    delegates to ST_Area).  Malformed rings fail."""
    col = to_col(column)
    name = normalize_col_str(column)
    ring = _ring(col)
    area = _shoelace_area(ring)
    condition = col.isNotNull() & (
        ~_ring_well_formed(ring) | (area < float(min_area)) | (area > float(max_area))
    )
    return make_condition(
        condition,
        F.format_string(
            f"Value '%s' in Column '{name}' has area outside [{min_area}, {max_area}]", str_value(col)
        ),
        f"{name}_area_outside_band",
    )


@register_rule("row")
def has_num_points_between(column: str | Column, min_points: int, max_points: int) -> Column:
    """Total WKT coordinate-pair count within the band (reference
    st_numpoints family)."""
    col = to_col(column)
    name = normalize_col_str(column)
    n = F.size(_coords(col))
    condition = col.isNotNull() & ((n < int(min_points)) | (n > int(max_points)))
    return make_condition(
        condition,
        F.format_string(
            f"Value '%s' in Column '{name}' has a point count outside [{min_points}, {max_points}]",
            str_value(col),
        ),
        f"{name}_num_points_outside_band",
    )


# ---------------------------------------------------------------------------
# area / num-points comparator family (reference geo/check_funcs.py:553-818,
# _compare_spatial_sql_function_result over st_area / st_npoints)
# ---------------------------------------------------------------------------
def _spatial_compare(column, value, quantity: str, compare: str, srid=None, geodesic: bool = False) -> Column:
    """Shared comparator core.  ``compare`` names the FAIL condition
    (reference passes operator.ne for the equal_to check, etc.).  Planar
    coordinate-unit measurements only — the reference's srid transform /
    geodesic modes delegate to a spatial backend we don't ship (documented
    deviation; default srid=None here vs the reference's 3857)."""
    if srid is not None or geodesic:
        raise ValueError(
            "srid transforms and geodesic measurement require a spatial backend; "
            "this engine computes planar areas/counts in coordinate units (srid=None)"
        )
    from dqx_spark.functions._helpers import get_limit_expr  # noqa: PLC0415

    col = to_col(column)
    name = normalize_col_str(column)
    limit = get_limit_expr(value).cast("double")
    up = _wkt_upper(col)
    if quantity == "area":
        ring = _ring(col)
        valid = up.rlike(WKT_PATTERNS["POLYGON"]) & _ring_well_formed(ring)
        metric = _shoelace_area(ring)
        label = "area"
    else:
        valid = up.rlike(_ANY_WKT)
        metric = F.size(_coords(col)).cast("double")
        label = "number of points"
    fail = {
        "ne": metric != limit,
        "eq": metric.eqNullSafe(limit),
        "gt": metric > limit,
        "lt": metric < limit,
    }[compare]
    verb = {"ne": "not equal to", "eq": "equal to", "gt": "greater than", "lt": "less than"}[compare]
    condition = col.isNotNull() & (~valid | F.coalesce(fail, F.lit(True)))
    message = F.when(
        ~valid,
        F.format_string(f"Value '%s' in Column '{name}' is not a valid geometry", str_value(col)),
    ).otherwise(
        F.format_string(
            f"Value '%s' in Column '{name}' has {label} {verb} value '%s'", str_value(col), str_value(limit)
        )
    )
    op_name = {"ne": "not_equal_to", "eq": "equal_to", "gt": "greater_than", "lt": "less_than"}[compare]
    return make_condition(condition, message, f"{name}_{quantity}_{op_name}_limit")


@register_rule("row")
def is_area_equal_to(column: str | Column, value, srid=None, geodesic: bool = False) -> Column:
    """Polygon area == value (reference geo/check_funcs.py:553)."""
    return _spatial_compare(column, value, "area", "ne", srid, geodesic)


@register_rule("row")
def is_area_not_equal_to(column: str | Column, value, srid=None, geodesic: bool = False) -> Column:
    """Polygon area != value (reference geo/check_funcs.py:591)."""
    return _spatial_compare(column, value, "area", "eq", srid, geodesic)


@register_rule("row")
def is_area_not_greater_than(column: str | Column, value, srid=None, geodesic: bool = False) -> Column:
    """Polygon area <= value (reference geo/check_funcs.py:629)."""
    return _spatial_compare(column, value, "area", "gt", srid, geodesic)


@register_rule("row")
def is_area_not_less_than(column: str | Column, value, srid=None, geodesic: bool = False) -> Column:
    """Polygon area >= value (reference geo/check_funcs.py:667)."""
    return _spatial_compare(column, value, "area", "lt", srid, geodesic)


@register_rule("row")
def is_num_points_equal_to(column: str | Column, value) -> Column:
    """WKT coordinate-pair count == value (reference geo/check_funcs.py:705)."""
    return _spatial_compare(column, value, "num_points", "ne")


@register_rule("row")
def is_num_points_not_equal_to(column: str | Column, value) -> Column:
    """Count != value (reference geo/check_funcs.py:733)."""
    return _spatial_compare(column, value, "num_points", "eq")


@register_rule("row")
def is_num_points_not_greater_than(column: str | Column, value) -> Column:
    """Count <= value (reference geo/check_funcs.py:761)."""
    return _spatial_compare(column, value, "num_points", "gt")


@register_rule("row")
def is_num_points_not_less_than(column: str | Column, value) -> Column:
    """Count >= value (reference geo/check_funcs.py:789)."""
    return _spatial_compare(column, value, "num_points", "lt")


_DIMENSION_OF = {"POINT": 0, "MULTIPOINT": 0, "LINESTRING": 1, "MULTILINESTRING": 1, "POLYGON": 2, "MULTIPOLYGON": 2}

#: longest-first so MULTIPOINT does not tokenize as POINT inside a collection
_MEMBER_TAG_RE = "(MULTIPOINT|MULTILINESTRING|MULTIPOLYGON|POINT|LINESTRING|POLYGON)"


def _member_dim(tag: Column) -> Column:
    out = F.lit(None).cast("int")
    for t, d in _DIMENSION_OF.items():
        out = F.when(tag == t, F.lit(d)).otherwise(out)
    return out


def _collection_dimension(up: Column) -> Column:
    """Max member dimension of a (valid) GEOMETRYCOLLECTION; 0 when EMPTY —
    the OGC ST_Dimension convention (PostGIS returns 0 for the empty
    collection)."""
    body = F.regexp_replace(up, r"^\s*GEOMETRYCOLLECTION", "")
    tags = F.regexp_extract_all(body, F.lit(_MEMBER_TAG_RE), 1)
    return F.coalesce(F.array_max(F.transform(tags, _member_dim)), F.lit(0))


@register_rule("row")
def has_dimension(column: str | Column, dimension: int) -> Column:
    """Topological dimension of the WKT type tag equals ``dimension``
    (reference geo/check_funcs.py has_dimension; 0=point 1=line 2=area;
    GEOMETRYCOLLECTION = max member dimension, 0 when EMPTY).
    Unrecognized/malformed WKT fails."""
    col = to_col(column)
    name = normalize_col_str(column)
    tag = F.regexp_extract(_wkt_upper(col), r"^([A-Z]+)", 1)
    dim = F.lit(None).cast("int")
    for t, d in _DIMENSION_OF.items():
        dim = F.when((tag == t) & _wkt_upper(col).rlike(WKT_PATTERNS[t]), F.lit(d)).otherwise(dim)
    dim = F.when(
        (tag == "GEOMETRYCOLLECTION") & _wkt_upper(col).rlike(WKT_PATTERNS["GEOMETRYCOLLECTION"]),
        _collection_dimension(_wkt_upper(col)),
    ).otherwise(dim)
    condition = col.isNotNull() & (dim.isNull() | (dim != int(dimension)))
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' does not have dimension {dimension}", str_value(col)),
        f"{name}_wrong_dimension",
    )


@register_rule("row")
def is_ogc_valid(column: str | Column) -> Column:
    """OGC simple-feature validity, dependency-free subset (reference
    geo/check_funcs.py is_ogc_valid -> ST_IsValid): every POLYGON ring
    (outer and interior) must be closed, have >= 4 points, and not
    self-intersect (non-adjacent edge pairs); POINT/LINESTRING/MULTIPOINT
    validity reduces to WKT well-formedness.  Unrecognized WKT fails."""
    col = to_col(column)
    name = normalize_col_str(column)
    up = _wkt_upper(col)
    # every ring (outer AND holes since r4) must be closed, >= 4 points, and
    # free of non-adjacent edge self-intersections; cross-ring constraints
    # (holes inside the shell, holes not nested) are not checked — that
    # subset of ST_IsValid needs a full ring-containment pass per pair
    poly_ok = F.forall(
        _rings(col), lambda ring: _ring_well_formed(ring) & ~_ring_self_intersects(ring)
    )
    valid = (
        F.when(up.rlike(WKT_PATTERNS["POLYGON"]), poly_ok)
        .when(up.rlike(_ANY_WKT), F.lit(True))
        .otherwise(F.lit(False))
    )
    condition = col.isNotNull() & ~valid
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not OGC-valid", str_value(col)),
        f"{name}_not_ogc_valid",
    )


@register_rule("row")
def is_geography(column: str | Column) -> Column:
    """Valid WKT whose every coordinate fits on the globe: x in [-180, 180],
    y in [-90, 90] (reference is_geography -> try_to_geography)."""
    col = to_col(column)
    name = normalize_col_str(column)
    coords = _coords(col)
    out_of_globe = F.exists(
        coords,
        lambda c: (c.getField("x") < -180)
        | (c.getField("x") > 180)
        | (c.getField("y") < -90)
        | (c.getField("y") > 90),
    )
    condition = col.isNotNull() & (~_wkt_upper(col).rlike(_ANY_WKT) | out_of_globe)
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not a valid geography", str_value(col)),
        f"{name}_not_geography",
    )


def _parse_wkt_ring(wkt: str) -> list[tuple[float, float]]:
    """Driver-side parse of a constant geofence polygon's outer ring."""
    import re as _re

    body = _re.search(r"\(\s*\(([^)]*)\)", wkt)
    if not body:
        raise ValueError(f"geofence must be a WKT POLYGON, got {wkt!r}")
    pts = []
    for pair in body.group(1).split(","):
        xs, ys = pair.split()
        pts.append((float(xs), float(ys)))
    if len(pts) < 4 or pts[0] != pts[-1]:
        raise ValueError(f"geofence outer ring must be closed with >= 4 points: {wkt!r}")
    return pts


def _fence_lit(pts: list[tuple[float, float]]) -> Column:
    return F.array(
        *[F.struct(F.lit(x).cast("double").alias("x"), F.lit(y).cast("double").alias("y")) for x, y in pts]
    )


def _pt_in_ring_py(x: float, y: float, pts: list[tuple[float, float]]) -> bool:
    """Driver-side even-odd ray cast (same rule as :func:`_point_in_edges`)."""
    inside = False
    for (x1, y1), (x2, y2) in zip(pts, pts[1:]):
        if (y1 > y) != (y2 > y):
            xint = x1 + (x2 - x1) * (y - y1) / (y2 - y1)
            if x < xint:
                inside = not inside
    return inside


def _segs_intersect_py(a, b, c, d) -> bool:
    """Driver-side inclusive segment intersection (orientation + bbox)."""

    def cross(o, p, q):
        return (p[0] - o[0]) * (q[1] - o[1]) - (p[1] - o[1]) * (q[0] - o[0])

    d1, d2 = cross(c, d, a), cross(c, d, b)
    d3, d4 = cross(a, b, c), cross(a, b, d)
    bbox = (
        min(a[0], b[0]) <= max(c[0], d[0])
        and min(c[0], d[0]) <= max(a[0], b[0])
        and min(a[1], b[1]) <= max(c[1], d[1])
        and min(c[1], d[1]) <= max(a[1], b[1])
    )
    return d1 * d2 <= 0 and d3 * d4 <= 0 and bbox


def _polyfill_grid(
    pts: list[tuple[float, float]], max_cells: int
) -> tuple[set[str], set[str], float]:
    """Driver-side polyfill of the fence onto a square grid — the
    dependency-free re-derivation of the reference's H3 coverash3 /
    polyfillash3 split (geo/check_funcs.py:1027-1092): cells FULLY inside
    the fence (point membership is O(1), no geometry math) vs BOUNDARY
    cells (fall back to the exact ray cast).  Returns (full, boundary,
    cell_size); cell ids are "ix:iy" at floor(coord / cell_size)."""
    import math as _math

    xs, ys = [p[0] for p in pts], [p[1] for p in pts]
    span = max(max(xs) - min(xs), max(ys) - min(ys), 1e-9)
    side = max(2, int(_math.isqrt(max_cells)))
    cell = span / side
    full: set[str] = set()
    boundary: set[str] = set()
    edges = list(zip(pts, pts[1:]))
    # any cell holding a fence VERTEX is boundary: a fence edge lying
    # WHOLLY inside one cell (e.g. a concave notch smaller than a cell)
    # never crosses a cell border, so the border-intersection test alone
    # would classify that cell fully-interior and points inside the notch
    # would wrongly pass (r4 review).  An edge is either wholly inside one
    # cell (both endpoints -> vertex cells) or crosses a border (caught
    # below), so together the two tests are exhaustive.
    vertex_cells = {f"{_math.floor(px / cell)}:{_math.floor(py / cell)}" for px, py in pts}
    ix0, ix1 = _math.floor(min(xs) / cell), _math.floor(max(xs) / cell)
    iy0, iy1 = _math.floor(min(ys) / cell), _math.floor(max(ys) / cell)
    for ix in range(ix0, ix1 + 1):
        for iy in range(iy0, iy1 + 1):
            x0, y0 = ix * cell, iy * cell
            x1, y1 = x0 + cell, y0 + cell
            corners = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
            cell_edges = list(zip(corners, corners[1:] + corners[:1]))
            crossed = f"{ix}:{iy}" in vertex_cells or any(
                _segs_intersect_py(p, q, c, d) for p, q in edges for c, d in cell_edges
            )
            if crossed:
                boundary.add(f"{ix}:{iy}")
            elif all(_pt_in_ring_py(cx, cy, pts) for cx, cy in corners):
                # no fence edge enters the cell and the corners are inside:
                # the whole cell is interior
                full.add(f"{ix}:{iy}")
    return full, boundary, cell


def _geofence_condition(
    col: Column, geofence_wkt: str, predicate: str, method: str = "exact", grid_cells: int = 4096
) -> Column:
    """True when the geometry is IN the fence under the predicate.
    Points: ray-cast containment — or, with ``method='grid'``, an O(1)
    precomputed-cell lookup with the exact test only on fence-boundary
    cells.  Polygons: 'intersects' = exact polygon-polygon intersection;
    'within' = every vertex inside the fence and no edge crossing it.
    Malformed geometries are never 'in'."""
    fence_pts = _parse_wkt_ring(geofence_wkt)
    fence = _fence_lit(fence_pts)
    up = _wkt_upper(col)
    pt = _coords(col)
    if method == "grid":
        full, bnd, cell = _polyfill_grid(fence_pts, int(grid_cells))
        p1 = F.element_at(pt, 1)
        cid = F.concat_ws(
            ":",
            F.floor(p1.getField("x") / cell).cast("string"),
            F.floor(p1.getField("y") / cell).cast("string"),
        )
        # In/InSet over the literal cell ids: hash-set probe per row after
        # optimization, no geometry math on full-interior cells.  Boundary
        # cells (fence edge passes through) fall back to the exact ray cast,
        # so the grid path is EXACT overall — the grid only short-circuits.
        in_cells = (
            cid.isin(sorted(full)) if full else F.lit(False)
        ) | ((cid.isin(sorted(bnd)) if bnd else F.lit(False)) & _point_in_ring(p1, fence))
        point_in = (F.size(pt) == 1) & in_cells
    elif method == "exact":
        point_in = (F.size(pt) == 1) & _point_in_ring(F.element_at(pt, 1), fence)
    else:
        raise ValueError(f"method must be 'exact' or 'grid', got {method!r}")
    ring = _ring(col)
    edge_hit = F.exists(_edges(ring), lambda ea: F.exists(_edges(fence), lambda eb: _segments_intersect(ea, eb)))
    if predicate == "intersects":
        poly_in = _ring_well_formed(ring) & (
            edge_hit | _point_in_ring(F.element_at(ring, 1), fence) | _point_in_ring(F.element_at(fence, 1), ring)
        )
    elif predicate == "within":
        poly_in = (
            _ring_well_formed(ring)
            & ~edge_hit
            & F.forall(ring, lambda c: _point_in_ring(c, fence))
        )
    else:
        raise ValueError(f"predicate must be 'intersects' or 'within', got {predicate!r}")
    return F.when(up.rlike(WKT_PATTERNS["POINT"]), point_in).when(
        up.rlike(WKT_PATTERNS["POLYGON"]), poly_in
    ).otherwise(F.lit(False))


@register_rule("row")
def is_in_geofence(
    column: str | Column,
    geofence_wkt: str,
    predicate: str = "intersects",
    method: str = "exact",
    grid_cells: int = 4096,
) -> Column:
    """Geometry lies in a constant geofence polygon (reference
    geo/check_funcs.py geofencing contains/covers/intersects/within family).
    The fence parses once on the driver into a literal vertex array; the
    membership test is a pure Column expression (exact segment intersection
    + ray-cast containment).

    ``method='grid'`` is the scale path for POINT columns against large
    fences — the dependency-free analogue of the reference's H3
    ``coverash3``/``polyfillash3`` variants (geo/check_funcs.py:1027-1092):
    the fence is polyfilled once on the driver into <= ``grid_cells`` square
    cells; points in fully-interior cells pass with one hash-set probe and
    only fence-boundary cells run the O(|ring|) ray cast, so the result is
    still EXACT.  At a 10k-vertex continental fence this turns ~40k
    arithmetic ops per row into ~1."""
    col = to_col(column)
    name = normalize_col_str(column)
    condition = col.isNotNull() & ~_geofence_condition(col, geofence_wkt, predicate, method, grid_cells)
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not in the geofence", str_value(col)),
        f"{name}_not_in_geofence",
    )


@register_rule("row")
def is_not_in_geofence(
    column: str | Column,
    geofence_wkt: str,
    predicate: str = "intersects",
    method: str = "exact",
    grid_cells: int = 4096,
) -> Column:
    """Negation of :func:`is_in_geofence` (reference geofencing family)."""
    col = to_col(column)
    name = normalize_col_str(column)
    condition = col.isNotNull() & _geofence_condition(col, geofence_wkt, predicate, method, grid_cells)
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is inside the geofence", str_value(col)),
        f"{name}_in_geofence",
    )


@register_rule("dataset")
def are_polygons_mutually_disjoint(column: str | Column, row_filter: str | None = None, exact: bool = True):
    """Flag rows whose polygon intersects another row's polygon (reference
    geo/check_funcs.py:893, st_intersects semantics — touching counts).

    ``exact=True`` (default): bounding-box candidates are refined with an
    exact predicate (segment intersection + ray-cast containment) over ALL
    rings — interior rings included, so a polygon lying entirely inside
    another's hole is correctly disjoint (donut semantics; see
    :func:`_polygons_intersect_rings`) and disjoint polygons with
    overlapping bboxes are NOT flagged.  ``exact=False`` keeps the cheaper
    bbox-only approximation
    (conservative: clean results are trustworthy; flagged rows may be false
    positives) as the scale escape hatch when rings are huge.

    Scale shape: per-row bboxes/rings are scan-local; candidate pairs come
    from an **equi-join on integer x-interval buckets** (each box exploded
    into the buckets its x-range spans), NOT a non-equi self-join — a
    non-equi join degenerates to a broadcast nested loop (O(n²)
    comparisons), which dies long before 100 TB.  Bucket width adapts to the
    data: the global x-span divided into 1024 buckets, floored at the
    90th-percentile box width so a typical box lands in O(1) buckets (one
    small driver action over the slim boxes frame, same discipline as the
    MAD check's medians).  The exact predicate runs only on bbox-candidate
    pairs — O(|ring_a|·|ring_b|) per candidate, the same bound as any exact
    geometry engine.

    Row identity uses ``monotonically_increasing_id`` — stable WITHIN one
    evaluation (candidate join and flag rejoin sit in the same plan), but a
    re-run may assign different ids, so which row of an intersecting pair is
    "first" is not reproducible across retries.  Only the symmetric outputs
    (flag + overlap count) are exposed, both invariant to that ordering."""
    col = to_col(column)
    name = normalize_col_str(column)
    sfx = unique_suffix()
    msg_col = f"__dq_geo_msg_{sfx}"
    rid = f"__dq_geo_id_{sfx}"

    def apply(df: DataFrame) -> DataFrame:
        coords = _coords(col)
        with_box = (
            df.withColumn(rid, F.monotonically_increasing_id())
            .withColumn(
                "__bb",
                F.struct(
                    F.aggregate(coords, F.lit(float("inf")), lambda a, c: F.least(a, c.getField("x"))).alias("xmin"),
                    F.aggregate(coords, F.lit(float("-inf")), lambda a, c: F.greatest(a, c.getField("x"))).alias("xmax"),
                    F.aggregate(coords, F.lit(float("inf")), lambda a, c: F.least(a, c.getField("y"))).alias("ymin"),
                    F.aggregate(coords, F.lit(float("-inf")), lambda a, c: F.greatest(a, c.getField("y"))).alias("ymax"),
                ),
            )
            .withColumn("__ring", _rings(col))
        )
        boxes = with_box.select(rid, "__bb", "__ring")
        if row_filter:
            boxes = with_box.where(F.expr(row_filter)).select(rid, "__bb", "__ring")
        boxes = boxes.where(
            F.col("__bb.xmin").isNotNull() & ~F.isnan("__bb.xmin") & (F.col("__bb.xmin") <= F.col("__bb.xmax"))
        )
        # bucket width from a broadcast 1-row aggregate — kept LAZY
        # (crossJoin, no .first()): apply_checks guarantees zero Spark
        # actions at plan-construction time, and an eager action here would
        # also scan the input once per rule (r4 review; same discipline as
        # has_no_outliers' lazy broadcast stats).  With zero valid boxes
        # the crossJoin's left side is empty -> no candidate pairs -> no
        # rows flagged, which is the correct verdict (greatest() skips the
        # null span/percentile and floors the width at 1e-9 regardless).
        stats = boxes.agg(
            F.greatest(
                (F.max("__bb.xmax") - F.min("__bb.xmin")) / F.lit(1024.0),
                F.coalesce(F.percentile_approx(F.col("__bb.xmax") - F.col("__bb.xmin"), 0.9), F.lit(0.0)),
                F.lit(1e-9),
            ).alias("__dq_geo_width"),
        )
        width = F.col("__dq_geo_width")
        # the 1-row broadcast crossJoin plans as a BroadcastNestedLoopJoin
        # with a single-row build side — the standard O(n) scalar-attach
        # shape (same as scalar subqueries), NOT an n^2 pairing join; the
        # candidate pairing below stays on the __bucket equi-join
        bucketed = boxes.crossJoin(F.broadcast(stats)).select(
            F.col(rid).alias("__bid"),
            "__bb",
            "__ring",
            F.explode(
                F.sequence(
                    F.floor(F.col("__bb.xmin") / width).cast("long"),
                    F.floor(F.col("__bb.xmax") / width).cast("long"),
                )
            ).alias("__bucket"),
        )
        a = bucketed.select(F.col("__bid").alias("ida"), F.col("__bb").alias("ba"), F.col("__ring").alias("ra"), "__bucket")
        b = bucketed.select(F.col("__bid").alias("idb"), F.col("__bb").alias("bb"), F.col("__ring").alias("rb"), "__bucket")
        candidates = (
            a.join(b, "__bucket")
            .where(
                (F.col("ida") < F.col("idb"))
                & (F.col("ba.xmin") <= F.col("bb.xmax"))
                & (F.col("bb.xmin") <= F.col("ba.xmax"))
                & (F.col("ba.ymin") <= F.col("bb.ymax"))
                & (F.col("bb.ymin") <= F.col("ba.ymax"))
            )
        )
        if exact:
            candidates = candidates.where(
                (F.size(F.element_at(F.col("ra"), 1)) >= 4)
                & (F.size(F.element_at(F.col("rb"), 1)) >= 4)
                & _polygons_intersect_rings(F.col("ra"), F.col("rb"))
            )
        pairs = candidates.select("ida", "idb").distinct()
        overlap = (
            pairs.select("ida")
            .union(pairs.select(F.col("idb").alias("ida")))
            .groupBy("ida")
            .agg(F.count(F.lit(1)).alias("__n_overlaps"))
        )
        out = with_box.join(overlap, with_box[rid] == overlap["ida"], "left").drop("ida")
        verb = "intersects" if exact else "overlaps the bounding box of"
        message = F.when(
            F.col("__n_overlaps").isNotNull(),
            F.format_string(
                f"Polygon in Column '{name}' {verb} %s other polygon(s)",
                F.col("__n_overlaps").cast("string"),
            ),
        )
        return out.withColumn(msg_col, message).drop(rid, "__bb", "__ring", "__n_overlaps")

    from dqx_spark.functions.dataset_checks import _lift

    return _lift(msg_col, f"{name}_polygons_not_disjoint"), apply


# ---------------------------------------------------------------------------
# topological relationship family (reference geo/check_funcs.py:1094-1342,
# st_contains / st_covers / st_intersects / st_touches / st_within)
# ---------------------------------------------------------------------------
def _segments_cross_strict(ea: Column, eb: Column) -> Column:
    """PROPER crossing: the segments intersect at a point interior to both
    (all four orientations strictly nonzero) — touching does not count."""
    a1, a2, b1, b2 = ea.getField("p"), ea.getField("q"), eb.getField("p"), eb.getField("q")
    d1, d2 = _cross(b1, b2, a1), _cross(b1, b2, a2)
    d3, d4 = _cross(a1, a2, b1), _cross(a1, a2, b2)
    return (d1 * d2 < 0) & (d3 * d4 < 0)


def _point_on_edges(pt: Column, edges: Column) -> Column:
    """Exact point-on-boundary: collinear with some edge and inside its
    bbox (cross product exactly zero)."""
    px, py = pt.getField("x"), pt.getField("y")

    def on_edge(e: Column) -> Column:
        p, q = e.getField("p"), e.getField("q")
        collinear = _cross(p, q, pt) == 0
        in_box = (
            (px >= F.least(p.getField("x"), q.getField("x")))
            & (px <= F.greatest(p.getField("x"), q.getField("x")))
            & (py >= F.least(p.getField("y"), q.getField("y")))
            & (py <= F.greatest(p.getField("y"), q.getField("y")))
        )
        return collinear & in_box

    return F.exists(edges, on_edge)


def _geo_relation(col_geom: Column, ref_geom: Column, relation: str) -> Column:
    """True when ``relation`` holds between the column geometry and the
    reference geometry.  Dependency-free subset: POINT and POLYGON
    (outer-ring) WKT; boundary tests are exact (collinearity + orientation
    arithmetic, no epsilon).  For polygons, ``within``/``covers`` assume
    non-degenerate (positive-area) inputs, where closure containment
    implies interior overlap."""
    up_a = _wkt_upper(col_geom)
    ring_r = _ring(ref_geom)
    edges_r = _edges(ring_r)

    # try_element_at throughout: CSE can hoist extractions out of the
    # type-dispatch when(), so empty coordinate arrays must yield NULL
    # (-> relation false) rather than INVALID_ARRAY_INDEX
    pt = F.try_element_at(_coords(col_geom), F.lit(1))
    pt_on = _point_on_edges(pt, edges_r)
    pt_in = _point_in_ring(pt, ring_r) & ~pt_on
    point_rel = {
        "intersects": pt_in | pt_on,
        "within": pt_in,        # OGC: a boundary point's interior does not intersect the interior
        "contains": pt_in,      # reference: no boundary contact allowed (:1100-1104)
        "covers": pt_in | pt_on,
        "touches": pt_on,
    }[relation]

    ring_a = _ring(col_geom)
    edges_a = _edges(ring_a)
    contact = F.exists(edges_a, lambda ea: F.exists(edges_r, lambda eb: _segments_intersect(ea, eb)))
    strict_cross = F.exists(edges_a, lambda ea: F.exists(edges_r, lambda eb: _segments_cross_strict(ea, eb)))

    def strictly_in(v: Column) -> Column:
        return _point_in_ring(v, ring_r) & ~_point_on_edges(v, edges_r)

    all_in_or_on = F.forall(ring_a, lambda v: _point_in_ring(v, ring_r) | _point_on_edges(v, edges_r))
    all_strict_in = F.forall(ring_a, strictly_in)
    any_strict_in = F.exists(ring_a, strictly_in)
    ref_vertex_in_a = _point_in_ring(F.try_element_at(ring_r, F.lit(1)), ring_a)
    poly_rel = {
        "intersects": contact | _point_in_ring(F.try_element_at(ring_a, F.lit(1)), ring_r) | ref_vertex_in_a,
        "covers": all_in_or_on & ~strict_cross,
        "within": all_in_or_on & ~strict_cross,
        "contains": all_strict_in & ~contact,
        "touches": contact & ~any_strict_in & ~strict_cross & ~ref_vertex_in_a,
    }[relation]
    poly_rel = _ring_well_formed(ring_a) & poly_rel

    return (
        F.when(up_a.rlike(WKT_PATTERNS["POINT"]), point_rel)
        .when(up_a.rlike(WKT_PATTERNS["POLYGON"]), poly_rel)
        .otherwise(F.lit(False))
    )


def _geo_relation_point_ref(col_geom: Column, px: float, py: float, relation: str) -> Column:
    """``relation`` between the column geometry and a POINT reference —
    exact OGC semantics computable with the existing primitives: a point
    has no boundary (touches between points is false; contains == covers),
    and a positive-area polygon can only be within/covered-by a point when
    degenerate (every vertex equal to it)."""
    up_a = _wkt_upper(col_geom)
    p = F.struct(F.lit(float(px)).alias("x"), F.lit(float(py)).alias("y"))

    def eq_p(v: Column) -> Column:
        return (v.getField("x") == p.getField("x")) & (v.getField("y") == p.getField("y"))

    q = F.try_element_at(_coords(col_geom), F.lit(1))
    eq = F.coalesce(eq_p(q), F.lit(False))
    point_rel = {
        "intersects": eq, "within": eq, "contains": eq, "covers": eq, "touches": F.lit(False)
    }[relation]

    ring_a = _ring(col_geom)
    edges_a = _edges(ring_a)
    on_boundary = _point_on_edges(p, edges_a)
    strict_in = _point_in_ring(p, ring_a) & ~on_boundary
    degenerate = F.forall(ring_a, eq_p)
    poly_rel = {
        "intersects": strict_in | on_boundary,
        "within": degenerate,
        "covers": degenerate,
        "contains": degenerate,
        "touches": on_boundary & ~strict_in,
    }[relation]
    poly_rel = _ring_well_formed(ring_a) & poly_rel
    return (
        F.when(up_a.rlike(WKT_PATTERNS["POINT"]), point_rel)
        .when(up_a.rlike(WKT_PATTERNS["POLYGON"]), poly_rel)
        .otherwise(F.lit(False))
    )


def _geo_relation_check(
    column, reference_geometry, relation: str, label: str
) -> Column:
    """Shared wrapper: fail when the relation does NOT hold.  NULL column
    values pass; malformed/unsupported WKT — on EITHER side — fails (never
    silently 'holds': a bad reference would otherwise disable the check,
    r4 review).  ``reference_geometry``: plain string = literal WKT (never
    a column name, matching the reference); Column = per-row geometry.
    WKB bytes are not supported without a spatial backend."""
    import re as _re  # noqa: PLC0415

    if isinstance(reference_geometry, bytes):
        raise ValueError("WKB reference_geometry requires a spatial backend; pass WKT")
    point_ref: tuple[float, float] | None = None
    if isinstance(reference_geometry, str):
        # literal: validate eagerly on the driver — a typo'd fence is a
        # configuration error, not a data-quality verdict
        stripped = reference_geometry.strip().upper()
        num = r"[-+]?(\d+\.?\d*|\.\d+)([eE][-+]?\d+)?"
        m = _re.match(rf"^POINT\s*\(\s*({num})\s+({num})\s*\)$", stripped)
        if m:
            try:
                point_ref = (float(m.group(1)), float(m.group(4)))
            except ValueError as e:  # pragma: no cover - regex admits only floats
                raise InvalidParameterError(f"bad POINT coordinates in {reference_geometry!r}") from e
        elif not _re.match(WKT_PATTERNS["POLYGON"], stripped):
            raise InvalidParameterError(
                "reference_geometry must be a well-formed POLYGON or POINT WKT literal, "
                f"got {reference_geometry!r}"
            )
        else:
            _parse_wkt_ring(reference_geometry)  # closed outer ring with >= 4 points, or ValueError
        ref = F.lit(reference_geometry)
        ref_ok = F.lit(True)
    else:
        ref = reference_geometry
        # per-row reference column: a malformed/non-polygon value FAILS the
        # row (relation cannot be established) instead of silently passing
        ref_ok = _wkt_upper(ref).rlike(WKT_PATTERNS["POLYGON"]) & _ring_well_formed(_ring(ref))
    col = to_col(column)
    name = normalize_col_str(column)
    rel = (
        _geo_relation_point_ref(col, point_ref[0], point_ref[1], relation)
        if point_ref is not None
        else _geo_relation(col, ref, relation)
    )
    holds = F.coalesce(ref_ok, F.lit(False)) & F.coalesce(rel, F.lit(False))
    condition = col.isNotNull() & ~holds
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' {label} the reference geometry", str_value(col)),
        f"{name}_not_{relation}_reference",
    )


@register_rule("row")
def is_geo_contains(
    column,
    reference_geometry,
    convert_column: bool = False,
    convert_reference_geometry: bool = False,
) -> Column:
    """Reference geometry strictly contains the column geometry — no
    boundary contact (reference geo/check_funcs.py:1094, st_contains).
    The convert flags are accepted for signature parity; WKT parsing is
    inherent to this engine, so they are no-ops."""
    return _geo_relation_check(column, reference_geometry, "contains", "is not contained by")


@register_rule("row")
def is_geo_covers(
    column,
    reference_geometry,
    precise: bool = False,
    resolution=None,
    convert_column: bool = False,
    convert_reference_geometry: bool = False,
) -> Column:
    """Reference geometry covers the column geometry, boundary-inclusive
    (reference geo/check_funcs.py:1137, st_covers).  Always computed
    exactly — the reference's H3-approximate mode (``precise=False`` +
    ``resolution``) needs the h3 library, so both flags are accepted and
    ignored (documented deviation: exactness is a superset guarantee)."""
    return _geo_relation_check(column, reference_geometry, "covers", "is not covered by")


@register_rule("row")
def is_geo_intersects(
    column,
    reference_geometry,
    precise: bool = False,
    resolution=None,
    convert_column: bool = False,
    convert_reference_geometry: bool = False,
) -> Column:
    """Column geometry shares at least one point with the reference
    (reference geo/check_funcs.py:1200, st_intersects; exact, see
    :func:`is_geo_covers` for the flag semantics)."""
    return _geo_relation_check(column, reference_geometry, "intersects", "does not intersect")


@register_rule("row")
def is_geo_touches(
    column,
    reference_geometry,
    convert_column: bool = False,
    convert_reference_geometry: bool = False,
) -> Column:
    """Boundary contact without interior overlap
    (reference geo/check_funcs.py:1261, st_touches)."""
    return _geo_relation_check(column, reference_geometry, "touches", "does not touch")


@register_rule("row")
def is_geo_within(
    column,
    reference_geometry,
    convert_column: bool = False,
    convert_reference_geometry: bool = False,
) -> Column:
    """Column geometry lies within the reference geometry (boundary contact
    allowed for polygons; a bare boundary POINT is not within)
    (reference geo/check_funcs.py:1302, st_within)."""
    return _geo_relation_check(column, reference_geometry, "within", "is not within")

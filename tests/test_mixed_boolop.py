"""S2BooleanOperation mixed-dimension / degeneracy goldens ported from
S2GeometryTests/S2BooleanOperationTests.cs (the named model battery,
:57-1055, plus SelfIntersectingPolylines :2393).  Comparison mirrors
the reference's IndexMatchingLayer: per-dimension directed-edge
multisets, with dim-2 degenerate-edge / sibling-pair multiplicity
relaxed (S2BooleanOperationTests.cs:2349-2366)."""

import pytest

from s2geometry_spark.kernels import mixed_boolop as MB

UNION = MB.UNION
INT = MB.INTERSECTION
DIFF = MB.DIFFERENCE
SYM = MB.SYMMETRIC_DIFFERENCE


def expect(op, a, b, expected, **kw):
    options = MB.Options(**kw)
    got = MB.boolean_operation(
        MB.parse_index(a), MB.parse_index(b), op, options
    )
    want = MB.expected_from_text(expected, options)
    gn, wn = MB.normalize_result(got), MB.normalize_result(want)
    assert gn == wn, f"{op}: got {gn}\nwant {wn}"


ALL_MODELS = (MB.OPEN, MB.SEMI_OPEN, MB.CLOSED)


# ---------------------------------------------------------------------
# degeneracy preservation (S2BooleanOperationTests.cs:57-86)
# ---------------------------------------------------------------------


@pytest.mark.parametrize("model", ALL_MODELS)
def test_degenerate_polylines(model):
    a = "# 0:0, 0:0 #"
    expect(UNION, a, "# #", a, polyline_model=model)


@pytest.mark.parametrize("model", ALL_MODELS)
def test_degenerate_polygons(model):
    a = "# # 0:0, 0:5, 5:5, 5:0; 1:1; 2:2, 3:3; 6:6; 7:7, 8:8"
    expect(UNION, a, "# #", a, polygon_model=model)


# ---------------------------------------------------------------------
# point x point (:88-104)
# ---------------------------------------------------------------------


def test_point_point():
    a = "0:0 | 1:0 # #"
    b = "0:0 | 2:0 # #"
    expect(UNION, a, b, "0:0 | 0:0 | 1:0 | 2:0 # #")
    expect(INT, a, b, "0:0 | 0:0 # #")
    expect(DIFF, a, b, "1:0 # #")
    expect(SYM, a, b, "1:0 | 2:0 # #")


# ---------------------------------------------------------------------
# point x polyline models (:106-216)
# ---------------------------------------------------------------------

PT_A = "0:0 | 1:0 | 2:0 | 3:0 | 4:0 | 5:0 # #"
PT_B = "# 0:0, 1:0, 2:0 | 3:0, 3:0 | 4:0, 5:0, 4:0 #"
PT_B_LINES = "# 0:0, 1:0, 2:0 | 3:0, 3:0 | 4:0, 5:0, 4:0 #"


def test_point_open_polyline():
    kw = dict(polyline_model=MB.OPEN)
    expect(UNION, PT_A, PT_B,
           "0:0 | 2:0 | 3:0 | 4:0 " + PT_B_LINES, **kw)
    expect(INT, PT_A, PT_B, "1:0 | 5:0 # #", **kw)
    expect(DIFF, PT_A, PT_B, "0:0 | 2:0 | 3:0 | 4:0 # #", **kw)
    expect(SYM, PT_A, PT_B,
           "0:0 | 2:0 | 3:0 | 4:0 " + PT_B_LINES, **kw)


def test_point_open_polyline_loop_boundaries_false():
    kw = dict(polyline_model=MB.OPEN, polyline_loops_have_boundaries=False)
    expect(UNION, PT_A, PT_B, "0:0 | 2:0 | 3:0 " + PT_B_LINES, **kw)
    expect(INT, PT_A, PT_B, "1:0 | 4:0 | 5:0 # #", **kw)
    expect(DIFF, PT_A, PT_B, "0:0 | 2:0 | 3:0 # #", **kw)
    expect(SYM, PT_A, PT_B, "0:0 | 2:0 | 3:0 " + PT_B_LINES, **kw)


@pytest.mark.parametrize("lb", (False, True))
def test_point_semi_open_polyline(lb):
    kw = dict(polyline_model=MB.SEMI_OPEN,
              polyline_loops_have_boundaries=lb)
    expect(UNION, PT_A, PT_B, "2:0 | 3:0 " + PT_B_LINES, **kw)
    expect(INT, PT_A, PT_B, "0:0 | 1:0 | 4:0 | 5:0 # #", **kw)
    expect(DIFF, PT_A, PT_B, "2:0 | 3:0 # #", **kw)
    expect(SYM, PT_A, PT_B, "2:0 | 3:0 " + PT_B_LINES, **kw)


@pytest.mark.parametrize("lb", (False, True))
def test_point_closed_polyline(lb):
    kw = dict(polyline_model=MB.CLOSED,
              polyline_loops_have_boundaries=lb)
    expect(UNION, PT_A, PT_B, PT_B_LINES, **kw)
    expect(INT, PT_A, PT_B, PT_A, **kw)
    expect(DIFF, PT_A, PT_B, "# #", **kw)
    expect(SYM, PT_A, PT_B, PT_B_LINES, **kw)


# ---------------------------------------------------------------------
# point x polygon (:218-298)
# ---------------------------------------------------------------------


def test_point_polygon_interior():
    a = "1:1 | 4:4 # #"
    b = "# # 0:0, 0:3, 3:0"
    expect(UNION, a, b, "4:4 # # 0:0, 0:3, 3:0")
    expect(INT, a, b, "1:1 # #")
    expect(DIFF, a, b, "4:4 # #")
    expect(SYM, a, b, "4:4 # # 0:0, 0:3, 3:0")


def test_point_open_polygon_vertex():
    kw = dict(polygon_model=MB.OPEN)
    a = "0:1 | 1:0 # #"
    b = "# # 0:0, 0:1, 1:0"
    expect(UNION, a, b, "0:1 | 1:0 # # 0:0, 0:1, 1:0", **kw)
    expect(INT, a, b, "# #", **kw)
    expect(DIFF, a, b, "0:1 | 1:0 # #", **kw)
    expect(SYM, a, b, "0:1 | 1:0 # # 0:0, 0:1, 1:0", **kw)


def test_point_semi_open_polygon_vertex():
    # semi-open: the polygon contains vertex 0:1 but not 1:0
    kw = dict(polygon_model=MB.SEMI_OPEN)
    a = "0:1 | 1:0 # #"
    b = "# # 0:0, 0:1, 1:0"
    expect(UNION, a, b, "1:0 # # 0:0, 0:1, 1:0", **kw)
    expect(INT, a, b, "0:1 # #", **kw)
    expect(DIFF, a, b, "1:0 # #", **kw)
    expect(SYM, a, b, "1:0 # # 0:0, 0:1, 1:0", **kw)


def test_point_closed_polygon_vertex():
    kw = dict(polygon_model=MB.CLOSED)
    a = "0:1 | 1:0 # #"
    b = "# # 0:0, 0:1, 1:0"
    expect(UNION, a, b, "# # 0:0, 0:1, 1:0", **kw)
    expect(INT, a, b, "0:1 | 1:0 # #", **kw)
    expect(DIFF, a, b, "# #", **kw)
    expect(SYM, a, b, "# # 0:0, 0:1, 1:0", **kw)


# ---------------------------------------------------------------------
# polyline vertex x polyline vertex (:300-450)
# ---------------------------------------------------------------------

PV_A = "# 0:0, 0:1, 0:2 | 0:3, 0:4, 0:3 #"
PV_B = ("# 0:0, 1:0 | -1:1, 0:1, 1:1 | -1:2, 0:2 "
        "| 1:3, 0:3, 1:3 | 0:4, 1:4, 0:4 #")
PV_UNION = ("# 0:0, 0:1, 0:2 | 0:0, 1:0 | -1:1, 0:1, 1:1 | -1:2, 0:2 "
            "| 0:3, 0:4, 0:3 | 1:3, 0:3, 1:3 | 0:4, 1:4, 0:4 #")


def test_polyline_vertex_open_polyline_vertex():
    kw = dict(polyline_model=MB.OPEN)
    expect(UNION, PV_A, PV_B, PV_UNION, **kw)
    expect(INT, PV_A, PV_B, "# 0:1, 0:1 | 0:1, 0:1 #", **kw)
    expect(DIFF, PV_A, PV_B, PV_A, **kw)
    expect(SYM, PV_A, PV_B, PV_UNION, **kw)


def test_polyline_vertex_open_polyline_vertex_loop_boundaries_false():
    kw = dict(polyline_model=MB.OPEN,
              polyline_loops_have_boundaries=False)
    expect(UNION, PV_A, PV_B, PV_UNION, **kw)
    expect(INT, PV_A, PV_B,
           "# 0:1, 0:1 | 0:1, 0:1 "
           "| 0:3, 0:3 | 0:3, 0:3 | 0:4, 0:4 | 0:4, 0:4 #", **kw)
    expect(DIFF, PV_A, PV_B, PV_A, **kw)
    expect(SYM, PV_A, PV_B, PV_UNION, **kw)


@pytest.mark.parametrize("lb", (False, True))
def test_polyline_vertex_semi_open_polyline_vertex(lb):
    kw = dict(polyline_model=MB.SEMI_OPEN,
              polyline_loops_have_boundaries=lb)
    expect(UNION, PV_A, PV_B, PV_UNION, **kw)
    expect(INT, PV_A, PV_B,
           "# 0:0, 0:0 | 0:0, 0:0 | 0:1, 0:1 | 0:1, 0:1 "
           "| 0:3, 0:3 | 0:3, 0:3 | 0:4, 0:4 | 0:4, 0:4 #", **kw)
    expect(DIFF, PV_A, PV_B, PV_A, **kw)
    expect(SYM, PV_A, PV_B, PV_UNION, **kw)


def test_polyline_vertex_closed_polyline_vertex():
    kw = dict(polyline_model=MB.CLOSED)
    expect(UNION, PV_A, PV_B, PV_UNION, **kw)
    expect(INT, PV_A, PV_B,
           "# 0:0, 0:0 | 0:0, 0:0 | 0:1, 0:1 | 0:1, 0:1 "
           "| 0:2, 0:2 | 0:2, 0:2 "
           "| 0:3, 0:3 | 0:3, 0:3 | 0:3, 0:3 "
           "| 0:4, 0:4 | 0:4, 0:4 | 0:4, 0:4 #", **kw)
    expect(DIFF, PV_A, PV_B, PV_A, **kw)
    expect(SYM, PV_A, PV_B, PV_UNION, **kw)


def test_polyline_vertex_closed_polyline_vertex_loop_boundaries_false():
    kw = dict(polyline_model=MB.CLOSED,
              polyline_loops_have_boundaries=False)
    expect(UNION, PV_A, PV_B, PV_UNION, **kw)
    expect(INT, PV_A, PV_B,
           "# 0:0, 0:0 | 0:0, 0:0 | 0:1, 0:1 | 0:1, 0:1 "
           "| 0:2, 0:2 | 0:2, 0:2 "
           "| 0:3, 0:3 | 0:3, 0:3 | 0:4, 0:4 | 0:4, 0:4 #", **kw)
    expect(DIFF, PV_A, PV_B, PV_A, **kw)
    expect(SYM, PV_A, PV_B, PV_UNION, **kw)


# ---------------------------------------------------------------------
# polyline vertex x polygon vertex (:472-586); polyline model CLOSED
# ---------------------------------------------------------------------

VERTEX_POLY = "0:0, 0:1, 0:2, 0:3, 0:4, 0:5, 5:5, 5:4, 5:3, 5:2, 5:1, 5:0"
PVP_A = ("# 1:1, 0:1 | 0:2, 1:2 | -1:3, 0:3 | 0:4, -1:4 "
         "| 6:1, 5:1 | 5:2, 6:2 | 4:3, 5:3 | 5:4, 4:4 #")
PVP_B = "# # " + VERTEX_POLY


def test_polyline_vertex_open_polygon_vertex():
    kw = dict(polygon_model=MB.OPEN)
    diff = ("# 0:1, 0:1 | 0:2, 0:2 | -1:3, 0:3 | 0:4, -1:4"
            "| 6:1, 5:1 | 5:2, 6:2 | 5:3, 5:3 | 5:4, 5:4 #")
    expect(UNION, PVP_A, PVP_B, diff + VERTEX_POLY, **kw)
    expect(INT, PVP_A, PVP_B,
           "# 1:1, 0:1 | 0:2, 1:2 | 4:3, 5:3 | 5:4, 4:4 #", **kw)
    expect(DIFF, PVP_A, PVP_B, diff, **kw)
    expect(SYM, PVP_A, PVP_B, diff + VERTEX_POLY, **kw)


def test_polyline_vertex_open_polygon_closed_polyline_vertex():
    # every polygon vertex also incident to a closed polyline vertex:
    # open polygon vertices become closed via the coincident polyline
    suffix = ("-2:0, 0:1 | -2:1, 0:2 | -2:2, 0:3 | -2:3, 0:4 | "
              "7:0, 5:1 | 7:1, 5:2 | 7:2, 5:3 | 7:3, 5:4 # "
              + VERTEX_POLY)
    kw = dict(polygon_model=MB.OPEN)
    a = PVP_A
    b = "# " + suffix
    prefix = "# -1:3, 0:3 | 0:4, -1:4 | 6:1, 5:1 | 5:2, 6:2"
    expect(UNION, a, b,
           prefix + " | 0:1, 0:1 | 0:2, 0:2 | 5:3, 5:3 | 5:4, 5:4 | "
           + suffix, **kw)
    expect(INT, a, b,
           "# 1:1, 0:1 | 0:2, 1:2 | 0:3, 0:3 | 0:4, 0:4"
           "| 5:1, 5:1 | 5:2, 5:2 | 4:3, 5:3 | 5:4, 4:4"
           "| 0:1, 0:1 | 0:2, 0:2 | 0:3, 0:3 | 0:4, 0:4"
           "| 5:1, 5:1 | 5:2, 5:2 | 5:3, 5:3 | 5:4, 5:4 #", **kw)
    expect(DIFF, a, b, prefix + " #", **kw)
    expect(SYM, a, b, prefix + " | " + suffix, **kw)


def test_polyline_vertex_semi_open_polygon_vertex():
    kw = dict(polygon_model=MB.SEMI_OPEN)
    diff = ("# -1:3, 0:3 | 0:4, -1:4 | 6:1, 5:1 | 5:2, 6:2 "
            "| 5:3, 5:3 | 5:4, 5:4 #")
    expect(UNION, PVP_A, PVP_B, diff + VERTEX_POLY, **kw)
    expect(INT, PVP_A, PVP_B,
           "# 1:1, 0:1 | 0:2, 1:2 | 0:3, 0:3 | 0:4, 0:4 "
           "| 4:3, 5:3 | 5:4, 4:4 #", **kw)
    expect(DIFF, PVP_A, PVP_B, diff, **kw)
    expect(SYM, PVP_A, PVP_B, diff + VERTEX_POLY, **kw)


def test_polyline_vertex_closed_polygon_vertex():
    kw = dict(polygon_model=MB.CLOSED)
    diff = "# -1:3, 0:3 | 0:4, -1:4 | 6:1, 5:1 | 5:2, 6:2 #"
    expect(UNION, PVP_A, PVP_B, diff + VERTEX_POLY, **kw)
    expect(INT, PVP_A, PVP_B,
           "# 1:1, 0:1 | 0:2, 1:2 | 0:3, 0:3 | 0:4, 0:4"
           "| 5:1, 5:1 | 5:2, 5:2 | 4:3, 5:3 | 5:4, 4:4 #", **kw)
    expect(DIFF, PVP_A, PVP_B, diff, **kw)
    expect(SYM, PVP_A, PVP_B, diff + VERTEX_POLY, **kw)


# ---------------------------------------------------------------------
# polyline edge x polyline edge (:588-736)
# ---------------------------------------------------------------------


def test_polyline_edge_polyline_edge_crossing():
    kw = dict(snap_exponent=1)
    a = "# 0:0, 2:2 #"
    b = "# 2:0, 0:2 #"
    expect(UNION, a, b, "# 0:0, 1:1, 2:2 | 2:0, 1:1, 0:2 #", **kw)
    expect(INT, a, b, "# 1:1, 1:1 | 1:1, 1:1 #", **kw)
    expect(DIFF, a, b, "# 0:0, 1:1, 2:2 #", **kw)
    expect(SYM, a, b, "# 0:0, 1:1, 2:2 | 2:0, 1:1, 0:2 #", **kw)


def test_polyline_edge_polyline_edge_overlap():
    kw = dict(polygon_model=MB.OPEN)
    a = "# 0:0, 1:0, 2:0, 2:5 | 3:0, 3:0 | 6:0, 5:0, 4:0 #"
    b = "# 0:0, 1:0, 2:0 | 3:0, 3:0 | 4:0, 5:0 #"
    expect(UNION, a, b,
           "# 0:0, 1:0, 2:0, 2:5 | 0:0, 1:0, 2:0 | 3:0, 3:0 | 3:0, 3:0 "
           "| 6:0, 5:0, 4:0 | 4:0, 5:0 #", **kw)
    expect(INT, a, b,
           "# 0:0, 1:0, 2:0 | 0:0, 1:0, 2:0 | 3:0, 3:0 | 3:0, 3:0 "
           "| 5:0, 4:0 | 4:0, 5:0 #", **kw)
    expect(DIFF, a, b, "# 2:0, 2:5 | 6:0, 5:0 #", **kw)
    expect(SYM, a, b, "# 2:0, 2:5 | 6:0, 5:0 #", **kw)


LOOP_A = "# 0:0, 0:1, 1:0, 0:0 | 2:2, 2:3, 3:2, 2:2 #"
LOOP_B = "# 0:0, 0:0 | 0:0, 0:1 | 2:2, 2:2 | 2:2, 3:2 #"
LOOP_UNION = ("# 0:0, 0:1, 1:0, 0:0 | 0:0, 0:0 | 0:0, 0:1 "
              "| 2:2, 2:3, 3:2, 2:2 | 2:2, 2:2 | 2:2, 3:2 #")


def test_polyline_loop_multiple_open_polyline_edge():
    kw = dict(polyline_model=MB.OPEN)
    expect(UNION, LOOP_A, LOOP_B, LOOP_UNION, **kw)
    expect(INT, LOOP_A, LOOP_B,
           "# 0:0, 0:1 | 0:0, 0:1 | 2:2, 3:2 | 3:2, 2:2 #", **kw)
    expect(DIFF, LOOP_A, LOOP_B,
           "# 0:1, 1:0, 0:0 | 2:2, 2:3, 3:2 #", **kw)
    expect(SYM, LOOP_A, LOOP_B,
           "# 0:1, 1:0, 0:0 | 0:0, 0:0 | 2:2, 2:3, 3:2 | 2:2, 2:2 #",
           **kw)


def test_polyline_loop_multiple_semi_open_polyline_edge():
    kw = dict(polyline_model=MB.SEMI_OPEN)
    expect(UNION, LOOP_A, LOOP_B, LOOP_UNION, **kw)
    expect(INT, LOOP_A, LOOP_B,
           "# 0:0, 0:0 | 0:0, 0:1 | 0:0, 0:1 "
           "| 2:2, 2:2 | 2:2, 2:2 | 2:2, 3:2 | 3:2, 2:2 #", **kw)
    expect(DIFF, LOOP_A, LOOP_B,
           "# 0:1, 1:0, 0:0 | 2:2, 2:3, 3:2 #", **kw)
    expect(SYM, LOOP_A, LOOP_B,
           "# 0:1, 1:0, 0:0 | 2:2, 2:3, 3:2 #", **kw)


def test_polyline_loop_multiple_closed_polyline_edge():
    kw = dict(polyline_model=MB.CLOSED)
    expect(UNION, LOOP_A, LOOP_B, LOOP_UNION, **kw)
    expect(INT, LOOP_A, LOOP_B,
           "# 0:0, 0:0 | 0:0, 0:0 | 0:0, 0:1 | 0:0, 0:1 "
           "| 2:2, 2:2 | 2:2, 2:2 | 2:2, 3:2 | 3:2, 2:2 #", **kw)
    expect(DIFF, LOOP_A, LOOP_B,
           "# 0:1, 1:0, 0:0 | 2:2, 2:3, 3:2 #", **kw)
    expect(SYM, LOOP_A, LOOP_B,
           "# 0:1, 1:0, 0:0 | 2:2, 2:3, 3:2 #", **kw)


@pytest.mark.parametrize("model", ALL_MODELS)
def test_polyline_loop_multiple_polyline_edge_loop_boundaries_false(model):
    kw = dict(polyline_model=model, polyline_loops_have_boundaries=False)
    expect(UNION, LOOP_A, LOOP_B, LOOP_UNION, **kw)
    expect(INT, LOOP_A, LOOP_B,
           "# 0:0, 0:0 | 0:0, 0:1 | 0:0, 0:1 "
           "| 2:2, 2:2 | 2:2, 3:2 | 3:2, 2:2 #", **kw)
    expect(DIFF, LOOP_A, LOOP_B,
           "# 0:1, 1:0, 0:0 | 2:2, 2:3, 3:2 #", **kw)
    expect(SYM, LOOP_A, LOOP_B,
           "# 0:1, 1:0, 0:0 | 2:2, 2:3, 3:2 #", **kw)


# ---------------------------------------------------------------------
# polyline edge x polygon edge (:738-836)
# ---------------------------------------------------------------------

PE_A = "# 1:1, 1:3, 3:3 | 3:3, 1:3 # "
PE_B = "# # 1:1, 1:3, 3:3, 3:1"


def test_polyline_edge_open_polygon_edge_overlap():
    kw = dict(polygon_model=MB.OPEN)
    expect(UNION, PE_A, PE_B,
           "# 1:1, 1:3, 3:3 | 3:3, 1:3 # 1:1, 1:3, 3:3, 3:1", **kw)
    expect(INT, PE_A, PE_B, "# #", **kw)
    expect(DIFF, PE_A, PE_B, "# 1:1, 1:3, 3:3 | 3:3, 1:3 #", **kw)
    expect(SYM, PE_A, PE_B,
           "# 1:1, 1:3, 3:3 | 3:3, 1:3 # 1:1, 1:3, 3:3, 3:1", **kw)


def test_polyline_edge_semi_open_polygon_edge_overlap():
    kw = dict(polygon_model=MB.SEMI_OPEN)
    expect(UNION, PE_A, PE_B,
           "# 1:1, 1:1 | 3:3, 3:3 | 3:3, 1:3 # 1:1, 1:3, 3:3, 3:1", **kw)
    expect(INT, PE_A, PE_B, "# 1:3, 1:3 | 1:1, 1:3, 3:3 #", **kw)
    expect(DIFF, PE_A, PE_B, "# 1:1, 1:1 | 3:3, 3:3 | 3:3, 1:3 #", **kw)
    expect(SYM, PE_A, PE_B,
           "# 1:1, 1:1 | 3:3, 3:3 | 3:3, 1:3 # 1:1, 1:3, 3:3, 3:1", **kw)


def test_polyline_edge_closed_polygon_edge_overlap():
    kw = dict(polygon_model=MB.CLOSED)
    expect(UNION, PE_A, PE_B, "# # 1:1, 1:3, 3:3, 3:1", **kw)
    expect(INT, PE_A, PE_B, "# 1:1, 1:3, 3:3 | 3:3, 1:3 #", **kw)
    expect(DIFF, PE_A, PE_B, "# #", **kw)
    expect(SYM, PE_A, PE_B, "# # 1:1, 1:3, 3:3, 3:1", **kw)


def test_polygon_vertex_matching():
    # polyline edge absorbed by a coincident degenerate polygon shell
    kw = dict(polyline_model=MB.CLOSED, polygon_model=MB.CLOSED)
    expect(UNION, "# 0:0, 1:1 # ", "# # 0:0, 1:1", "# # 0:0, 1:1", **kw)


def test_polyline_edge_polygon_interior():
    a = "# 1:1, 2:2 | 3:3, 3:3 | 6:6, 7:7 | 8:8, 8:8 # "
    b = "# # 0:0, 0:5, 5:5, 5:0"
    expect(UNION, a, b, "# 6:6, 7:7 | 8:8, 8:8 # 0:0, 0:5, 5:5, 5:0")
    expect(INT, a, b, "# 1:1, 2:2 | 3:3, 3:3 #")
    expect(DIFF, a, b, "# 6:6, 7:7 | 8:8, 8:8 #")
    expect(SYM, a, b, "# 6:6, 7:7 | 8:8, 8:8 # 0:0, 0:5, 5:5, 5:0")


def test_polyline_edge_isolated_start_vertex_plus_interior_crossing():
    kw = dict(snap_exponent=1)
    a = "# 0:0, 0:10, 0:4 # "
    b = "# # 0:0, -5:5, 5:5"
    expect(DIFF, a, b, "# 0:0, 0:0 | 0:5, 0:10, 0:5 #", **kw)


def test_polygon_edge_isolated_start_vertex_plus_interior_crossing():
    kw = dict(snap_exponent=1, polygon_model=MB.CLOSED)
    a = "# # 0:0, 5:5, -5:5"
    b = "# # 1:4, 0:0, 0:8"
    expect(INT, a, b, "# # 0:0; 0:5, 0:8, 0.8:5", **kw)


# ---------------------------------------------------------------------
# polygon vertex x polygon vertex (:873-930)
# ---------------------------------------------------------------------

PGV_A = "# # 0:0, 0:5, 1:5, 0:0, 2:5, 3:5"
PGV_B = "# # 0:0, 5:3, 5:2"
PGV_UNION = "# # 0:0, 0:5, 1:5, 0:0, 2:5, 3:5, 0:0, 5:3, 5:2"


@pytest.mark.parametrize("model", (MB.OPEN, MB.SEMI_OPEN))
def test_polygon_vertex_open_semi_open_polygon_vertex(model):
    kw = dict(polygon_model=model)
    expect(UNION, PGV_A, PGV_B, PGV_UNION, **kw)
    expect(INT, PGV_A, PGV_B, "# #", **kw)
    expect(DIFF, PGV_A, PGV_B, PGV_A, **kw)
    expect(SYM, PGV_A, PGV_B, PGV_UNION, **kw)


def test_polygon_vertex_closed_polygon_vertex():
    kw = dict(polygon_model=MB.CLOSED)
    expect(UNION, PGV_A, PGV_B, PGV_UNION, **kw)
    expect(INT, PGV_A, PGV_B, "# # 0:0", **kw)
    expect(DIFF, PGV_A, PGV_B, PGV_A, **kw)
    expect(DIFF, PGV_B, PGV_A, PGV_B, **kw)
    expect(SYM, PGV_A, PGV_B, PGV_UNION, **kw)


# ---------------------------------------------------------------------
# polygon edge x polygon edge (:932-1055)
# ---------------------------------------------------------------------


def test_polygon_edge_polygon_edge_crossing():
    kw = dict(snap_exponent=2)
    a = "# # 0:0, 0:2, 2:2, 2:0"
    b = "# # 1:1, 1:3, 3:3, 3:1"
    expect(UNION, a, b,
           "# # 0:0, 0:2, 1:2, 1:3, 3:3, 3:1, 2:1, 2:0", **kw)
    expect(INT, a, b, "# # 1:1, 1:2, 2:2, 2:1", **kw)
    expect(DIFF, a, b, "# # 0:0, 0:2, 1:2, 1:1, 2:1, 2:0", **kw)
    expect(SYM, a, b,
           "# # 0:0, 0:2, 1:2, 1:1, 2:1, 2:0; "
           "1:2, 1:3, 3:3, 3:1, 2:1, 2:2", **kw)


PGE_A = "# # 0:0, 0:4, 2:4, 2:0"
PGE_B = "# # 0:0, 1:1, 2:0; 0:4, 1:5, 2:4"


def test_polygon_edge_open_polygon_edge_overlap():
    kw = dict(polygon_model=MB.OPEN)
    expect(UNION, PGE_A, PGE_B,
           "# # 0:0, 0:4, 2:4, 2:0; 0:4, 1:5, 2:4", **kw)
    expect(INT, PGE_A, PGE_B, "# # 0:0, 1:1, 2:0", **kw)
    expect(DIFF, PGE_A, PGE_B, "# # 0:0, 0:4, 2:4, 2:0, 1:1", **kw)
    expect(SYM, PGE_A, PGE_B,
           "# # 0:0, 0:4, 2:4, 2:0, 1:1; 0:4, 1:5, 2:4", **kw)


def test_polygon_edge_semi_open_polygon_edge_overlap():
    kw = dict(polygon_model=MB.SEMI_OPEN)
    expect(UNION, PGE_A, PGE_B, "# # 0:0, 0:4, 1:5, 2:4, 2:0", **kw)
    expect(INT, PGE_A, PGE_B, "# # 0:0, 1:1, 2:0", **kw)
    expect(DIFF, PGE_A, PGE_B, "# # 0:0, 0:4, 2:4, 2:0, 1:1", **kw)
    expect(SYM, PGE_A, PGE_B,
           "# # 0:0, 0:4, 2:4, 2:0, 1:1; 0:4, 1:5, 2:4", **kw)


def test_polygon_edge_closed_polygon_edge_overlap():
    kw = dict(polygon_model=MB.CLOSED)
    expect(UNION, PGE_A, PGE_B, "# # 0:0, 0:4, 1:5, 2:4, 2:0", **kw)
    expect(INT, PGE_A, PGE_B, "# # 0:0, 1:1, 2:0; 0:4, 2:4", **kw)
    expect(DIFF, PGE_A, PGE_B, "# # 0:0, 0:4, 2:4, 2:0, 1:1", **kw)
    expect(SYM, PGE_A, PGE_B,
           "# # 0:0, 0:4, 2:4, 2:0, 1:1; 0:4, 1:5, 2:4", **kw)


def test_polygon_polygon_interior():
    a = "# # 0:0, 0:4, 4:4, 4:0"
    b = "# # 1:1, 1:2, 2:2, 2:1; 5:5, 5:6, 6:6, 6:5"
    expect(UNION, a, b, "# # 0:0, 0:4, 4:4, 4:0; 5:5, 5:6, 6:6, 6:5")
    expect(INT, a, b, "# # 1:1, 1:2, 2:2, 2:1")
    expect(DIFF, a, b, "# # 0:0, 0:4, 4:4, 4:0; 2:1, 2:2, 1:2, 1:1")
    expect(SYM, a, b,
           "# # 0:0, 0:4, 4:4, 4:0; 2:1, 2:2, 1:2, 1:1; "
           "5:5, 5:6, 6:6, 6:5")


def test_polygon_edges_degenerate_after_snapping():
    kw = dict(snap_exponent=0)
    # two narrow rectangles forming a plus sign; E0 snapping collapses
    # both to degenerate sibling chains crossing at 0:0
    a = "# # 0:-1, 0:1, 0.1:1, 0.1:-1"
    b = "# # -1:0.1, 1:0.1, 1:0, -1:0"
    expect(UNION, a, b,
           "# # 0:-1, 0:0, 0:1, 0:0 | -1:0, 0:0, 1:0, 0:0", **kw)
    expect(INT, a, b, "# # 0:0", **kw)
    expect(DIFF, a, b, "# # 0:-1, 0:0, 0:1, 0:0", **kw)
    expect(SYM, a, b,
           "# # 0:-1, 0:0, 0:1, 0:0 | -1:0, 0:0, 1:0, 0:0", **kw)


# ---------------------------------------------------------------------
# self-intersecting polylines (:2393-2441)
# ---------------------------------------------------------------------


def test_self_intersecting_polylines():
    kw = dict(snap_exponent=1)
    a = "# 0:2, 4:2, 2:0, 2:5 #"
    b = "# 0:4, 5:4, 3:6, 3:3 #"
    expect(UNION, a, b,
           "# 0:2, 4:2, 2:0, 2:4, 2:5 | 0:4, 2:4, 5:4, 3:6, 3:3 #", **kw)
    expect(INT, a, b, "# 2:4, 2:4 | 2:4, 2:4 #", **kw)
    expect(DIFF, a, b, "# 0:2, 4:2, 2:0, 2:4, 2:5 #", **kw)
    expect(SYM, a, b,
           "# 0:2, 4:2, 2:0, 2:4, 2:5 | 0:4, 2:4, 5:4, 3:6, 3:3 #", **kw)


def test_self_intersecting_polylines_split_all():
    kw = dict(snap_exponent=1, split_all_crossing_polyline_edges=True)
    a = "# 0:2, 4:2, 2:0, 2:5 #"
    b = "# 0:4, 5:4, 3:6, 3:3 #"
    expect(UNION, a, b,
           "# 0:2, 2:2, 4:2, 2:0, 2:2, 2:4, 2:5 "
           "| 0:4, 2:4, 3:4, 5:4, 3:6, 3:4, 3:3 #", **kw)
    expect(INT, a, b, "# 2:4, 2:4 | 2:4, 2:4 #", **kw)
    expect(DIFF, a, b,
           "# 0:2, 2:2, 4:2, 2:0, 2:2, 2:4, 2:5 #", **kw)
    expect(SYM, a, b,
           "# 0:2, 2:2, 4:2, 2:0, 2:2, 2:4, 2:5 "
           "| 0:4, 2:4, 3:4, 5:4, 3:6, 3:4, 3:3 #", **kw)


# ---------------------------------------------------------------------
# hardening regressions: long-edge betweenness, exact T-junctions,
# full-with-holes polygons
# ---------------------------------------------------------------------


def _pt(lat, lng):
    import math

    phi, th = math.radians(lat), math.radians(lng)
    return (
        math.cos(th) * math.cos(phi),
        math.sin(th) * math.cos(phi),
        math.sin(phi),
    )


def test_strictly_on_edge_rejects_complementary_arc():
    """Collinear points on the FAR arc of an edge longer than 120 deg
    must not count as interior (the old dot-threshold test accepted
    them)."""
    u, v = _pt(0, 0), _pt(0, 170)  # equator points: exactly coplanar
    assert MB._strictly_on_edge(u, v, _pt(0, 85))
    assert not MB._strictly_on_edge(u, v, _pt(0, -80))  # far arc
    assert not MB._strictly_on_edge(u, v, _pt(0, 175))  # beyond v
    assert not MB._strictly_on_edge(u, v, u)
    assert not MB._strictly_on_edge(u, v, v)


def test_exact_t_junction_single_cut():
    """B's vertex lies EXACTLY on A's equatorial edge: the junction
    must appear as exactly one cut (the perturbed crossing_sign path
    would add a second point within ~1 ulp -> sliver edges)."""
    a = "# # 0:0, 0:10, 5:10, 5:0"
    b = "# # 0:5, -5:0, -5:10"  # apex exactly on A's bottom edge
    expect(
        UNION, a, b,
        "# # 0:0, 0:5, 0:10, 5:10, 5:0; 0:5, -5:0, -5:10",
    )
    # no sliver edges in the raw output
    got = MB.boolean_operation(
        MB.parse_index(a), MB.parse_index(b), UNION, MB.Options()
    )
    for (p, q) in got[2]:
        d2 = sum((p[i] - q[i]) ** 2 for i in range(3))
        assert d2 > 1e-12, f"sliver edge {p} -> {q}"


def test_full_with_hole_point_containment():
    """A 'full' loop flips its polygon's parity base: the sphere-minus-
    square polygon excludes the hole interior instead of short-
    circuiting to the whole sphere."""
    full_hole = "# # full; 10:10, 10:12, 12:12, 12:10"
    expect(INT, "11:11 # #", full_hole, "# #")  # in the hole
    expect(INT, "0:0 # #", full_hole, "0:0 # #")  # outside the hole
    expect(DIFF, "11:11 # #", full_hole, "11:11 # #")
    expect(DIFF, "0:0 # #", full_hole, "# #")


def test_full_with_hole_vs_polygon_edges():
    full_hole = "# # full; 10:10, 10:20, 20:20, 20:10"
    sq_in_hole = "# # 12:12, 12:14, 14:14, 14:12"
    # square entirely inside the hole: intersection empty
    expect(INT, sq_in_hole, full_hole, "# #")
    # union: sphere minus (hole minus square) -> both rings survive
    expect(
        UNION, sq_in_hole, full_hole,
        "# # 10:10, 10:20, 20:20, 20:10; 12:12, 12:14, 14:14, 14:12",
    )
    # full-with-hole minus the square: unchanged (square is in the hole)
    expect(DIFF, full_hole, sq_in_hole,
           "# # 10:10, 10:20, 20:20, 20:10")


def test_bare_full_polygon_still_contains_everything():
    expect(INT, "3:7 # #", "# # full", "3:7 # #")
    expect(DIFF, "3:7 # #", "# # full", "# #")

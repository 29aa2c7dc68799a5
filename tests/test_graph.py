"""S2Builder.Graph goldens ported from
S2GeometryTests/S2BuilderGraphTests.cs: EdgeProcessor option
combinations, left-turn-map loop assembly, directed/undirected
components, PATH/WALK polyline assembly, and MakeSubgraph."""

import pytest

from s2geometry_spark.kernels import graph as G
from s2geometry_spark.kernels import textformat as TF


def pe(options, in_edges, expect_edges, expect_ids=None,
       expect_error=False):
    """TestProcessEdges (S2BuilderGraphTests.cs:444-469): edges are
    (src, dst) or (src, dst, [input ids])."""
    lex = G.IdSetLexicon()
    edges, ids = [], []
    for e in in_edges:
        edges.append((e[0], e[1]))
        ids.append(lex.add(e[2]) if len(e) > 2 else G.EMPTY_SET_ID)
    new_edges, new_ids, error = G.process_edges(options, edges, ids, lex)
    assert (error is not None) == expect_error, error
    assert new_edges == [(e[0], e[1]) for e in expect_edges]
    got_ids = [sorted(lex.id_set(s)) for s in new_ids]
    want_ids = [sorted(e[2]) if len(e) > 2 else [] for e in expect_edges]
    assert got_ids == want_ids


def opts(edge_type=G.DIRECTED, degenerate=G.DEGENERATE_KEEP,
         duplicate=G.DUPLICATE_KEEP, sibling=G.SIBLING_KEEP):
    return G.GraphOptions(edge_type, degenerate, duplicate, sibling)


def chains(*texts):
    return [[tuple(p) for p in TF.parse_points(t)] for t in texts]


# ---------------------------------------------------------------------
# ProcessEdges (S2BuilderGraphTests.cs:148-442)
# ---------------------------------------------------------------------


def test_discard_degenerate_edges():
    o = opts(degenerate=G.DEGENERATE_DISCARD)
    pe(o, [(0, 0), (0, 0)], [])


def test_keep_duplicate_degenerate_edges():
    o = opts()
    pe(o, [(0, 0), (0, 0)], [(0, 0), (0, 0)])


def test_merge_duplicate_degenerate_edges():
    o = opts(duplicate=G.DUPLICATE_MERGE)
    pe(o, [(0, 0, [1]), (0, 0, [2])], [(0, 0, [1, 2])])


def test_merge_undirected_duplicate_degenerate_edges():
    o = opts(edge_type=G.UNDIRECTED, duplicate=G.DUPLICATE_MERGE)
    pe(o, [(0, 0, [1]), (0, 0), (0, 0), (0, 0, [2])],
       [(0, 0, [1, 2]), (0, 0, [1, 2])])


def test_converted_undirected_degenerate_edges():
    o = opts(edge_type=G.UNDIRECTED, sibling=G.SIBLING_REQUIRE)
    pe(o, [(0, 0, [1]), (0, 0), (0, 0), (0, 0, [2])],
       [(0, 0, [1, 2]), (0, 0, [1, 2])])
    assert o.edge_type == G.DIRECTED


def test_merge_converted_undirected_duplicate_degenerate_edges():
    o = opts(edge_type=G.UNDIRECTED, duplicate=G.DUPLICATE_MERGE,
             sibling=G.SIBLING_REQUIRE)
    pe(o, [(0, 0, [1]), (0, 0), (0, 0), (0, 0, [2])], [(0, 0, [1, 2])])
    assert o.edge_type == G.DIRECTED


def test_discard_excess_connected_degenerate_edges():
    o = opts(degenerate=G.DEGENERATE_DISCARD_EXCESS)
    pe(o, [(0, 0), (0, 1)], [(0, 1)])
    pe(o, [(0, 0), (1, 0)], [(1, 0)])
    pe(o, [(0, 1), (1, 1)], [(0, 1)])
    pe(o, [(1, 0), (1, 1)], [(1, 0)])


def test_discard_excess_isolated_degenerate_edges():
    o = opts(degenerate=G.DEGENERATE_DISCARD_EXCESS)
    pe(o, [(0, 0, [1]), (0, 0, [2])], [(0, 0, [1, 2])])


def test_discard_excess_undirected_isolated_degenerate_edges():
    o = opts(edge_type=G.UNDIRECTED,
             degenerate=G.DEGENERATE_DISCARD_EXCESS)
    pe(o, [(0, 0, [1]), (0, 0), (0, 0, [2]), (0, 0)],
       [(0, 0, [1, 2]), (0, 0, [1, 2])])


def test_discard_excess_converted_undirected_isolated_degenerate():
    o = opts(edge_type=G.UNDIRECTED,
             degenerate=G.DEGENERATE_DISCARD_EXCESS,
             sibling=G.SIBLING_REQUIRE)
    pe(o, [(0, 0, [1]), (0, 0, [2]), (0, 0, [3]), (0, 0)],
       [(0, 0, [1, 2, 3])])
    assert o.edge_type == G.DIRECTED


def test_sibling_pairs_discard_merges_degenerate_edge_labels():
    o = opts(sibling=G.SIBLING_DISCARD)
    pe(o, [(0, 0, [1]), (0, 0, [2]), (0, 0, [3])],
       [(0, 0, [1, 2, 3]), (0, 0, [1, 2, 3]), (0, 0, [1, 2, 3])])
    o = opts(sibling=G.SIBLING_DISCARD_EXCESS)
    pe(o, [(0, 0, [1]), (0, 0, [2]), (0, 0, [3])],
       [(0, 0, [1, 2, 3]), (0, 0, [1, 2, 3]), (0, 0, [1, 2, 3])])


def test_keep_sibling_pairs():
    o = opts(degenerate=G.DEGENERATE_DISCARD)
    pe(o, [(0, 1), (1, 0)], [(0, 1), (1, 0)])


def test_merge_duplicate_sibling_pairs():
    o = opts(degenerate=G.DEGENERATE_DISCARD,
             duplicate=G.DUPLICATE_MERGE)
    pe(o, [(0, 1), (0, 1), (1, 0)], [(0, 1), (1, 0)])


def test_discard_sibling_pairs():
    o = opts(degenerate=G.DEGENERATE_DISCARD, sibling=G.SIBLING_DISCARD)
    pe(o, [(0, 1), (1, 0)], [])
    pe(o, [(0, 1), (0, 1), (1, 0), (1, 0)], [])
    pe(o, [(0, 1), (0, 1), (0, 1), (1, 0)], [(0, 1), (0, 1)])
    pe(o, [(0, 1), (1, 0), (1, 0), (1, 0)], [(1, 0), (1, 0)])


def test_discard_sibling_pairs_merge_duplicates():
    o = opts(degenerate=G.DEGENERATE_DISCARD,
             duplicate=G.DUPLICATE_MERGE, sibling=G.SIBLING_DISCARD)
    pe(o, [(0, 1), (0, 1), (1, 0), (1, 0)], [])
    pe(o, [(0, 1), (0, 1), (0, 1), (1, 0)], [(0, 1)])
    pe(o, [(0, 1), (1, 0), (1, 0), (1, 0)], [(1, 0)])


def test_discard_undirected_sibling_pairs():
    o = opts(edge_type=G.UNDIRECTED, degenerate=G.DEGENERATE_DISCARD,
             sibling=G.SIBLING_DISCARD)
    pe(o, [(0, 1), (1, 0)], [(0, 1), (1, 0)])
    pe(o, [(0, 1), (0, 1), (1, 0), (1, 0)], [])
    pe(o, [(0, 1), (0, 1), (0, 1), (1, 0), (1, 0), (1, 0)],
       [(0, 1), (1, 0)])


def test_discard_excess_sibling_pairs():
    o = opts(degenerate=G.DEGENERATE_DISCARD,
             sibling=G.SIBLING_DISCARD_EXCESS)
    pe(o, [(0, 1), (1, 0)], [(0, 1), (1, 0)])
    pe(o, [(0, 1), (0, 1), (1, 0), (1, 0)], [(0, 1), (1, 0)])
    pe(o, [(0, 1), (0, 1), (0, 1), (1, 0)], [(0, 1), (0, 1)])
    pe(o, [(0, 1), (1, 0), (1, 0), (1, 0)], [(1, 0), (1, 0)])


def test_discard_excess_sibling_pairs_merge_duplicates():
    o = opts(degenerate=G.DEGENERATE_DISCARD,
             duplicate=G.DUPLICATE_MERGE,
             sibling=G.SIBLING_DISCARD_EXCESS)
    pe(o, [(0, 1), (0, 1), (1, 0), (1, 0)], [(0, 1), (1, 0)])
    pe(o, [(0, 1), (0, 1), (0, 1), (1, 0)], [(0, 1)])
    pe(o, [(0, 1), (1, 0), (1, 0), (1, 0)], [(1, 0)])


def test_discard_excess_undirected_sibling_pairs():
    o = opts(edge_type=G.UNDIRECTED, degenerate=G.DEGENERATE_DISCARD,
             sibling=G.SIBLING_DISCARD_EXCESS)
    pe(o, [(0, 1), (1, 0)], [(0, 1), (1, 0)])
    pe(o, [(0, 1), (0, 1), (1, 0), (1, 0)],
       [(0, 1), (0, 1), (1, 0), (1, 0)])
    pe(o, [(0, 1), (0, 1), (0, 1), (1, 0), (1, 0), (1, 0)],
       [(0, 1), (1, 0)])


def test_create_sibling_pairs():
    o = opts(degenerate=G.DEGENERATE_DISCARD, sibling=G.SIBLING_CREATE)
    pe(o, [(0, 1)], [(0, 1), (1, 0)])
    o = opts(degenerate=G.DEGENERATE_DISCARD, sibling=G.SIBLING_CREATE)
    pe(o, [(0, 1), (0, 1)], [(0, 1), (0, 1), (1, 0), (1, 0)])


def test_require_sibling_pairs():
    o = opts(degenerate=G.DEGENERATE_DISCARD, sibling=G.SIBLING_REQUIRE)
    pe(o, [(0, 1), (1, 0)], [(0, 1), (1, 0)])
    o = opts(degenerate=G.DEGENERATE_DISCARD, sibling=G.SIBLING_REQUIRE)
    pe(o, [(0, 1)], [(0, 1), (1, 0)], expect_error=True)


def test_create_undirected_sibling_pairs():
    o = opts(degenerate=G.DEGENERATE_DISCARD, sibling=G.SIBLING_CREATE)
    pe(o, [(0, 1), (1, 0)], [(0, 1), (1, 0)])
    assert o.edge_type == G.DIRECTED
    o = opts(edge_type=G.UNDIRECTED, degenerate=G.DEGENERATE_DISCARD,
             sibling=G.SIBLING_CREATE)
    pe(o, [(0, 1), (0, 1), (1, 0), (1, 0)], [(0, 1), (1, 0)])
    assert o.edge_type == G.DIRECTED
    o = opts(edge_type=G.UNDIRECTED, degenerate=G.DEGENERATE_DISCARD,
             sibling=G.SIBLING_CREATE)
    pe(o, [(0, 1), (0, 1), (0, 1), (1, 0), (1, 0), (1, 0)],
       [(0, 1), (0, 1), (1, 0), (1, 0)])
    assert o.edge_type == G.DIRECTED


def test_create_sibling_pairs_merge_duplicates():
    o = opts(degenerate=G.DEGENERATE_DISCARD,
             duplicate=G.DUPLICATE_MERGE, sibling=G.SIBLING_CREATE)
    pe(o, [(0, 1)], [(0, 1), (1, 0)])
    o = opts(degenerate=G.DEGENERATE_DISCARD,
             duplicate=G.DUPLICATE_MERGE, sibling=G.SIBLING_CREATE)
    pe(o, [(0, 1), (0, 1)], [(0, 1), (1, 0)])


def test_create_undirected_sibling_pairs_merge_duplicates():
    o = opts(degenerate=G.DEGENERATE_DISCARD,
             duplicate=G.DUPLICATE_MERGE, sibling=G.SIBLING_CREATE)
    pe(o, [(0, 1), (1, 0)], [(0, 1), (1, 0)])
    assert o.edge_type == G.DIRECTED
    o = opts(edge_type=G.UNDIRECTED, degenerate=G.DEGENERATE_DISCARD,
             duplicate=G.DUPLICATE_MERGE, sibling=G.SIBLING_CREATE)
    pe(o, [(0, 1), (0, 1), (0, 1), (1, 0), (1, 0), (1, 0)],
       [(0, 1), (1, 0)])
    assert o.edge_type == G.DIRECTED


# ---------------------------------------------------------------------
# Assembly through the mini-builder (S2BuilderGraphTests.cs:35-146)
# ---------------------------------------------------------------------


def test_get_directed_loops_degenerate_edges():
    g = G.build_graph(
        chains("1:1, 1:1", "0:0, 0:2, 2:2, 2:0, 0:0", "0:3, 3:3, 0:3"),
        opts(degenerate=G.DEGENERATE_DISCARD_EXCESS))
    loops = g.get_directed_loops(G.LOOP_SIMPLE)
    assert [len(l) for l in loops] == [1, 4, 2]


def test_get_directed_components_degenerate_edges():
    g = G.build_graph(
        chains("1:1, 1:1", "0:0, 0:2, 2:2, 2:0, 0:0"),
        opts(degenerate=G.DEGENERATE_DISCARD_EXCESS,
             sibling=G.SIBLING_CREATE))
    components = g.get_directed_components(G.BOUNDARIES_KEEP)
    assert len(components) == 2
    assert [len(l) for l in components[0]] == [1]
    assert [len(l) for l in components[1]] == [4, 4]


def test_get_undirected_components_degenerate_edges():
    g = G.build_graph(
        chains("1:1, 1:1", "0:0, 0:2, 2:2, 2:0, 0:0"),
        opts(edge_type=G.UNDIRECTED,
             degenerate=G.DEGENERATE_DISCARD_EXCESS,
             sibling=G.SIBLING_DISCARD_EXCESS))
    components = g.get_undirected_components(G.LOOP_CIRCUIT)
    assert len(components) == 2
    assert [len(l) for l in components[0][0]] == [1]
    assert [len(l) for l in components[0][1]] == [1]
    assert [len(l) for l in components[1][0]] == [4]
    assert [len(l) for l in components[1][1]] == [4]


def test_get_polylines_undirected_degenerate_paths():
    g = G.build_graph(
        chains("1:1, 1:1", "0:0, 0:0, 0:1, 0:1, 0:2, 0:2", "1:1, 1:1"),
        opts(edge_type=G.UNDIRECTED))
    assert len(g.get_polylines(G.POLYLINE_PATH)) == 7


def test_get_polylines_undirected_degenerate_walks():
    g = G.build_graph(
        chains("1:1, 1:1", "0:0, 0:0, 0:1, 0:1, 0:2, 0:2", "1:1, 1:1"),
        opts(edge_type=G.UNDIRECTED))
    polylines = g.get_polylines(G.POLYLINE_WALK)
    assert [len(p) for p in polylines] == [2, 5]


def test_left_turn_map_error_on_unbalanced_edges():
    g = G.Graph(opts(degenerate=G.DEGENERATE_DISCARD),
                [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0)],
                [(0, 1)], [0], G.IdSetLexicon())
    with pytest.raises(G.GraphError):
        g.get_directed_loops(G.LOOP_CIRCUIT)


# ---------------------------------------------------------------------
# MakeSubgraph (S2BuilderGraphTests.cs:511-570)
# ---------------------------------------------------------------------


def test_make_subgraph_undirected_to_undirected():
    lex = G.IdSetLexicon()
    g = G.Graph(
        opts(edge_type=G.UNDIRECTED),
        [tuple(p) for p in TF.parse_points("0:0, 0:1, 1:1")],
        [(0, 0), (0, 0), (1, 2), (2, 1)], [0, 0, 1, 1], lex)
    sub = g.make_subgraph(
        opts(edge_type=G.UNDIRECTED, degenerate=G.DEGENERATE_DISCARD),
        list(g.edges), list(g.input_id_set_ids), lex)
    assert sub.edges == [(1, 2), (2, 1)]
    assert sub.input_id_set_ids == [1, 1]


def test_make_subgraph_directed_to_undirected():
    lex = G.IdSetLexicon()
    g = G.Graph(
        opts(),
        [tuple(p) for p in TF.parse_points("0:0, 0:1, 1:1")],
        [(0, 0), (0, 1), (1, 2), (1, 2), (2, 1)], [1, 2, 3, 3, 3], lex)
    sub = g.make_subgraph(
        opts(edge_type=G.UNDIRECTED,
             sibling=G.SIBLING_DISCARD_EXCESS),
        list(g.edges), list(g.input_id_set_ids), lex)
    assert sub.edges == [(0, 0), (0, 0), (0, 1), (1, 0), (1, 2), (2, 1)]
    assert [sorted(lex.id_set(s)) for s in sub.input_id_set_ids] == [
        [1], [1], [2], [], [3], [3]]

"""Property tests: the vectorized flattener vs a naive reference model.

The model below is a direct, row-at-a-time transcription of the reference's
loop semantics (HierarchyFlattener.java:127-351): seed every edge, left-outer
extend the frontier, emit leaf-marker duplicates, union all levels, dedup on
(parent, child, level) with max(leaf) / min(path). Hypothesis generates small
random edge lists and configs; the engine must match the model exactly
(as sets; min-path row pinned for data/root columns).
"""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from raycdc import FlattenConfig
from raycdc.flatten import flatten_hierarchy_table


def naive_flatten(edges, cfg: FlattenConfig, labels=None):
    """edges: list[(parent, child)]; labels: per-edge payload (path field)."""
    labels = labels or [str(c) for _, c in edges]
    # seeds: every edge, self-edges dropped
    rows = []  # (parent, child, level, leaf, label, path, root)
    seeds = [
        (p, c, 1, 0, lab, cfg.path_separator + lab, lab)
        for (p, c), lab in zip(edges, labels)
        if p != c
    ]
    frontier = list(seeds)
    out = list(seeds)
    level = 1
    while frontier:
        if level > cfg.max_depth:
            raise ValueError("Exceeded maximum depth")
        nxt = []
        for (p, c, lv, leaf, lab, path, root) in frontier:
            matched = [((cc), ll) for (pp, cc), ll in zip(edges, labels)
                       if pp == c]
            if not matched:
                out.append((p, c, lv, 1, lab, path, root))
            else:
                for cc, ll in matched:
                    nxt.append((c, cc, lv + 1, 0, ll,
                                path + cfg.path_separator + ll, root))
        out.extend(nxt)
        frontier = nxt
        level += 1
    # dedup on (parent, child, level): max(leaf), min(path) row for the rest
    groups = {}
    for row in out:
        key = (row[0], row[1], row[2])
        groups.setdefault(key, []).append(row)
    final = set()
    for key, rows_ in groups.items():
        bottom = max(r[3] for r in rows_) == 1
        win = min(rows_, key=lambda r: r[5])
        final.add((key[0], key[1], win[4], key[2], bottom, win[5], win[6]))
    return final


edge_lists = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=1, max_size=14)


@settings(max_examples=50, deadline=None)
@given(edge_lists)
def test_engine_matches_naive_model(edges):
    cfg = FlattenConfig(parent_field="parent", child_field="child",
                        path_field="label", path_alias_field="path",
                        connect_by_root="label=root", max_depth=12)
    labels = [f"L{c}" for _, c in edges]
    table = pa.table({
        "parent": pa.array([str(p) for p, _ in edges]),
        "child": pa.array([str(c) for _, c in edges]),
        "label": pa.array(labels),
    })
    str_edges = [(str(p), str(c)) for p, c in edges]
    try:
        expected = naive_flatten(str_edges, cfg, labels)
        failed = False
    except ValueError:
        expected, failed = None, True
    if failed:
        try:
            flatten_hierarchy_table(table, cfg)
            raise AssertionError("engine should have hit max depth")
        except ValueError:
            return
    out = flatten_hierarchy_table(table, cfg)
    got = set(zip(out["parent"].to_pylist(), out["child"].to_pylist(),
                  out["label"].to_pylist(), out["Level"].to_pylist(),
                  out["Bottom"].to_pylist(), out["path"].to_pylist(),
                  out["root"].to_pylist()))
    assert got == expected


@settings(max_examples=30, deadline=None)
@given(edge_lists, st.integers(1, 4))
def test_engine_matches_naive_model_no_path(edges, max_depth):
    cfg = FlattenConfig(parent_field="parent", child_field="child",
                        max_depth=max_depth)
    table = pa.table({
        "parent": pa.array([str(p) for p, _ in edges]),
        "child": pa.array([str(c) for _, c in edges]),
    })
    path_cfg = FlattenConfig(parent_field="parent", child_field="child",
                             path_field="child", path_alias_field="p",
                             max_depth=max_depth)
    str_edges = [(str(p), str(c)) for p, c in edges]
    try:
        expected = {(p, c, lv, b) for (p, c, _, lv, b, _, _)
                    in naive_flatten(str_edges, path_cfg)}
        failed = False
    except ValueError:
        expected, failed = None, True
    if failed:
        try:
            flatten_hierarchy_table(table, cfg)
            raise AssertionError("engine should have hit max depth")
        except ValueError:
            return
    out = flatten_hierarchy_table(table, cfg)
    got = set(zip(out["parent"].to_pylist(), out["child"].to_pylist(),
                  out["Level"].to_pylist(), out["Bottom"].to_pylist()))
    assert got == expected

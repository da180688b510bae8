"""Distributed connected components over an edge list.

The missing piece between *near-duplicate pair detection* (ops/dedup.py
emits ``(id_a, id_b)`` pairs) and an actual deduplicated corpus: duplicate
relations are transitive in practice (a~b, b~c => keep one of {a,b,c}), so
"drop all but one per duplicate cluster" needs the connected components of
the pair graph, not the raw pairs.

Algorithm: iterative min-label propagation. Every node starts labelled
with itself; each round every node takes the min of its own label and its
neighbours' labels; at the fixpoint every node carries the minimum node id
of its component. One round costs one keyed join (deliver each node's
label to its neighbours) plus one grouped min — both on the engine's
partition-only exchange — over the EDGE set only, never the corpus.
Convergence is detected by the monotone non-increasing exact integer sum
of all labels (labels only ever decrease, so an unchanged sum IS the
fixpoint — no join-against-previous needed).

Each round ends with a pointer-jumping shortcut (label <- label of label),
so reachable-prefix distances roughly double per round and convergence is
O(log n) rounds even on pathological chain graphs — near-duplicate
clusters (near-cliques: LSH links most members directly) still finish in
2-3 rounds; ``max_iters`` remains a safety guard.

Scale note: the labels / edges datasets are sized by the DUPLICATE graph
(nodes that appear in at least one pair), not the corpus. Per-round state
never lands on the driver — only the one-row label sum does.

Reference semantics anchor: the dedup group-aggregate of the reference
flattener (HierarchyFlattener.java:286-342) picks one winner per key
group; this operator generalizes the same "winner per equivalence group"
contract to transitive similarity groups.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _local_components(tables: "list[pa.Table]") -> pa.Table:
    """Union-find over a small materialized edge table — the fast path.
    One numpy pass compacts ids; the find loop is O(E α(N)) Python over
    int arrays, fine up to the local threshold."""
    import numpy as np

    # Ray Data can hand schema-less empty blocks (union branches — see the
    # _split_by_column invariant); the caller guarantees >= 1 real edge
    tables = [t for t in tables if t.num_rows]
    t = pa.concat_tables(tables)
    a = t["src"].to_numpy(zero_copy_only=False)
    b = t["dst"].to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[:len(a)], inv[len(a):]
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(ia.tolist(), ib.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            # union by smaller ORIGINAL id so the root is the min node
            if nodes[rx] < nodes[ry]:
                parent[ry] = rx
            else:
                parent[rx] = ry
    roots = np.array([find(i) for i in range(len(nodes))], dtype=np.int64)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "component": pa.array(nodes[roots], pa.int64())})


@ray.remote(num_returns=1)
def _local_cc_task(*blocks: pa.Table) -> pa.Table:
    return _local_components(list(blocks))


def connected_components(
    edges: ray.data.Dataset,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    num_partitions: int = 16,
    max_iters: int = 64,
    local_threshold: int = 1 << 19,
) -> ray.data.Dataset:
    """Connected components of the undirected graph given as an edge list.

    Returns a Dataset with columns ``(node, component)`` — one row per
    distinct node appearing in ``edges``, ``component`` being the minimum
    node id reachable from it (a canonical representative). Node ids must
    be integral; null endpoints are ignored (an edge with a null end
    connects nothing).

    Strategy is auto-picked by materialized edge count, mirroring the
    broadcast-vs-shuffle join auto pick: at or below ``local_threshold``
    symmetrized edges (= 8 MB of int64 pairs at the default) the whole
    graph runs through a single remote union-find task — dup graphs are
    usually tiny relative to the corpus, and each distributed round costs
    several pipeline latencies. Above it, the iterative min-label
    propagation runs entirely on partition-only exchanges.
    """
    from raycdc.agg import grouped_aggregate
    from raycdc.joins import hash_join

    def symmetrize(t: pa.Table) -> pa.Table:
        a = pc.cast(t[src], pa.int64())
        b = pc.cast(t[dst], pa.int64())
        valid = pc.and_(pc.is_valid(a), pc.is_valid(b))
        if not pc.all(pc.fill_null(valid, False)).as_py():
            mask = pc.fill_null(valid, False)
            a, b = a.filter(mask), b.filter(mask)
        return pa.concat_tables([pa.table({"src": a, "dst": b}),
                                 pa.table({"src": b, "dst": a})])

    esym = edges.map_batches(symmetrize, batch_format="pyarrow")
    # Materialize once: esym is re-joined every round; re-running the
    # upstream pair pipeline (LSH + verify) per round would be absurd.
    esym = esym.materialize()
    out_schema = pa.schema([("node", pa.int64()), ("component", pa.int64())])
    n_edges = esym.count()
    if n_edges == 0:
        # an edgeless graph has no nodes to label; return a TYPED empty so
        # downstream joins can still plan against the schema
        return ray.data.from_arrow(out_schema.empty_table())
    if n_edges <= local_threshold:
        # small graph: one remote union-find task; edges go straight from
        # the object store into the task, never through the driver
        from raycdc.shuffle import block_refs_of
        ref = _local_cc_task.remote(*block_refs_of(esym))
        return ray.data.from_arrow_refs([ref])

    # labels(node) = node — every endpoint, deduped by the grouped min
    # itself (min(node) grouped by node is node), so no separate distinct.
    def seed_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["src"], "label": t["src"]})

    labels = grouped_aggregate(
        esym.map_batches(seed_labels, batch_format="pyarrow"),
        ["node"], mins={"label": "label"}, exchange="partition",
        num_partitions=num_partitions).materialize()

    def label_sum(ls: ray.data.Dataset) -> int:
        # exact integer sum — the convergence certificate
        v = ls.sum("label")
        return int(v if v is not None else 0)

    prev = label_sum(labels)
    for _ in range(max_iters):
        # deliver each node's current label to every neighbour...
        neigh = hash_join(esym, labels, on=["src"], right_on=["node"],
                          num_partitions=num_partitions, strategy="shuffle")

        def to_candidate(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["dst"], "label": t["label"]})

        cand = neigh.map_batches(to_candidate, batch_format="pyarrow") \
                    .union(labels)
        # ...and take the min over self + neighbourhood
        labels = grouped_aggregate(
            cand, ["node"], mins={"label": "label"}, exchange="partition",
            num_partitions=num_partitions).materialize()
        # ...then pointer-jump: shortcut every node's label to its label's
        # label. Every label value IS a node id present in `labels` (labels
        # are mins over seeded endpoint ids), so the inner join is total.
        # Reachable-prefix distances compose and roughly double per round —
        # O(log n) rounds on chain graphs instead of O(diameter).
        lookup = labels.map_batches(
            lambda t: pa.table({"lkey": t["node"], "llabel": t["label"]}),
            batch_format="pyarrow")
        jumped = hash_join(labels, lookup, on=["label"], right_on=["lkey"],
                           num_partitions=num_partitions, strategy="auto")
        labels = jumped.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "label": pc.min_element_wise(t["label"], t["llabel"])}),
            batch_format="pyarrow").materialize()
        cur = label_sum(labels)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds; "
            "raise max_iters (rounds grow ~log2 of the longest chain)")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"node": pc.cast(t["node"], pa.int64()),
                         "component": pc.cast(t["label"], pa.int64())}) \
            .cast(out_schema)

    out = labels.map_batches(rename, batch_format="pyarrow")
    # An edgeless graph yields zero blocks, i.e. an UNKNOWN-schema dataset
    # that downstream joins can't plan against — pin the schema with a
    # typed empty branch (costs nothing when there are components).
    return out.union(ray.data.from_arrow(out_schema.empty_table()))

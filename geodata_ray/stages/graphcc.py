"""Connected components over an edge Dataset + near-dup cluster dedup.

The end-to-end fuzzy-dedup step a training-data pipeline runs AFTER
pair generation (``dedup.minhash_lsh_pairs`` / ``embedding_dup_pairs``):
group the verified near-dup pairs into clusters and keep ONE canonical
representative (min id) per cluster.

Two execution paths, auto-selected on the edge count (the same
documented constant-bound pattern as ``dedup``'s collision filter —
see DEPLOYMENT.md):

- ``mode="local"`` (edge count <= ``LOCAL_EDGE_BOUND``): pairs pulled
  once to the driver, vectorized union-find with path halving.  The
  PAIR set — not the corpus — bounds memory: at the gate scale it is
  hundreds of rows; 50M edges ~ 800 MB of int64, still driver-safe.
- ``mode="distributed"``: hash-min label propagation (Pregel-style):
  each iteration joins labels to both edge endpoints and takes the
  per-node min — two hash joins + one grouped min per round, all
  shuffles partitioned by node id.  Converges in <= diameter
  iterations; near-dup clusters are clique-like (diameter 1-2), so
  2-3 rounds in practice.  Convergence is detected with a
  label-sum aggregate (monotone non-increasing; fixed point <=>
  converged), costing one metadata-light aggregate per round instead
  of an old-vs-new join.

Partitioning assumption (documented per the custom-operator rule):
label propagation co-partitions edges and labels by node id hash via
``native_join``; a pathological long-path graph needs
O(diameter) rounds — for such graphs switch to large-star/small-star
(not needed for dedup cliques).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

LOCAL_EDGE_BOUND = 50_000_000


def _unionfind_components(a: np.ndarray, b: np.ndarray) -> dict:
    """Vectorized-ish union-find (path halving) over edge arrays.
    Returns {node: min-node-of-component} for nodes appearing in edges."""
    nodes, codes = np.unique(np.concatenate([a, b]), return_inverse=True)
    parent = np.arange(nodes.size, dtype=np.int64)
    ca, cb = codes[: a.size], codes[a.size:]

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for i in range(ca.size):
        ra, rb = find(ca[i]), find(cb[i])
        if ra != rb:
            # union by MIN NODE VALUE so the root IS the representative
            if nodes[ra] < nodes[rb]:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.array([find(i) for i in range(nodes.size)], dtype=np.int64)
    return dict(zip(nodes.tolist(), nodes[roots].tolist()))


def connected_components(
    edges,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    mode: str = "auto",
    max_iters: int = 25,
    num_partitions: int = 16,
):
    """(node, cluster_id) for every node in ``edges``; ``cluster_id`` is
    the component's minimum node id.  ``edges`` is a ``ray.data.Dataset``
    with two int64 endpoint columns.  ``mode``: "auto" (bound-switched),
    "local", or "distributed"."""
    import ray.data as rd

    if mode not in ("auto", "local", "distributed"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "auto":
        n_edges = edges.count()
        mode = "local" if n_edges <= LOCAL_EDGE_BOUND else "distributed"

    if mode == "local":
        import ray

        # gather non-empty Arrow blocks directly: Ray passes empty
        # blocks through map operators WITHOUT calling the UDF, so an
        # edge stream can contain zero-column empty bundles that break
        # select_columns / to_pandas on the concatenated result
        tabs = [
            t.select([src, dst])
            for t in ray.get(edges.to_arrow_refs())
            if t.num_rows
        ]
        t = (pa.concat_tables(tabs) if tabs
             else pa.table({src: pa.array([], pa.int64()),
                            dst: pa.array([], pa.int64())}))
        a = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        if a.size == 0:
            return rd.from_arrow(
                pa.table(
                    {
                        "node": pa.array([], pa.int64()),
                        "cluster_id": pa.array([], pa.int64()),
                    }
                )
            )
        comp = _unionfind_components(a, b)
        nodes = np.fromiter(comp.keys(), dtype=np.int64, count=len(comp))
        comps = np.fromiter(comp.values(), dtype=np.int64, count=len(comp))
        order = np.argsort(nodes)
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes[order]),
                    "cluster_id": pa.array(comps[order]),
                }
            )
        )

    return _cc_distributed(
        edges, src=src, dst=dst, max_iters=max_iters,
        num_partitions=num_partitions,
    )


def _cc_distributed(edges, *, src, dst, max_iters, num_partitions):
    """Hash-min label propagation (see module docstring)."""
    import ray.data as rd

    from geodata_ray.stages.relational import grouped_aggregate, native_join

    # undirected: one (a->b) + (b->a) edge table, reused every round
    def sym(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"u": batch[src], "v": batch[dst]})
        rev = pa.table({"u": batch[dst], "v": batch[src]})
        return pa.concat_tables([fwd, rev])

    sym_edges = edges.map_batches(sym, batch_format="pyarrow").materialize()

    # labels(node, comp) init: every endpoint, comp = node
    def init(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["u"], "comp": batch["u"]})

    labels = grouped_aggregate(
        sym_edges.map_batches(init, batch_format="pyarrow"),
        ["node"],
        [("comp", "min", "comp")],
    ).materialize()

    import ray.data.aggregate as agg

    prev_sum = None
    for _ in range(max_iters):
        # neighbor candidates: for edge (u, v), comp(u) is a candidate
        # label for v
        cand = native_join(
            sym_edges, labels, on="u", right_on="node",
            num_partitions=num_partitions,
        ).select_columns(["v", "comp"])

        def c2(batch: pa.Table) -> pa.Table:
            return pa.table({"node": batch["v"], "comp": batch["comp"]})

        merged = labels.union(
            cand.map_batches(c2, batch_format="pyarrow")
        )
        labels = grouped_aggregate(
            merged, ["node"], [("comp", "min", "comp")]
        ).materialize()
        s = labels.aggregate(agg.Sum("comp"))["sum(comp)"]
        if prev_sum is not None and s == prev_sum:
            break
        prev_sum = s
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint within {max_iters} "
            "iterations (graph diameter too large for hash-min; use "
            "large-star/small-star)"
        )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["node", "cluster_id"])

    return labels.map_batches(rename, batch_format="pyarrow")


def near_dup_clusters(
    corpus_ids, pairs, *, id_col: str = "doc_id",
    src: str = "id_a", dst: str = "id_b", mode: str = "auto",
):
    """(doc_id, cluster_id, is_rep) for EVERY corpus doc: paired docs
    get their component's min id, singletons are their own cluster;
    ``is_rep`` = 1 for the one kept representative per cluster.

    ``corpus_ids``: Dataset holding ``id_col``; ``pairs``: Dataset of
    verified near-dup pairs.  The cluster table (bounded by the number
    of PAIRED docs, not the corpus) broadcasts; the corpus is only
    mapped — no corpus-sized shuffle.
    """
    import ray

    comp = connected_components(pairs, src=src, dst=dst, mode=mode)
    comp_tbl = pa.Table.from_pandas(comp.to_pandas(), preserve_index=False)
    try:
        comp_ref = ray.put(comp_tbl)
    except Exception:
        comp_ref = comp_tbl

    def attach(batch: pa.Table) -> pa.Table:
        ct = comp_ref
        if not isinstance(ct, pa.Table):
            ct = ray.get(ct)
        ids = batch[id_col]
        idx = pc.index_in(ids, value_set=ct["node"])
        comp_col = pc.if_else(
            pc.is_valid(idx), pc.take(ct["cluster_id"], idx.fill_null(0)),
            ids,
        )
        is_rep = pc.cast(pc.equal(ids, comp_col), pa.int64())
        return pa.table(
            {
                id_col: ids,
                "cluster_id": comp_col,
                "is_rep": is_rep,
            }
        )

    return corpus_ids.map_batches(attach, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PageRank (exact fixed-point integer arithmetic)
# ---------------------------------------------------------------------------

PR_BROADCAST_BOUND = 5_000_000  # nodes; above this the rank table is
                                # too big to ship per iteration -> the
                                # join-based path (see pagerank docstr)


def _pr_contrib_fn(nodes_ref, deg_ref, rank_ref, src, dst, damping_pct):
    """Stateless per-edge-batch contribution kernel (TASK pool — an
    actor pool would respawn every iteration because the captured
    rank state changes): look up src rank + outdegree in the broadcast
    node-indexed arrays, emit in-batch partial sums by dst.  All
    arithmetic is int64 floor division, so results are bit-equal
    regardless of batch partitioning.  The loop-INVARIANT (nodes, deg)
    tuple is broadcast once for the whole run (``nd_ref``); only the
    rank vector re-ships per iteration.  ``ray.get`` is a zero-copy
    plasma read, once per task."""
    import ray

    dp = np.int64(damping_pct)

    def contrib(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()),
                 "mass": pa.array([], pa.int64())}
            )
        def deref(r):
            return ray.get(r) if isinstance(r, ray.ObjectRef) else r

        nodes, deg, rank = deref(nodes_ref), deref(deg_ref), deref(rank_ref)
        # nodes is SORTED: binary search is O(rows log n) per batch —
        # an is_in/index_in hash build would cost O(n) per batch and
        # dominate everything once n >> batch rows (measured 23x on
        # the 100k-node sf1 stress graph)
        u = batch[src].to_numpy(zero_copy_only=False)
        iu = np.searchsorted(nodes, u)
        mass = (rank[iu] * dp // 100) // deg[iu]
        t = pa.table({"node": batch[dst], "mass": pa.array(mass)})
        out = t.group_by(["node"]).aggregate([("mass", "sum")])
        return out.rename_columns(["node", "mass"])

    return contrib


def _pr_dense_merge(nodes, n, *parts):
    """Remote-task kernel: scatter sparse (node, mass) partials into a
    dense n-vector and/or add dense vectors.  int64 np.add.at keeps
    the arithmetic exact (no float accumulation)."""
    out = np.zeros(n, dtype=np.int64)
    for p in parts:
        if isinstance(p, np.ndarray):
            out += p
        else:
            idx = np.searchsorted(
                nodes, p["node"].to_numpy(zero_copy_only=False)
            )
            np.add.at(
                out, idx, p["mass"].to_numpy(zero_copy_only=False)
            )
    return out


def _pr_tree_reduce(refs, nodes_ref, n, *, fanin: int = 8):
    """Fan-in-8 tree of ``_pr_dense_merge`` tasks over object-store
    partial refs (``nodes_ref`` is the once-broadcast sorted node
    array); returns the ObjectRef of the final dense vector."""
    import ray

    merge = ray.remote(_pr_dense_merge)
    while True:
        refs = [
            merge.remote(nodes_ref, n, *refs[i: i + fanin])
            for i in range(0, len(refs), fanin)
        ]
        if len(refs) == 1:
            return refs[0]


DISTINCT_EDGE_BOUND = 200_000_000  # ~1.6 GB packed int64 in one task


def _uv_unique_merge(*arrs):
    return np.unique(np.concatenate(arrs))


def distinct_edges_packed(
    edges, *, src: str = "u", dst: str = "v",
    bound: int = DISTINCT_EDGE_BOUND,
):
    """Distinct (src, dst) for NODE-ID edge lists (both < 2^31, >= 0):
    pack into one int64, per-block ``np.unique``, fan-in-8 tree of
    unions via remote tasks — an allreduce, NOT a shuffle.  Ray's
    sort-based groupby distinct costs ~15 s at 1.5M groups (its
    documented floor); this path measures ~20x cheaper.

    Constant bound: the FINAL distinct edge array must fit one task
    (``bound`` edges ~ 1.6 GB) — host-level graphs (10^7-10^8 edges)
    qualify; a page-level web graph does not, and the function RAISES
    so callers fall back to the grouped-aggregate shuffle distinct
    rather than silently degrading."""
    import ray
    import ray.data as rd

    def pack_unique(batch: pa.Table) -> pa.Table:
        # astype BEFORE the shift: numpy 1.x value-based casting keeps
        # an int32 column int32, and `<< 32` on int32 silently yields 0
        u = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(u) and (u.min() < 0 or v.min() < 0 or
                       u.max() >= 1 << 31 or v.max() >= 1 << 31):
            raise ValueError(
                "distinct_edges_packed requires node ids in [0, 2^31)"
            )
        uv = (u << np.int64(32)) | v
        return pa.table({"uv": pa.array(np.unique(uv))})

    parts = edges.map_batches(
        pack_unique, batch_format="pyarrow", batch_size=262144
    )

    def to_arr(tbl):
        return tbl["uv"].to_numpy(zero_copy_only=False)

    merge = ray.remote(
        lambda *tbls: _uv_unique_merge(
            *(t if isinstance(t, np.ndarray) else to_arr(t)
              for t in tbls)
        )
    )
    refs = list(parts.to_arrow_refs())
    while len(refs) > 1:
        refs = [
            merge.remote(*refs[i: i + 8])
            for i in range(0, len(refs), 8)
        ]
    uv = ray.get(
        merge.remote(refs[0]) if refs else ray.put(np.empty(0, np.int64))
    )
    if uv.size > bound:
        raise ValueError(
            f"distinct edge count {uv.size} exceeds the packed-distinct "
            f"bound {bound}; use the grouped-aggregate shuffle distinct"
        )
    chunks = [
        pa.table(
            {
                src: pa.array(uv[i: i + 262144] >> np.int64(32)),
                dst: pa.array(uv[i: i + 262144] & np.int64(0xFFFFFFFF)),
            }
        )
        for i in range(0, max(uv.size, 1), 262144)
    ]
    return rd.from_arrow(chunks if len(chunks) > 1 else chunks[0])


def _pagerank_join(
    edges, nodes_ds, n, *, src, dst, iters, damping_pct, scale,
):
    """Distributed (page-graph) PageRank path: the rank table stays a
    DATASET; each iteration is one node-id-partitioned ``native_join``
    of ranks onto the (edges ⋈ outdeg) table, an in-batch partial mass
    sum, a node-keyed grouped SUM, and a left-outer join back onto the
    node set for the teleport term.  Identical integer recurrence to
    the broadcast path (asserted bit-equal in tests); driver state is
    O(1).  Partitioning assumption (custom-operator rule): edges and
    ranks co-partition by hash(src node id) in the join — a hub node
    with extreme in-degree only skews the grouped SUM, which
    pre-combines in-batch."""
    from geodata_ray.stages.relational import grouped_aggregate, native_join

    dp = np.int64(damping_pct)
    r0 = np.int64(scale) // n
    teleport = (np.int64(scale) * (100 - damping_pct) // 100) // n

    deg_ds = grouped_aggregate(edges, [src], [(src, "count", "deg")])
    edges_deg = native_join(
        edges, deg_ds, on=(src,)
    ).materialize()

    def init_rank(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"],
                "r": pa.array(np.full(len(batch), r0, dtype=np.int64)),
            }
        )

    ranks = nodes_ds.map_batches(
        init_rank, batch_format="pyarrow"
    ).materialize()

    def contrib(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()),
                 "mass": pa.array([], pa.int64())}
            )
        r = batch["r"].to_numpy(zero_copy_only=False)
        deg = batch["deg"].to_numpy(zero_copy_only=False)
        mass = (r * dp // 100) // deg
        t = pa.table({"node": batch[dst], "mass": pa.array(mass)})
        out = t.group_by(["node"]).aggregate([("mass", "sum")])
        return out.rename_columns(["node", "mass"])

    def next_rank(batch: pa.Table) -> pa.Table:
        m = pc.fill_null(
            pc.cast(batch["mass"], pa.int64()), 0
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": batch["node"],
                "r": pa.array(teleport + m),
            }
        )

    for _ in range(iters):
        joined = native_join(
            edges_deg, ranks, on=(src,), right_on=("node",)
        )
        partials = joined.map_batches(
            contrib, batch_format="pyarrow", batch_size=262144
        )
        mass_ds = grouped_aggregate(
            partials, ["node"], [("mass", "sum", "mass")]
        )
        ranks = native_join(
            nodes_ds, mass_ds, on=("node",), join_type="left_outer"
        ).map_batches(next_rank, batch_format="pyarrow").materialize()

    return ranks


def pagerank(
    edges,
    *,
    src: str = "u",
    dst: str = "v",
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
    broadcast_bound: int = PR_BROADCAST_BOUND,
    rank_side: str = "auto",
):
    """PageRank over a (src, dst) edge Dataset with EXACT fixed-point
    integer arithmetic — every quantity is an int64 multiple of
    1/``scale``, updates use floor division only, so the result is
    bit-identical across engines, batch splits and retries (the same
    determinism contract as the LM-surprisal fixed-point log2).

    Semantics (the oracle replays these exactly):
      r_0(x)    = scale // N                      for every node x
      r_t+1(v)  = (scale*(100-damping_pct)//100)//N
                  + sum_{(u,v) in E} (r_t(u)*damping_pct//100) // deg(u)
    Dangling-node mass is dropped (not redistributed) — totals need
    not sum to ``scale``; ranking order is unaffected for host graphs.

    Scale shape: the edge set (the big side) only ever streams through
    ``map_batches`` with in-batch partial sums — per iteration the
    shuffle is the node-bounded grouped SUM, exactly the k-means loop
    shape.  The node-indexed (rank, deg) arrays broadcast once per
    iteration via ``ray.put`` while ``N <= broadcast_bound`` (5M nodes
    ~ 120 MB — host-level graphs; above that, switch the lookup to a
    ``native_join`` per iteration: same semantics, documented
    partitioning by node id).  Driver state is O(N) ints, the same
    bound class as k-means centroids; a 10^9-node page-level graph
    needs the join path, which this raises on rather than silently
    degrading."""
    import ray

    from geodata_ray.stages.relational import grouped_aggregate

    # the edge set is the loop invariant: materialize ONCE so the five
    # iterations (plus the node/degree scans) read object-store blocks
    # instead of re-executing the whole upstream pipeline each time
    edges = edges.materialize()

    def node_col(batch: pa.Table) -> pa.Table:
        a = batch[src]
        b = batch[dst]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        return pa.table({"node": pa.concat_arrays([a, b])})

    if rank_side not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown rank_side {rank_side!r}")

    # node set + n: per-block unique -> fan-in-8 tree union (the
    # packed-distinct machinery).  Ray's sort groupby at 2M node keys
    # measured 96 s of pure setup; the tree does the same in ~3 s.  If
    # the distinct set exceeds the broadcast bound, the tree result is
    # still correct — it only means the JOIN path must run, which
    # rebuilds the node set as a Dataset.
    def block_nodes(batch: pa.Table) -> pa.Table:
        t = node_col(batch)
        u = np.unique(t["node"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(u)})

    nparts = edges.map_batches(block_nodes, batch_format="pyarrow")
    merge = ray.remote(
        lambda *tbls: _uv_unique_merge(
            *(
                t if isinstance(t, np.ndarray)
                else t["node"].to_numpy(zero_copy_only=False)
                for t in tbls
            )
        )
    )
    refs = list(nparts.to_arrow_refs())
    while len(refs) > 1:
        refs = [
            merge.remote(*refs[i: i + 8]) for i in range(0, len(refs), 8)
        ]
    nodes = ray.get(
        merge.remote(refs[0]) if refs else ray.put(np.empty(0, np.int64))
    )
    n = int(nodes.size)
    if n == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "r": pa.array([], pa.int64())})
        )
    if rank_side == "join" or (
        rank_side == "auto" and n > broadcast_bound
    ):
        # page-graph scale: the rank table never touches the driver
        nodes_ds = grouped_aggregate(
            edges.map_batches(node_col, batch_format="pyarrow"),
            ["node"],
            [("node", "count", "_n")],
        ).materialize()
        return _pagerank_join(
            edges, nodes_ds.select_columns(["node"]), n,
            src=src, dst=dst, iters=iters,
            damping_pct=damping_pct, scale=scale,
        )
    if n > broadcast_bound:
        raise NotImplementedError(
            f"pagerank broadcast path requires <= {broadcast_bound} "
            "nodes; use rank_side='join' (or 'auto')"
        )
    nodes_ref0 = ray.put(nodes)

    # out-degree: per-block (src, count) partials scattered dense via
    # the same fan-in-8 tree the iterations use — no sort groupby
    # (measured 45 s at 2M keys) anywhere in the setup
    def block_deg(batch: pa.Table) -> pa.Table:
        u, c = np.unique(
            batch[src].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"node": pa.array(u), "mass": pa.array(c.astype(np.int64))}
        )

    dparts = edges.map_batches(block_deg, batch_format="pyarrow")
    deg_dense = ray.get(
        _pr_tree_reduce(list(dparts.to_arrow_refs()), nodes_ref0, n)
    )
    # dangling placeholder 1 is never read (deg-0 nodes never appear
    # as an edge src)
    deg = np.where(deg_dense > 0, deg_dense, np.int64(1))

    rank = np.full(n, np.int64(scale) // n, dtype=np.int64)
    teleport = (np.int64(scale) * (100 - damping_pct) // 100) // n

    # loop invariants broadcast ONCE (nodes and deg as separate refs —
    # a (nodes, deg) tuple plus a standalone nodes ref would pin the
    # node array twice); only the rank vector re-ships per iteration
    # (at the 5M-node bound: 40 MB/iter instead of 120)
    nodes_ref = nodes_ref0  # already broadcast for the degree reduce
    deg_ref = ray.put(deg)
    for _ in range(iters):
        rank_ref = ray.put(rank)
        partials = edges.map_batches(
            _pr_contrib_fn(nodes_ref, deg_ref, rank_ref, src, dst,
                           damping_pct),
            batch_format="pyarrow",
            batch_size=262144,  # wide batches: per-batch fixed costs
            # (state fetch, partial group_by setup) amortize over
            # ~256k edges; a mass partial is <= min(batch, n) rows
        )
        # dense tree reduce instead of a Ray groupby: each partial is
        # node-keyed and n-bounded, so the sum is an ALLREDUCE, not a
        # shuffle — remote tasks scatter each sparse partial into a
        # dense n-vector (n <= broadcast_bound -> <= 40 MB) and add
        # vectors pairwise up a fan-in-8 tree.  Measured 10x+ over the
        # sort-based Aggregate at 100k nodes (Ray's groupby floor,
        # see BASELINE.md r2 notes).
        refs = list(partials.to_arrow_refs())
        mass = ray.get(_pr_tree_reduce(refs, nodes_ref, n))
        rank = np.full(n, teleport, dtype=np.int64)
        rank += mass

    return ray.data.from_arrow(
        pa.table({"node": pa.array(nodes), "r": pa.array(rank)})
    )


def triangle_counts(
    edges,
    *,
    src: str = "u",
    dst: str = "v",
    num_buckets: int = 32,
):
    """Per-vertex triangle counts over an undirected graph (the
    clustering-coefficient / community-density ingredient): edges are
    canonicalized ``a < b`` and deduped, wedges ``x < y < z`` come from
    ONE bucketed :func:`relational.shuffle_join` of the edge list with
    itself on the shared middle vertex, and the closing edge ``(x, z)``
    is checked against the broadcast packed edge set — the standard
    node-iterator-with-join formulation.

    Scale notes: the wedge join is the quadratic step — its exchange
    is bounded by sum(deg^2); pre-bucketing hot vertices (or a
    degree-ordered orientation, which this canonical a<b form
    approximates) keeps buckets balanced.  The closing-edge set is
    broadcast EXACTLY here (bounded by
    ``distinct_edges_packed``'s own one-task bound — host-level
    graphs); a page-level graph swaps it for ``sketch.bloom_bits`` +
    a per-bucket exact re-verify."""
    ce = _canonical_distinct(edges, src, dst)
    return _triangles_from_canonical(ce, num_buckets=num_buckets)


def _canonical_distinct(edges, src: str, dst: str):
    """Canonicalize an undirected edge list (``a < b``, self-loops
    dropped) and dedup via :func:`distinct_edges_packed`; materialized
    so downstream consumers (wedge join + degree count) don't re-run
    the upstream scan."""

    def canon(batch: pa.Table) -> pa.Table:
        u = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        a = np.minimum(u, v)
        b = np.maximum(u, v)
        keep = a != b  # self-loops close no triangle
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    return distinct_edges_packed(
        edges.map_batches(canon, batch_format="pyarrow"), src="a", dst="b"
    ).materialize()


def _triangles_from_canonical(ce, *, num_buckets: int):
    """Per-vertex triangle counts from a canonical distinct edge
    Dataset (columns ``a < b``) — the wedge-join core shared by
    :func:`triangle_counts` and :func:`clustering_coefficient`."""
    import ray

    from geodata_ray.stages.relational import shuffle_join

    edge_tbl = pa.concat_tables(ray.get(ce.to_arrow_refs()))
    packed = (
        edge_tbl["a"].to_numpy().astype(np.int64) << np.int64(32)
    ) | edge_tbl["b"].to_numpy().astype(np.int64)
    edge_set_ref = ray.put(np.sort(packed))

    left = ce.map_batches(
        lambda t: pa.table({"x": t["a"], "k": t["b"]}),
        batch_format="pyarrow",
    )
    right = ce.map_batches(
        lambda t: pa.table({"k": t["a"], "z": t["b"]}),
        batch_format="pyarrow",
    )
    # x < k from the left's canonical form, k < z from the right's —
    # each triangle materializes as exactly one (x, k, z) wedge row
    wedges = shuffle_join(left, right, ["k"], num_buckets=num_buckets)

    def close_and_unpivot(batch: pa.Table) -> pa.Table:
        es = ray.get(edge_set_ref)
        x = batch["x"].to_numpy(zero_copy_only=False)
        k = batch["k"].to_numpy(zero_copy_only=False)
        z = batch["z"].to_numpy(zero_copy_only=False)
        key = (x << np.int64(32)) | z
        pos = np.searchsorted(es, key)
        ok = (pos < es.size) & (es[np.minimum(pos, es.size - 1)] == key)
        return pa.table(
            {"host": pa.array(np.concatenate([x[ok], k[ok], z[ok]]))}
        )

    tri_verts = wedges.map_batches(
        close_and_unpivot, batch_format="pyarrow"
    )
    from geodata_ray.stages.relational import grouped_aggregate

    return grouped_aggregate(
        tri_verts, ["host"], [("host", "count", "n_triangles")]
    )


def edge_triangle_support(
    edges,
    *,
    src: str = "u",
    dst: str = "v",
    num_buckets: int = 32,
):
    """Per-EDGE triangle support over an undirected graph — the
    k-truss peeling ingredient (an edge's support is the number of
    triangles through it; a k-truss keeps edges with support >= k-2).
    Same canonical wedge join as :func:`triangle_counts`; each closed
    wedge (x < k < z) credits its THREE edges (x,k), (k,z), (x,z),
    emitted packed and finished by one grouped SUM.  Edges closing no
    triangle report support 0 (union with the distinct edge list)."""
    import ray

    from geodata_ray.stages.relational import grouped_aggregate, shuffle_join

    ce = _canonical_distinct(edges, src, dst)
    edge_tbl = pa.concat_tables(ray.get(ce.to_arrow_refs()))
    packed = (
        edge_tbl["a"].to_numpy().astype(np.int64) << np.int64(32)
    ) | edge_tbl["b"].to_numpy().astype(np.int64)
    edge_set_ref = ray.put(np.sort(packed))

    left = ce.map_batches(
        lambda t: pa.table({"x": t["a"], "k": t["b"]}),
        batch_format="pyarrow",
    )
    right = ce.map_batches(
        lambda t: pa.table({"k": t["a"], "z": t["b"]}),
        batch_format="pyarrow",
    )
    wedges = shuffle_join(left, right, ["k"], num_buckets=num_buckets)

    def close_and_credit(batch: pa.Table) -> pa.Table:
        es = ray.get(edge_set_ref)
        x = batch["x"].to_numpy(zero_copy_only=False)
        k = batch["k"].to_numpy(zero_copy_only=False)
        z = batch["z"].to_numpy(zero_copy_only=False)
        key = (x << np.int64(32)) | z
        pos = np.searchsorted(es, key)
        ok = (pos < es.size) & (es[np.minimum(pos, es.size - 1)] == key)
        xk = (x[ok] << np.int64(32)) | k[ok]
        kz = (k[ok] << np.int64(32)) | z[ok]
        xz = key[ok]
        return pa.table({
            "edge": pa.array(np.concatenate([xk, kz, xz])),
            "n": pa.array(np.ones(3 * int(ok.sum()), np.int64)),
        })

    credits = wedges.map_batches(close_and_credit, batch_format="pyarrow")
    zeros = ce.map_batches(
        lambda t: pa.table({
            "edge": pa.array(
                (t["a"].to_numpy().astype(np.int64) << np.int64(32))
                | t["b"].to_numpy().astype(np.int64)),
            "n": pa.array(np.zeros(t.num_rows, np.int64)),
        }),
        batch_format="pyarrow",
    )
    agg = grouped_aggregate(
        credits.union(zeros), ["edge"], [("n", "sum", "support")]
    )

    def unpack(batch: pa.Table) -> pa.Table:
        e = batch["edge"].to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array(e >> np.int64(32)),
            "b": pa.array(e & np.int64(0xFFFFFFFF)),
            "support": batch["support"],
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


def clustering_coefficient(
    edges,
    *,
    src: str = "u",
    dst: str = "v",
    num_buckets: int = 32,
    scale: int = 1_000_000,
):
    """Per-vertex LOCAL clustering coefficient over an undirected
    graph: ``2 * triangles(v) / (deg(v) * (deg(v) - 1))``, emitted as
    the exact floor-scaled integer ``coeff_ppm`` plus its exact
    ingredients (deg, n_triangles) — the standard community-density
    score next to :func:`triangle_counts` (reference parity: the
    per-node ratio form of the same wedge statistic).

    Plan: ONE canonical distinct-edge pass feeds both the wedge join
    (triangles) and the degree count; the two bounded per-vertex
    aggregates merge in a single grouped SUM (tri rows carry deg=0,
    degree rows carry tri=0 — a union, never a join, so no second
    exchange and no empty-side join hazard).  Vertices with deg < 2
    emit coeff_ppm = 0.  All arithmetic is int64; deg*(deg-1) is
    overflow-guarded."""
    from geodata_ray.stages.relational import grouped_aggregate

    ce = _canonical_distinct(edges, src, dst)
    tri = _triangles_from_canonical(ce, num_buckets=num_buckets)

    def tri_side(batch: pa.Table) -> pa.Table:
        n = batch["n_triangles"].to_numpy(zero_copy_only=False)
        return pa.table({
            "host": batch["host"],
            "tri": pa.array(n.astype(np.int64)),
            "deg": pa.array(np.zeros(len(batch), np.int64)),
        })

    def deg_side(batch: pa.Table) -> pa.Table:
        hosts = np.concatenate([
            batch["a"].to_numpy(zero_copy_only=False),
            batch["b"].to_numpy(zero_copy_only=False),
        ]).astype(np.int64)
        return pa.table({
            "host": pa.array(hosts),
            "tri": pa.array(np.zeros(hosts.size, np.int64)),
            "deg": pa.array(np.ones(hosts.size, np.int64)),
        })

    merged = grouped_aggregate(
        tri.map_batches(tri_side, batch_format="pyarrow").union(
            ce.map_batches(deg_side, batch_format="pyarrow")
        ),
        ["host"],
        [("tri", "sum", "n_triangles"), ("deg", "sum", "deg")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        deg = batch["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        tri_n = batch["n_triangles"].to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        if deg.size and int(deg.max()) > 3_037_000_499:
            raise OverflowError(
                "clustering_coefficient: deg*(deg-1) exceeds int64"
            )
        if tri_n.size and int(tri_n.max()) > (2**62) // scale:
            raise OverflowError(
                "clustering_coefficient: 2*tri*scale exceeds int64"
            )
        denom = deg * (deg - 1)
        coeff = np.zeros(deg.size, np.int64)
        ok = denom > 0
        coeff[ok] = (2 * tri_n[ok] * scale) // denom[ok]
        return pa.table({
            "host": batch["host"],
            "deg": pa.array(deg),
            "n_triangles": pa.array(tri_n),
            "coeff_ppm": pa.array(coeff),
        })

    return merged.map_batches(finish, batch_format="pyarrow")


def eccentricity(edges, *, src: str = "u", dst: str = "v",
                 node_bound: int = 8192):
    """Per-node ECCENTRICITY (max hop distance to any reachable node)
    over an undirected edge Dataset — the all-pairs-BFS diameter /
    radius ingredient for bounded entity graphs (host graphs, cluster
    adjacency).  Edges dedup DISTRIBUTED (the same
    ``distinct_edges_packed`` one-task bound as ``triangle_counts``);
    the APSP itself runs on the driver as vectorized boolean
    matrix-multiply BFS over the BOUNDED node set — ``node_bound``
    RAISES past the dense n^2 frontier.  Peak driver memory is three
    n^2 bool matrices (3 x 64 MB at the 8192 bound) — eccentricity
    folds PER ROUND (a row's ecc is the last round it gained a node),
    so no n^2 distance matrix is ever held.  A page-scale graph swaps
    this for per-source ``bfs_levels`` rounds, output shape unchanged.

    Returns (host, ecc, n_reachable); ecc = 0 for isolated canonical
    self-nodes never appears (self-loops are dropped), singleton
    components of one edge have ecc 1.
    """
    import ray
    import ray.data as rd

    ce = _canonical_distinct(edges, src, dst)
    edge_tbl = pa.concat_tables(ray.get(ce.to_arrow_refs()))
    a = edge_tbl["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = edge_tbl["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    if nodes.size > node_bound:
        raise ValueError(
            f"eccentricity: {nodes.size} nodes exceeds node_bound="
            f"{node_bound}; use per-source bfs_levels instead"
        )
    n = nodes.size
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    adj = np.zeros((n, n), dtype=bool)
    adj[ia, ib] = True
    adj[ib, ia] = True
    reach = np.eye(n, dtype=bool)
    ecc = np.zeros(n, dtype=np.int64)
    d = 0
    while True:
        d += 1
        nreach = reach | (reach @ adj)
        new = nreach & ~reach
        if not new.any():
            break
        ecc[new.any(axis=1)] = d
        reach = nreach
    n_reach = reach.sum(axis=1).astype(np.int64)
    return rd.from_arrow(pa.table({
        "host": pa.array(nodes),
        "ecc": pa.array(ecc.astype(np.int64)),
        "n_reachable": pa.array(n_reach),
    }))


def bfs_levels(edges, seeds, *, src: str = "u", dst: str = "v",
               max_depth: int = 2, node_bound: int = 5_000_000):
    """Multi-source BFS distance labels up to ``max_depth`` over a
    directed edge Dataset (frontier expansion — the crawl-scheduler /
    link-neighborhood primitive).

    Per round: the current frontier is BROADCAST as a key set
    (``semi_join``-style ``is_in`` filter on ``src`` — no edge-side
    shuffle), and the matched ``dst`` values collapse to a distinct
    list.  The visited set lives driver-side, bounded by the REACHABLE
    node count, never the edge count — the same documented broadcast
    bound as ``pagerank``'s rank table (``node_bound`` raises rather
    than silently degrading; past it, swap the frontier filter for a
    ``native_join`` against a frontier Dataset, round shape unchanged).

    Returns a Dataset of (node, dist), dist = 0 for seeds.
    """
    import ray
    import ray.data as rd

    from geodata_ray.stages.relational import semi_join

    visited: dict[int, int] = {int(s): 0 for s in seeds}
    frontier = sorted(visited)
    for depth in range(1, max_depth + 1):
        if not frontier:
            break
        hits = semi_join(edges, ray.put(np.asarray(frontier, np.int64)),
                         src)
        neigh = hits.unique(dst)
        new = sorted(int(v) for v in neigh if int(v) not in visited)
        if len(visited) + len(new) > node_bound:
            raise ValueError(
                f"bfs_levels: reachable set exceeds node_bound="
                f"{node_bound}; use the join-frontier path"
            )
        for v in new:
            visited[v] = depth
        frontier = new
    t = pa.table(
        {
            "node": pa.array(list(visited.keys()), pa.int64()),
            "dist": pa.array(list(visited.values()), pa.int64()),
        }
    )
    return rd.from_arrow(t)


def resolve_entities(ds, *, id_col: str, key_cols, cc_mode: str = "auto"):
    """Multi-key entity resolution (record linkage by union-find):
    records sharing ANY blocking-key value — same email, same phone,
    same content fingerprint — merge TRANSITIVELY into one entity
    (A~B on email, B~C on phone => {A,B,C}).  Returns one
    (record_id, entity_id) row per input record; entity_id is the
    component's minimum record id; null key values never link.

    Plan: explode non-null (key_index, value, id) rows; shard by value
    hash and emit per-key-value STAR edges (segment min -> others), so
    a k-record block ships k edges, never k^2 pairs; run the shared
    connected-components kernel over the union of all keys' edges
    (distributed label propagation past the local bound); anti-join
    the edge-free records back in as singleton entities.  Every
    exchange is keyed by value hash or node id — 10^12-record shape.
    """
    import ray
    import ray.data as rd

    from geodata_ray.sources.synth import splitmix64
    from geodata_ray.stages.relational import anti_join

    key_cols = list(key_cols)
    if not key_cols:
        raise ValueError("need at least one blocking key column")

    def explode(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        hs, rid = [], []
        for kidx, kc in enumerate(key_cols):
            col = batch[kc]
            mask = pc.is_valid(col).to_numpy(zero_copy_only=False)
            if not mask.any():
                continue
            # fill nulls BEFORE to_numpy: a nullable int64 column
            # otherwise converts through float64, which aliases
            # distinct keys >= 2^53 (e.g. 64-bit content fingerprints)
            v = pc.cast(col, pa.int64()).fill_null(0).to_numpy(
                zero_copy_only=False
            )
            vv = v[mask].astype(np.int64)
            # separate key spaces: same VALUE in different key columns
            # must not collide.  The salt must be a full-width hash of
            # the key index — a small additive constant XORed in lets
            # nearby values alias across spaces (0 ^ C0 == 15 ^ C1
            # when C1 = C0 ^ 15)
            salt = splitmix64(
                np.array([0x51ED2700 + kidx], dtype=np.uint64)
            )[0]
            h = splitmix64(vv.view(np.uint64) ^ salt).view(np.int64)
            hs.append(h)
            rid.append(ids[mask])
        if not hs:
            return pa.table(
                {
                    "kh": pa.array([], pa.int64()),
                    "rid": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "kh": pa.array(np.concatenate(hs)),
                "rid": pa.array(np.concatenate(rid)),
            }
        )

    ex = ds.map_batches(explode, batch_format="pyarrow")

    # star edges straight from a SHARDED groupby (hash(kh) % shards,
    # complete key groups per shard): sort each shard by (kh, rid),
    # segment-min per key, emit (min, other) — no join stage at all,
    # one shuffle keyed by value hash
    n_shards = 32

    def add_shard(batch: pa.Table) -> pa.Table:
        kh = batch["kh"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__s",
            pa.array(
                (kh.view(np.uint64) % np.uint64(n_shards)).astype(
                    np.int64
                )
            ),
        )

    def star(t: pa.Table) -> pa.Table:
        kh = t["kh"].to_numpy(zero_copy_only=False)
        rid = t["rid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((rid, kh))
        kh, rid = kh[order], rid[order]
        new = np.ones(kh.size, dtype=bool)
        new[1:] = kh[1:] != kh[:-1]
        starts = np.flatnonzero(new)
        seglen = np.diff(np.append(starts, kh.size))
        root = np.repeat(rid[starts], seglen)
        keep = rid != root
        return pa.table(
            {
                "id_a": pa.array(root[keep], pa.int64()),
                "id_b": pa.array(rid[keep], pa.int64()),
            }
        )

    edges = (
        ex.map_batches(add_shard, batch_format="pyarrow")
        .groupby("__s")
        .map_groups(
            lambda g: star(g.drop_columns(["__s"])),
            batch_format="pyarrow",
        )
        .materialize()
    )
    ids_only = ds.map_batches(
        lambda b: pa.table(
            {id_col: pc.cast(b[id_col], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    if edges.count() == 0:
        return ids_only.map_batches(
            lambda b: pa.table(
                {
                    "record_id": b[id_col],
                    "entity_id": b[id_col],
                }
            ),
            batch_format="pyarrow",
        )
    assign = connected_components(edges, mode=cc_mode)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "record_id": batch["node"],
                "entity_id": batch["cluster_id"],
            }
        )

    linked = assign.map_batches(rename, batch_format="pyarrow")
    # singleton records (no edge) keep their own id; the linked node
    # set is bounded by 2x edge count, small relative to the corpus
    linked_parts = [
        t["record_id"].to_numpy(zero_copy_only=False)
        for t in ray.get(linked.to_arrow_refs())
        if t.num_rows
    ]
    linked_ids = (
        np.unique(np.concatenate(linked_parts))
        if linked_parts
        else np.empty(0, dtype=np.int64)
    )
    singles = anti_join(ids_only, linked_ids, id_col).map_batches(
        lambda b: pa.table(
            {"record_id": b[id_col], "entity_id": b[id_col]}
        ),
        batch_format="pyarrow",
    )
    return linked.union(singles)


def sssp(edges, source: int, *, src: str = "u", dst: str = "v",
         weight: str = "w", max_rounds: int = 64,
         node_bound: int = 5_000_000):
    """Weighted single-source shortest paths by distributed
    Bellman-Ford relaxation — the weighted sibling of
    :func:`bfs_levels` (crawl-cost / link-latency distances over the
    host graph).

    Per round the CURRENT distance table — bounded by the reachable
    node count, never the edge count — is broadcast once
    (``ray.put``); every edge block relaxes vectorized
    (``searchsorted`` lookup of ``dist[src]``, candidate
    ``dist + w``, per-block ``minimum.reduceat`` partial min per
    ``dst``), and only the tiny (node, candidate-min) partials merge
    driver-side.  Edges stream every round with zero shuffle;
    convergence = a round with no improvement (<= V-1 rounds by
    Bellman-Ford's invariant, typically the graph diameter).  Negative
    weights are rejected (termination guard); ``node_bound`` raises
    rather than silently degrading — past it, swap the broadcast for a
    ``native_join`` of the distance Dataset against edges, round shape
    unchanged.  Returns a Dataset of (node, dist) for reached nodes.
    """
    import ray
    import ray.data as rd

    nodes = np.array([int(source)], dtype=np.int64)
    dist = np.array([0], dtype=np.int64)

    def relax_fn(nodes_ref, dist_ref):
        def relax(batch: pa.Table) -> pa.Table:
            nd = nodes_ref if isinstance(nodes_ref, np.ndarray) \
                else ray.get(nodes_ref)
            dv = dist_ref if isinstance(dist_ref, np.ndarray) \
                else ray.get(dist_ref)
            u = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
            v = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
            w = batch[weight].to_numpy(zero_copy_only=False).astype(
                np.int64)
            if w.size and int(w.min()) < 0:
                raise ValueError("sssp: negative edge weight")
            pos = np.searchsorted(nd, u)
            pos = np.minimum(pos, max(nd.size - 1, 0))
            known = nd.size > 0
            hit = (nd[pos] == u) if known else np.zeros(u.size, bool)
            if not hit.any():
                return pa.table({"node": pa.array([], pa.int64()),
                                 "cand": pa.array([], pa.int64())})
            cand = dv[pos[hit]] + w[hit]
            vv = v[hit]
            order = np.argsort(vv, kind="stable")
            vv, cand = vv[order], cand[order]
            starts = np.flatnonzero(np.r_[True, vv[1:] != vv[:-1]])
            return pa.table(
                {
                    "node": pa.array(vv[starts]),
                    "cand": pa.array(
                        np.minimum.reduceat(cand, starts).astype(np.int64)
                    ),
                }
            )
        return relax

    for _ in range(max_rounds):
        nref, dref = ray.put(nodes), ray.put(dist)
        part = edges.map_batches(
            relax_fn(nref, dref), batch_format="pyarrow"
        )
        # merge the bounded per-block partials (<= blocks x reached)
        cand = part.groupby("node").min("cand").to_pandas()
        if cand.empty:
            break
        cn = cand["node"].to_numpy().astype(np.int64)
        cd = cand["min(cand)"].to_numpy().astype(np.int64)
        all_nodes = np.union1d(nodes, cn)
        if all_nodes.size > node_bound:
            raise ValueError(
                f"sssp: reachable set exceeds node_bound={node_bound}; "
                "use the join-distance path"
            )
        new = np.full(all_nodes.size, np.iinfo(np.int64).max, np.int64)
        new[np.searchsorted(all_nodes, nodes)] = dist
        ci = np.searchsorted(all_nodes, cn)
        np.minimum.at(new, ci, cd)
        if all_nodes.size == nodes.size and np.array_equal(new, dist):
            break
        nodes, dist = all_nodes, new

    return rd.from_arrow(
        pa.table({"node": pa.array(nodes), "dist": pa.array(dist)})
    )


def k_core(edges, *, k: int, src: str = "u", dst: str = "v",
           max_rounds: int = 12, node_bound: int = 5_000_000):
    """k-core decomposition by iterative peeling: repeatedly drop
    nodes whose degree in the surviving induced subgraph is below
    ``k`` — the standard spam-farm / community-density filter over
    the host link graph.  Input edges are treated as UNDIRECTED and
    are symmetrized + dedup'd here (self-loops dropped), so callers
    pass the raw directed link table.

    Shape: edges live in a Dataset and stream every round with zero
    shuffle; only the ALIVE node set — bounded by ``node_bound``,
    raises past it — broadcasts via ``ray.put``.  Per round each edge
    block emits pre-combined per-node degree partials for edges whose
    BOTH endpoints are alive; the bounded partials merge in one tiny
    groupby.  Peeling is monotone, so a round that removes nothing is
    the fixpoint and rounds past it are no-ops — running to
    ``max_rounds`` and early-breaking on stability are the SAME
    function, which is what makes the unrolled-CTE oracle exact.
    Returns (node, core_degree) for nodes surviving ``max_rounds``
    peels, with their degree in the final induced subgraph."""
    import ray
    import ray.data as rd

    def symmetrize(b: pa.Table) -> pa.Table:
        a = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != c  # vectorized self-loop drop, pre-shuffle
        a, c = a[keep], c[keep]
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, c])),
                "v": pa.array(np.concatenate([c, a])),
            }
        )

    sym = distinct_edges_packed(
        edges.map_batches(symmetrize, batch_format="pyarrow")
    )

    def degree_fn(alive_ref):
        def deg(batch: pa.Table) -> pa.Table:
            al = (
                alive_ref
                if alive_ref is None or isinstance(alive_ref, np.ndarray)
                else ray.get(alive_ref)
            )
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            if al is not None:
                keep = np.isin(u, al) & np.isin(v, al)
                u = u[keep]
            if u.size == 0:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "d": pa.array([], pa.int64())})
            uu, cc = np.unique(u, return_counts=True)
            return pa.table({"node": pa.array(uu.astype(np.int64)),
                             "d": pa.array(cc.astype(np.int64))})
        return deg

    alive = None  # first round: all endpoint nodes
    last = None
    for _ in range(max_rounds):
        aref = ray.put(alive) if alive is not None else None
        part = sym.map_batches(
            degree_fn(aref if aref is not None else alive),
            batch_format="pyarrow",
        )
        degs = part.groupby("node").sum("d").to_pandas()
        if degs.empty:
            alive = np.array([], dtype=np.int64)
            last = degs
            break
        nodes = degs["node"].to_numpy().astype(np.int64)
        if nodes.size > node_bound:
            raise ValueError(
                f"k_core: alive set {nodes.size} exceeds "
                f"node_bound={node_bound}"
            )
        d = degs["sum(d)"].to_numpy().astype(np.int64)
        new_alive = np.sort(nodes[d >= k])
        last = degs
        if alive is not None and np.array_equal(new_alive, alive):
            break
        alive = new_alive

    if alive is None or alive.size == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "core_degree": pa.array([], pa.int64())})
        )
    # final degrees within the surviving induced subgraph
    aref = ray.put(alive)
    part = sym.map_batches(degree_fn(aref), batch_format="pyarrow")
    final = part.groupby("node").sum("d")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"],
                "core_degree": batch["sum(d)"].cast(pa.int64()),
            }
        )

    return final.map_batches(project, batch_format="pyarrow")


def sorted_map_lookup(nodes: np.ndarray, vals: np.ndarray,
                      keys: np.ndarray, default: int = 0) -> np.ndarray:
    """Vectorized lookup of ``keys`` in the SORTED (nodes -> vals) map
    (the broadcast score/degree-table idiom shared by ``hits_scores``,
    ``sssp`` and the neighbor-degree query): misses fill ``default``.
    Callers MUST pass ``nodes`` sorted — the groupby outputs feeding
    this are argsorted first, never trusted to arrive ordered."""
    pos = np.searchsorted(nodes, keys)
    pos = np.minimum(pos, max(nodes.size - 1, 0))
    hit = (nodes[pos] == keys) if nodes.size else np.zeros(
        keys.size, bool
    )
    return np.where(hit, vals[pos] if nodes.size else default, default)


def hits_scores(edges, *, src: str = "u", dst: str = "v",
                node_bound: int = 5_000_000):
    """HITS hubs-and-authorities (Kleinberg), ONE unnormalized
    mutual-reinforcement round in exact integers: with ``h0 = 1``
    everywhere, ``auth1(v) = indegree(v)``, ``hub(u) = sum of auth1
    over u's out-neighbors``, ``auth(v) = sum of hub over v's
    in-neighbors`` — the integer-exact core of the algorithm (float
    normalization only rescales the ranking, so dropping it keeps the
    order AND makes the result bit-identical across engines).

    Shape: edges stream three times with zero shuffle; the score maps
    that broadcast between passes are bounded by the node count
    (``node_bound`` raises past it — above that, swap the broadcast
    for a ``native_join`` per pass).  Emits (node, hub, auth) with 0
    for a missing side."""
    import ray
    import ray.data as rd

    e = distinct_edges_packed(edges)

    def indeg_partial(batch: pa.Table) -> pa.Table:
        v = batch[dst].to_numpy(zero_copy_only=False)
        uu, cc = np.unique(v, return_counts=True)
        return pa.table({"node": pa.array(uu.astype(np.int64)),
                         "x": pa.array(cc.astype(np.int64))})

    a1 = e.map_batches(indeg_partial, batch_format="pyarrow") \
        .groupby("node").sum("x").to_pandas()
    if len(a1) > node_bound:
        raise ValueError(
            f"hits_scores: node set {len(a1)} exceeds "
            f"node_bound={node_bound}; use the join path"
        )
    # sort explicitly before the searchsorted lookups: Ray's groupby
    # happening to emit key-sorted blocks is an implementation detail,
    # not a contract (k_core/sssp/pagerank all sort too)
    a1_nodes = a1["node"].to_numpy().astype(np.int64)
    a1_vals = a1["sum(x)"].to_numpy().astype(np.int64)
    o = np.argsort(a1_nodes)
    a1_nodes, a1_vals = a1_nodes[o], a1_vals[o]

    def gather_sum_fn(nodes_ref, vals_ref, key_in, key_out):
        def fn(batch: pa.Table) -> pa.Table:
            nd = ray.get(nodes_ref)
            vv = ray.get(vals_ref)
            kin = batch[key_in].to_numpy(zero_copy_only=False)
            kout = batch[key_out].to_numpy(zero_copy_only=False)
            val = sorted_map_lookup(nd, vv, kin, default=0)
            # contributions only from known-score sources (default-0
            # rows add nothing but would create spurious zero groups)
            hit = val != 0
            ko, val = kout[hit], val[hit]
            order = np.argsort(ko, kind="stable")
            ko, val = ko[order], val[order]
            starts = np.flatnonzero(np.r_[True, ko[1:] != ko[:-1]])
            return pa.table(
                {
                    "node": pa.array(ko[starts].astype(np.int64)),
                    "x": pa.array(
                        np.add.reduceat(val, starts).astype(np.int64)
                        if ko.size else np.array([], np.int64)
                    ),
                }
            )
        return fn

    n_ref, v_ref = ray.put(a1_nodes), ray.put(a1_vals)
    h1 = e.map_batches(
        gather_sum_fn(n_ref, v_ref, dst, src), batch_format="pyarrow"
    ).groupby("node").sum("x").to_pandas()
    h_nodes = h1["node"].to_numpy().astype(np.int64)
    h_vals = h1["sum(x)"].to_numpy().astype(np.int64)
    o = np.argsort(h_nodes)
    h_nodes, h_vals = h_nodes[o], h_vals[o]

    hn_ref, hv_ref = ray.put(h_nodes), ray.put(h_vals)
    a2 = e.map_batches(
        gather_sum_fn(hn_ref, hv_ref, src, dst), batch_format="pyarrow"
    ).groupby("node").sum("x").to_pandas()
    a_nodes = a2["node"].to_numpy().astype(np.int64)
    a_vals = a2["sum(x)"].to_numpy().astype(np.int64)

    # full outer of the two bounded maps, 0-filled
    nodes = np.union1d(h_nodes, a_nodes)
    hub = np.zeros(nodes.size, dtype=np.int64)
    hub[np.searchsorted(nodes, h_nodes)] = h_vals
    auth = np.zeros(nodes.size, dtype=np.int64)
    auth[np.searchsorted(nodes, a_nodes)] = a_vals
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes),
                "hub": pa.array(hub),
                "auth": pa.array(auth),
            }
        )
    )

"""Iterative graph algorithms over edge tables — PageRank.

Web-scale curation pipelines use link-graph centrality as a document
quality prior (the CommonCrawl lineage of harmonic/PageRank
filtering); the connected-components winners in ``dedup.py`` cover
the union-find side, this covers the iterative-scoring side.

Scale design (the part that matters at 10^12 edges): the rank vector
is O(nodes) — too big to broadcast — so every iteration is expressed
as TABLE operations: rank ⨝ edges on ``src`` (one bucketed hash
shuffle), per-``dst`` partial sums (one more), then a LEFT join back
onto the node table so zero-in-degree nodes keep the teleport term.
The driver only ever holds scalars (N, dangling mass). Each
iteration's rank table is ``materialize()``-ed — the standard
iterative-algorithm checkpoint that keeps lineage from re-running all
prior iterations (Ray spills blocks to the object store; the table is
O(nodes), never collected).

Dangling nodes (no out-edges) redistribute their mass uniformly, so
``Σ rank == 1`` holds at every iteration (asserted in tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .joins import hash_join, partial_agg
from .shuffle import TaggedUnion


def _distinct_nodes(edges: "ray.data.Dataset", num_buckets: int
                    ) -> "ray.data.Dataset":
    """Distinct node ids over src ∪ dst: per-batch distinct partials,
    one bucketed distinct combine (same invariant as
    ``distinct_count_per_group`` — a node lands in exactly one
    bucket)."""

    def _both(batch: pa.Table) -> pd.DataFrame:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        u = np.unique(np.concatenate([s, d]))
        h = pd.util.hash_array(u).astype(np.uint64)
        return pd.DataFrame({
            "node": u.astype(np.int64),
            "_bucket": (h % np.uint64(num_buckets)).astype(np.int32)})

    def _dedup(df: pd.DataFrame) -> pd.DataFrame:
        return (df.drop_duplicates("node")[["node"]]
                .reset_index(drop=True))

    return (edges.map_batches(_both, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("_bucket").map_groups(_dedup, batch_format="pandas"))


def pagerank(
    edges: "ray.data.Dataset",
    damping: float = 0.85,
    iters: int = 3,
    num_buckets: int = 32,
    tol: float | None = None,
    return_iters: bool = False,
    weight_col: str | None = None,
) -> "ray.data.Dataset":
    """Join-based distributed PageRank over an ``(src:int64,
    dst:int64)`` edge table; returns ``(node, rank)`` after ``iters``
    synchronous iterations from the uniform start (or earlier when
    ``tol`` is set and ``max |Δrank|`` drops under it — the standard
    convergence exit; ``tol=None`` pins the iteration count so results
    are bit-reproducible across runs).

    Per iteration: TWO bucketed shuffles — rank⨝edges on src, then one
    FUSED node-keyed shuffle where rank rows and raw per-edge
    contributions meet in the same bucket and a single combiner sums
    contributions AND applies the update (round 5; previously a
    partial_agg plus a LEFT join made it three). Node/rank tables
    never leave the cluster; the dangling mass and the convergence
    delta are in-cluster aggregations (``map_batches`` partials ->
    ``Dataset.sum``/``max``) — the driver only ever receives scalars.

    ``return_iters=True`` returns ``(ranks, n_iterations_run)``.
    ``weight_col``: edge-weighted PageRank — a source's rank splits
    proportionally to edge weights (``rank * w / Σw(src)``) instead of
    uniformly; the plan is identical, only the out-degree aggregate
    becomes a weight sum.
    """
    nb = int(num_buckets)

    # out-degree (or out-weight-sum) per src: exact partials
    if weight_col is None:
        outdeg = partial_agg(edges, ["src"], count_col="outdeg",
                             combine="distributed", num_buckets=nb)
    else:
        outdeg = partial_agg(
            edges.map_batches(
                lambda df, _w=weight_col: pd.DataFrame(
                    {"src": df["src"].astype(np.int64),
                     "w": df[_w].astype(np.int64)}),
                batch_format="pandas"),
            ["src"], sums=["w"], count_col="_n",
            combine="distributed", num_buckets=nb).map_batches(
            lambda df: pd.DataFrame(
                {"src": df["src"].astype(np.int64),
                 "outdeg": df["sum_w"].astype(np.int64)}),
            batch_format="pandas")

    nodes = _distinct_nodes(edges, nb).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        # typed empty Arrow table: from_pandas on a 0-row frame drops
        # the schema through to_pandas
        out = ray.data.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()),
             "rank": pa.array([], pa.float64())}))
        return (out, 0) if return_iters else out

    # fold outdeg into the edge table ONCE (edges with it are reused
    # every iteration; dangling srcs never appear in edges by def.)
    e_cols = [("src", pa.int64()), ("dst", pa.int64())]
    if weight_col is not None:
        e_cols.append((weight_col, pa.int64()))
    e_sch = pa.schema(e_cols)
    o_sch = pa.schema([("src", pa.int64()), ("outdeg", pa.int64())])
    edges_w = hash_join(edges, outdeg, on="src", num_buckets=nb,
                        schemas=(e_sch, o_sch)).materialize()

    # fold the (static) dangling flag into the rank table ONCE: nodes
    # with no out-edges never gain any, so per-iteration dangling mass
    # is a map-only scan instead of an anti join
    n_sch = pa.schema([("node", pa.int64())])
    od_by_node = outdeg.map_batches(
        lambda df: df.rename(columns={"src": "node"}),
        batch_format="pandas")
    od_sch = pa.schema([("node", pa.int64()), ("outdeg", pa.int64())])

    def _rank0(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": df["node"].astype(np.int64),
            "rank": np.full(len(df), 1.0 / n_nodes),
            "dang": df["outdeg"].isna().to_numpy()})

    rank = hash_join(nodes, od_by_node, on="node", how="left",
                     num_buckets=nb, schemas=(n_sch, od_sch)
                     ).map_batches(_rank0,
                                   batch_format="pandas").materialize()
    r_sch = pa.schema([("node", pa.int64()), ("rank", pa.float64()),
                       ("dang", pa.bool_())])

    def _dang_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"m": [float(df.loc[df["dang"], "rank"].sum())]})

    iters_run = 0
    for _ in range(int(iters)):
        # scalar dangling mass: in-cluster partial sums reduced by
        # Dataset.sum — the driver receives ONE float, not rank blocks
        d_mass = float(rank.map_batches(
            _dang_partial, batch_format="pandas").sum("m") or 0.0)

        # contributions: rank/outdeg shipped along edges, emitted per dst
        ew_cols = [("node", pa.int64()), ("dst", pa.int64()),
                   ("outdeg", pa.int64())]
        if weight_col is not None:
            ew_cols.insert(2, (weight_col, pa.int64()))

        def _contrib(df: pd.DataFrame, _w=weight_col) -> pd.DataFrame:
            # map-side combine: per-block partial sums per dst BEFORE
            # the shuffle, so the fused exchange moves O(distinct dst
            # per block) rows, not O(edges) — the shuffle-minimizing
            # half the old partial_agg provided, kept under the fusion
            r = df["rank"].to_numpy(np.float64)
            if _w is not None:
                r = r * df[_w].to_numpy(np.float64)
            return (pd.DataFrame(
                {"node": df["dst"].astype(np.int64),
                 "c": r / df["outdeg"].to_numpy()})
                .groupby("node", sort=False, as_index=False)["c"].sum())

        contrib_in = hash_join(
            edges_w.map_batches(
                lambda df: df.rename(columns={"src": "node"}),
                batch_format="pandas"),
            rank, on="node", num_buckets=nb, coalesce_blocks=nb,
            schemas=(pa.schema(ew_cols), r_sch),
        ).map_batches(_contrib, batch_format="pandas")

        base = (1.0 - damping) / n_nodes + damping * d_mass / n_nodes

        # FUSED second shuffle (round 5; was partial_agg + LEFT join =
        # two shuffles): rank rows and raw per-edge contributions land
        # in the SAME node-keyed bucket, where one combiner sums the
        # contributions AND applies the rank update — 2 shuffles per
        # iteration total instead of 3. coalesce keeps the block count
        # from multiplying across iterations (96 -> 224 -> 480 measured
        # without it).
        c_sch = pa.schema([("node", pa.int64()), ("c", pa.float64())])
        tu = TaggedUnion(rank, contrib_in, key="node", num_buckets=nb,
                         coalesce_blocks=nb, schemas=(r_sch, c_sch))

        def _update(df: pd.DataFrame, _base=base) -> pd.DataFrame:
            if df.empty or "node" not in df.columns:
                cols = {"node": pd.Series([], dtype=np.int64),
                        "rank": pd.Series([], dtype=np.float64),
                        "dang": pd.Series([], dtype=bool)}
                if tol is not None:
                    cols["_delta"] = pd.Series([], dtype=np.float64)
                return pd.DataFrame(cols)
            side = df["_side"].to_numpy()
            ln = df["node"].to_numpy(np.int64)
            lmask = side == 0
            nodes = ln[lmask]
            rank_old = df["rank"].to_numpy(np.float64)[lmask]
            dang = df["dang"].to_numpy()[lmask].astype(bool)
            rn = ln[~lmask]
            rc = df["c"].to_numpy(np.float64)[~lmask]
            c = np.zeros(len(nodes), dtype=np.float64)
            if len(rn):
                order = np.argsort(rn, kind="stable")
                rn, rc = rn[order], rc[order]
                starts = np.flatnonzero(
                    np.concatenate(([True], rn[1:] != rn[:-1])))
                sums = np.add.reduceat(rc, starts)
                uniq = rn[starts]
                pos = np.minimum(np.searchsorted(uniq, nodes),
                                 len(uniq) - 1)
                hit = uniq[pos] == nodes
                c[hit] = sums[pos[hit]]
            new = _base + damping * c
            out = {"node": nodes, "rank": new, "dang": dang}
            if tol is not None:
                out["_delta"] = np.abs(new - rank_old)
            return pd.DataFrame(out)

        rank = tu.map_buckets(_update).materialize()
        iters_run += 1
        if tol is not None:
            # convergence check: in-cluster max over the per-node
            # |Δrank| column, then drop it so the schema the next
            # iteration's joins expect stays (node, rank, dang)
            max_d = float(rank.max("_delta") or 0.0)
            rank = rank.map_batches(
                lambda df: df[["node", "rank", "dang"]],
                batch_format="pandas")
            if max_d < tol:
                break

    out = rank.map_batches(lambda df: df[["node", "rank"]],
                           batch_format="pandas")
    return (out, iters_run) if return_iters else out


def _tag_low(batch: pa.Table, num_buckets: int) -> pd.DataFrame:
    """Validate oriented distinct edges and bucket them by the LOW
    endpoint (a node's whole adjacency lands in one bucket task)."""
    a = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(a) and (a.max() >= 1 << 31 or b.max() >= 1 << 31):
        raise ValueError("wedge join packs pairs into int64; "
                         "ids must be < 2^31")
    if np.any(a >= b):
        raise ValueError("edges must be oriented src < dst, distinct")
    h = pd.util.hash_array(a).astype(np.uint64)
    return pd.DataFrame({
        "a": a, "b": b,
        "_bucket": (h % np.uint64(num_buckets)).astype(np.int32)})


def _bucket_wedges(df: pd.DataFrame) -> pd.DataFrame:
    """All wedges of one low-endpoint bucket — fully vectorized across
    ALL nodes of the bucket (no per-node Python): sort (a, b), dedup,
    then the element at in-group position p pairs as the FIRST member
    with its d-1-p later neighbors — one repeat + one arange builds
    every wedge.  Returns (a = apex/low node, pair = packed b·2³¹+c
    with b < c)."""
    empty = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                          "pair": pd.Series([], dtype=np.int64)})
    if df.empty or "a" not in df.columns:          # Ray empty partition
        return empty
    a0 = df["a"].to_numpy(np.int64)
    b0 = df["b"].to_numpy(np.int64)
    order = np.lexsort((b0, a0))
    a, b = a0[order], b0[order]
    keep = np.concatenate(
        ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
    a, b = a[keep], b[keep]
    starts = np.flatnonzero(
        np.concatenate(([True], a[1:] != a[:-1])))
    cnt = np.diff(np.concatenate([starts, [len(a)]]))
    pos = np.arange(len(a)) - np.repeat(starts, cnt)
    reps = np.repeat(cnt, cnt) - 1 - pos
    total = int(reps.sum())
    if total == 0:
        return empty
    ii = np.repeat(np.arange(len(a)), reps)
    excl = np.concatenate(([0], np.cumsum(reps)[:-1]))
    jj = np.arange(total) - np.repeat(excl, reps) + ii + 1
    return pd.DataFrame({"a": a[ii],
                         "pair": b[ii] * np.int64(1 << 31) + b[jj]})


def triangle_count(
    edges: "ray.data.Dataset",
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Exact triangle count of an undirected graph given as DISTINCT
    oriented edges ``(src, dst)`` with ``src < dst`` (int64 ids).

    The classic wedge-join plan (node-iterator with orientation —
    Suri & Vassilvitskii's MapReduce formulation): group edges by their
    LOW endpoint (one bucketed shuffle; a node's adjacency is confined
    to one bucket task), emit each wedge ``(b, c)`` with ``b < c`` from
    that node's sorted neighbor list, then count wedges that are
    themselves edges with ONE inner hash join on the packed pair key.
    Every triangle ``a<b<c`` is counted exactly once: as the wedge at
    its smallest vertex.

    Scale: wedge volume is ``Σ deg(v)²`` over LOW-endpoint degrees —
    the orientation bounds it by arboricity in power-law graphs (the
    reason this plan, not the naive one, is the published standard).
    The driver holds three scalars.  Pair packing assumes ids < 2^31
    (asserted) so the join key is one int64.
    """

    tagged = edges.map_batches(
        lambda b: _tag_low(b, num_buckets), batch_format="pyarrow",
        zero_copy_batch=True)

    def _wedges(df: pd.DataFrame) -> pd.DataFrame:
        return _bucket_wedges(df)[["pair"]]

    wedges = tagged.groupby("_bucket").map_groups(
        _wedges, batch_format="pandas")

    def _edge_keys(batch: pa.Table) -> pd.DataFrame:
        a = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame({"pair": a * np.int64(1 << 31) + b,
                             "_e": np.ones(len(a), dtype=np.int64)})

    ekeys = edges.map_batches(_edge_keys, batch_format="pyarrow",
                              zero_copy_batch=True)
    closed = hash_join(
        wedges, ekeys, on="pair", how="inner", num_buckets=num_buckets,
        schemas=(pa.schema([("pair", pa.int64())]),
                 pa.schema([("pair", pa.int64()), ("_e", pa.int64())])))
    n_tri = int(closed.count())
    n_edges = int(edges.count())
    n_nodes = int(_distinct_nodes(
        edges.select_columns(["src", "dst"]), num_buckets).count())
    return pd.DataFrame({"n_nodes": [np.int64(n_nodes)],
                         "n_edges": [np.int64(n_edges)],
                         "n_triangles": [np.int64(n_tri)]})


def node_clustering(
    edges: "ray.data.Dataset",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Per-node local clustering coefficient of an undirected graph
    given as DISTINCT oriented edges (src < dst, int64 ids):

        coeff(v) = 2·tri(v) / (deg(v)·(deg(v)−1)),  0.0 when deg < 2

    Same oriented wedge-join plan as :func:`triangle_count`, but the
    apex node rides along on every wedge, so each CLOSED wedge (a
    triangle a<b<c found exactly once) credits all three corners.
    Degree credits (one per endpoint per edge) UNION with the triangle
    credits into a single tagged stream, so degrees, per-node triangle
    counts and the would-be LEFT join all collapse into ONE bucketed
    sum combine — the whole operator is three shuffles (wedges, the
    pair join, the credit sum), each moving skinny int64 rows.  The
    float division is mirrored token-for-token by the SQL oracle.
    Driver holds nothing; output is O(nodes) skinny rows."""
    tagged = edges.map_batches(
        lambda b: _tag_low(b, num_buckets), batch_format="pyarrow",
        zero_copy_batch=True)
    wedges = tagged.groupby("_bucket").map_groups(
        _bucket_wedges, batch_format="pandas")

    def _edge_keys(batch: pa.Table) -> pd.DataFrame:
        a = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame({"pair": a * np.int64(1 << 31) + b,
                             "_e": np.ones(len(a), dtype=np.int64)})

    closed = hash_join(
        wedges,
        edges.map_batches(_edge_keys, batch_format="pyarrow",
                          zero_copy_batch=True),
        on="pair", how="inner", num_buckets=num_buckets,
        schemas=(pa.schema([("a", pa.int64()), ("pair", pa.int64())]),
                 pa.schema([("pair", pa.int64()), ("_e", pa.int64())])))

    def _tri_credits(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch["pair"].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = np.int64((1 << 31) - 1)
        node = np.concatenate([a, p >> 31, p & mask])
        return pa.table({"node": pa.array(node),
                         "d": pa.array(np.zeros(len(node), np.int64)),
                         "t": pa.array(np.ones(len(node), np.int64))})

    def _deg_credits(batch: pa.Table) -> pa.Table:
        a = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([a, b])
        return pa.table({"node": pa.array(node),
                         "d": pa.array(np.ones(len(node), np.int64)),
                         "t": pa.array(np.zeros(len(node), np.int64))})

    credits = edges.map_batches(
        _deg_credits, batch_format="pyarrow", zero_copy_batch=True
    ).union(closed.map_batches(_tri_credits, batch_format="pyarrow",
                               zero_copy_batch=True))
    stats = partial_agg(credits, ["node"], sums=["d", "t"],
                        num_buckets=num_buckets, combine="distributed")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "sum_d" not in df.columns:   # typed empty block
            return pd.DataFrame({
                "node": pd.Series([], dtype=np.int64),
                "degree": pd.Series([], dtype=np.int64),
                "triangles": pd.Series([], dtype=np.int64),
                "coeff": pd.Series([], dtype=np.float64)})
        d = df["sum_d"].to_numpy(np.int64)
        t = df["sum_t"].to_numpy(np.int64)
        # mirrored float tree: (2.0·tri) / (deg · (deg−1)), 0 if deg<2
        with np.errstate(divide="ignore", invalid="ignore"):
            c = ((2.0 * t.astype(np.float64))
                 / (d.astype(np.float64) * (d - 1).astype(np.float64)))
        return pd.DataFrame({"node": df["node"].astype(np.int64),
                             "degree": d, "triangles": t,
                             "coeff": np.where(d < 2, 0.0, c)})

    return stats.map_batches(_finish, batch_format="pandas")


def _peel_local(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """In-memory peel to the fixpoint (numpy loop) — used as the
    single-TASK finish once the surviving graph is small."""
    if df.empty or "src" not in df.columns:
        return pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                             "dst": pd.Series([], dtype=np.int64)})
    e = df[["src", "dst"]].to_numpy(np.int64)
    while len(e):
        nodes, cnt = np.unique(e.ravel(), return_counts=True)
        bad = nodes[cnt < k]
        if len(bad) == 0:
            break
        drop = np.isin(e[:, 0], bad) | np.isin(e[:, 1], bad)
        e = e[~drop]
    return pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]})


def k_core(
    edges: "ray.data.Dataset",
    k: int,
    num_buckets: int = 16,
    max_iter: int = 100,
    local_finish: int = 500_000,
) -> tuple["ray.data.Dataset", int, int]:
    """The k-core of an undirected graph (edges oriented ``src < dst``,
    distinct): iteratively peel nodes of degree < k until the fixpoint.

    Every distributed iteration is TABLE operations — one degree
    ``partial_agg`` over both endpoints, then two anti joins that drop
    edges touching a peeled node — so the driver only ever holds
    iteration counters (the peeled-node set itself stays distributed;
    no broadcast of anything O(nodes)).  Each round's edge table is
    materialized, the standard iterative-algorithm checkpoint (same
    pattern as :func:`pagerank`).

    Peeling's long tail is MANY nearly-empty rounds; with
    ``local_finish > 0`` (the DEFAULT — peeling frontiers collapse,
    so the single-task finish is the production path), once the
    surviving edge count drops under that threshold the fixpoint
    completes inside ONE Ray task (numpy loop over the whole remaining
    graph) — the standard big-rounds / small-finish split for
    fixpoints whose frontier collapses.  The driver still only sees
    counters.  ``local_finish=0`` keeps the peel fully distributed
    (tests pin round counts this way).

    If ``max_iter`` distributed rounds pass without convergence the
    peel is FORCED to the single-task finish (one extra round) rather
    than silently returning a non-fixpoint graph — e.g. a long path at
    k=2 peels ~2 nodes/round and would otherwise exhaust ``max_iter``
    with leftover middle edges presented as the "core".

    Returns ``(core_edges, n_rounds, n_core_nodes)`` where ``n_rounds``
    counts distributed rounds (+1 when the local finish engaged).
    """
    from .joins import hash_join

    def _finish_local(d: "ray.data.Dataset") -> "ray.data.Dataset":
        return (d.repartition(1)
                .map_batches(lambda df: _peel_local(df, k),
                             batch_format="pandas",
                             batch_size=None).materialize())

    e_sch = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    cur = edges.select_columns(["src", "dst"]).materialize()
    rounds = 0
    converged = False
    for _ in range(max_iter):
        if local_finish and int(cur.count()) <= local_finish:
            rounds += 1
            cur = _finish_local(cur)
            converged = True
            break
        rounds += 1

        def _ends(batch: pa.Table) -> pd.DataFrame:
            s = batch["src"].to_numpy(zero_copy_only=False)
            d = batch["dst"].to_numpy(zero_copy_only=False)
            return pd.DataFrame({
                "node": np.concatenate([s, d]).astype(np.int64)})

        deg = partial_agg(
            cur.map_batches(_ends, batch_format="pyarrow"),
            ["node"], count_col="deg", num_buckets=num_buckets
        ).materialize()
        bad = (deg.filter(expr=f"deg < {k}")
               .select_columns(["node"]).materialize())
        n_bad = int(bad.count())
        if n_bad == 0:
            converged = True
            break

        def _as(col):
            return bad.map_batches(
                lambda df, _c=col: pd.DataFrame(
                    {_c: df["node"].astype(np.int64)}),
                batch_format="pandas")

        b_src = pa.schema([("src", pa.int64())])
        b_dst = pa.schema([("dst", pa.int64())])
        # coalesce_blocks: without it each anti join multiplies the
        # edge table's block count every round and per-round cost
        # explodes geometrically (measured at sf0.01: anti joins
        # 1.7 s -> 6.1 s -> 43 s over three rounds; the same blow-up
        # pagerank's fused shuffle coalesces away)
        cur = hash_join(cur, _as("src"), on="src", how="anti",
                        num_buckets=num_buckets,
                        coalesce_blocks=num_buckets,
                        schemas=(e_sch, b_src))
        cur = hash_join(cur, _as("dst"), on="dst", how="anti",
                        num_buckets=num_buckets,
                        coalesce_blocks=num_buckets,
                        schemas=(e_sch, b_dst)).materialize()
    if not converged:
        # max_iter exhausted mid-peel: force the fixpoint in one task
        # instead of returning a non-core graph with no signal
        rounds += 1
        cur = _finish_local(cur)
    n_nodes = int(_distinct_nodes(cur, num_buckets).count())
    return cur, rounds, n_nodes


def bfs_hops(
    edges: "ray.data.Dataset",
    sources: "ray.data.Dataset",
    max_depth: int = 3,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Multi-source breadth-first hop distances over a DIRECTED
    ``(src, dst)`` edge table (symmetrize first for undirected
    graphs): returns ``(node:int64, depth:int64)`` for every node
    within ``max_depth`` hops of any source, at its shortest distance.

    Scale plan — synchronous frontier expansion as table ops, the
    Pregel/BSP pattern the PageRank loop already uses: per round, a
    SEMI hash-join keeps the edges leaving the frontier (one bucketed
    shuffle; the edge table never moves further), a skinny distinct
    fold dedupes candidate targets, and an ANTI hash-join against the
    visited table drops already-settled nodes — BFS's first visit IS
    the shortest hop count, so no min-reduction is needed.  Frontier
    and visited tables are materialized each round (the k_core lesson:
    unmaterialized per-round lineage re-executes geometrically) and
    stay in the object store; the driver holds one scalar per round
    (the frontier size, for the early exit on exhaustion)."""
    visited = sources.map_batches(
        lambda b: pa.table({
            "node": b["node"].cast(pa.int64()),
            "depth": pa.array([0] * len(b), pa.int64())}),
        batch_format="pyarrow").materialize()
    frontier = visited.select_columns(["node"]).materialize()

    for d in range(1, max_depth + 1):
        hits = hash_join(
            edges.map_batches(
                lambda b: pa.table({"node": b["src"].cast(pa.int64()),
                                    "dst": b["dst"].cast(pa.int64())}),
                batch_format="pyarrow"),
            frontier, on="node", how="semi", num_buckets=num_buckets,
            schemas=(pa.schema([("node", pa.int64()),
                                ("dst", pa.int64())]),
                     pa.schema([("node", pa.int64())])))
        cand = partial_agg(
            hits.map_batches(
                lambda b: pa.table({"node": b["dst"]}),
                batch_format="pyarrow"),
            ["node"], count_col="n", num_buckets=num_buckets,
        ).map_batches(lambda df: df[["node"]], batch_format="pandas")
        new = hash_join(
            cand, visited.select_columns(["node"]),
            on="node", how="anti", num_buckets=num_buckets,
            schemas=(pa.schema([("node", pa.int64())]),
                     pa.schema([("node", pa.int64())]))).materialize()
        if new.count() == 0:
            break
        new_d = new.map_batches(
            lambda b, d=d: pa.table({
                "node": b["node"],
                "depth": pa.array([d] * len(b), pa.int64())}),
            batch_format="pyarrow")
        visited = visited.union(new_d).materialize()
        frontier = new
    return visited

"""Web link-graph operators: anchor (href) extraction, host-level edge
aggregation, and integer-exact PageRank.

A crawl pipeline turns pages into a link graph (who links to whom) and
a static authority prior (PageRank, Brin & Page WWW'98) that rankers
blend with relevance scores. The reference engine
(/root/reference/src/main.py — a single-text-column SPIMI indexer) has
no graph stage; this module adds the standard web-scale one, shaped
for Ray Data:

- ``extract_links``: one vectorized kernel chain per batch
  (``split_pattern`` on ``<a href="`` → ``list_slice`` drops each
  page's preamble → ``list_flatten`` + ``list_parent_indices`` →
  one RE2 ``extract_regex`` up to the closing quote). No per-row
  Python, shuffle-free, html payload dropped at the batch boundary.
- ``extract_anchors`` / ``anchor_terms``: the same chain also
  capturing anchor TEXT, then term counts keyed by the TARGET host —
  the classic inbound-anchor relevance signal (anchor text describes
  the page it points to, Brin & Page WWW'98 §2.2). ONE keyed Count.
- ``host_edges``: two RE2 host extracts + ONE keyed Count aggregate
  over (src_host, dst_host) rows — host-PAIR cardinality is
  web-bounded (edges between hosts), not corpus-bounded (pages).
- ``pagerank``: the damped power iteration computed in INTEGER
  arithmetic (the lm.py/pmi quantization discipline): ranks are int64
  units of mass (``scale`` = rank 1.0), each edge's contribution is
  ``(d_pct * rank * weight) // (100 * outdeg)`` — a floor division —
  and each node's update is an integer sum, so the result is
  order-free, partitioning-independent, and value-exact reproducible
  by an unrolled DuckDB oracle. Each iteration is ONE hash join
  (ranks → edges on src_host) + ONE keyed sum (dst_host) — the same
  join+groupby round shape as clusters.py; the rank table is
  node-sized and stays distributed (never broadcast, never collected).

Dangling nodes (no out-edges) leak their damped mass by default —
the classic simplified variant (Page et al.'s "dangling links are
removed" preprocessing). ``redistribute_dangling=True`` switches to
the exact stochastic variant: each round, the total dangling rank D
(ONE tiny inner join of the rank table against the precomputed
dangling-node set + a scalar Sum fold — a 1-row driver sync, the
only driver-side value in the loop) is spread uniformly as
``(d_pct · D) // (100 · n_nodes)`` added to every node's base. The
round shape is unchanged: the dangling set is computed ONCE via a
left-anti join (nodes ∖ out-edge sources).

int64 headroom: a contribution computes ``d_pct · rank · weight``
before dividing; all products use Arrow *_checked kernels, so an
overflow raises loudly instead of wrapping. Total mass is bounded by
n_nodes · scale, so with the default ``scale=10^9`` even a single
host absorbing an entire 10^7-host graph's mass stays 100× inside
int64.
"""

from __future__ import annotations

import logging

import pyarrow as pa
import pyarrow.compute as pc

from .web import _HOST

_LOG = logging.getLogger(__name__)

_A_OPEN = '<a href="'
_HREF_BODY = r'^(?P<h>[^"]*)'


def extract_links_batch(batch: pa.Table, html_col: str = "html",
                        url_col: str = "url") -> pa.Table:
    """(url, html) batch → (url, href) rows, one per anchor tag, in
    document order. Pages with no anchors contribute no rows."""
    h = batch[html_col]
    if isinstance(h, pa.ChunkedArray):
        h = h.combine_chunks()
    s = h.cast(pa.string())  # payloads are utf-8 html
    # every list element AFTER the first begins right after an
    # `<a href="` occurrence; the href is its prefix up to `"`
    parts = pc.list_slice(pc.split_pattern(s, _A_OPEN), 1)
    flat = pc.list_flatten(parts)
    par = pc.list_parent_indices(parts)
    href = pc.struct_field(pc.extract_regex(flat, _HREF_BODY), "h")
    urls = batch[url_col]
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    return pa.table({"url": pc.take(urls, par), "href": href})


def extract_links(ds, html_col: str = "html", url_col: str = "url"):
    """→ Dataset (url, href): every anchor href in every page.
    Vectorized, shuffle-free; the html payload is dropped here, so
    downstream stages ship only the (short) url pairs."""
    return ds.map_batches(
        extract_links_batch,
        fn_kwargs={"html_col": html_col, "url_col": url_col},
        batch_format="pyarrow",
    )


_ANCHOR_BODY = r'^(?P<h>[^"]*)"[^>]*>(?P<t>[^<]*)'


def extract_anchors_batch(batch: pa.Table, html_col: str = "html",
                          url_col: str = "url") -> pa.Table:
    """(url, html) batch → (url, href, anchor) rows: like
    ``extract_links_batch`` but also capturing the anchor TEXT (up to
    the first ``<`` after the tag closes; attributes after the href
    are skipped). A malformed tag (quote never closed by ``>``)
    yields an empty anchor."""
    h = batch[html_col]
    if isinstance(h, pa.ChunkedArray):
        h = h.combine_chunks()
    s = h.cast(pa.string())
    parts = pc.list_slice(pc.split_pattern(s, _A_OPEN), 1)
    flat = pc.list_flatten(parts)
    par = pc.list_parent_indices(parts)
    m = pc.extract_regex(flat, _ANCHOR_BODY)
    # the two-group regex misses malformed tags entirely — recover the
    # href with the single-group pass and blank the anchor
    href = pc.coalesce(pc.struct_field(m, "h"),
                       pc.struct_field(pc.extract_regex(flat, _HREF_BODY),
                                       "h"))
    anchor = pc.coalesce(pc.struct_field(m, "t"), "")
    urls = batch[url_col]
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    return pa.table({"url": pc.take(urls, par), "href": href,
                     "anchor": anchor})


def extract_anchors(ds, html_col: str = "html", url_col: str = "url"):
    """→ Dataset (url, href, anchor): every anchor tag with its text.
    Vectorized, shuffle-free, payload dropped at the batch boundary."""
    return ds.map_batches(
        extract_anchors_batch,
        fn_kwargs={"html_col": html_col, "url_col": url_col},
        batch_format="pyarrow",
    )


def anchor_terms(anchors_ds):
    """(url, href, anchor) rows → Dataset (host, term, cnt): inbound
    anchor-text term counts keyed by the TARGET host — the classic web
    ranking signal (anchor text describes the page it points TO, often
    better than the page's own text; Brin & Page WWW'98 §2.2). Terms
    use the simple normalize chain (punct→space, lower, \\s+ split,
    len ≥ 2 — the analysis.py convention); non-http(s) targets are
    dropped. ONE keyed Count aggregate over (host, term) rows — the
    shuffle is term-occurrence-sized, never payload-sized."""
    from ray.data.aggregate import Count

    from .analysis import simple_tokens_flat

    def to_terms(b: pa.Table) -> pa.Table:
        host = _host_of(b["href"])
        a = b["anchor"]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        flat, parents = simple_tokens_flat(pc.coalesce(a, ""))
        t = pa.table({"host": pc.take(host, parents), "term": flat})
        return t.filter(pc.not_equal(t["host"], ""))

    agg = (anchors_ds.map_batches(to_terms, batch_format="pyarrow")
           .groupby(["host", "term"]).aggregate(Count()))
    return agg.map_batches(
        lambda b: pa.table({"host": b["host"], "term": b["term"],
                            "cnt": b["count()"].cast(pa.int64())}),
        batch_format="pyarrow")


def _host_of(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    m = pc.extract_regex(col, _HOST)
    return pc.utf8_lower(pc.coalesce(pc.struct_field(m, "h"), ""))


def host_edges(links_ds, drop_self: bool = True):
    """(url, href) links → Dataset (src_host, dst_host, weight):
    the host-level link graph, weight = number of page-level links.
    Non-http(s) hrefs (mailto:, relative paths) and — by default —
    host self-loops are dropped. ONE keyed Count aggregate; the
    shuffle rows are (src_host, dst_host) only."""
    from ray.data.aggregate import Count

    def to_hosts(b: pa.Table) -> pa.Table:
        t = pa.table({"src_host": _host_of(b["url"]),
                      "dst_host": _host_of(b["href"])})
        keep = pc.and_(pc.not_equal(t["src_host"], ""),
                       pc.not_equal(t["dst_host"], ""))
        if drop_self:
            keep = pc.and_(
                keep, pc.not_equal(t["src_host"], t["dst_host"]))
        return t.filter(keep)

    agg = (links_ds.map_batches(to_hosts, batch_format="pyarrow")
           .groupby(["src_host", "dst_host"]).aggregate(Count()))

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "src_host": b["src_host"],
            "dst_host": b["dst_host"],
            "weight": b["count()"].cast(pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def _contrib(b: pa.Table, damping_pct: int) -> pa.Array:
    """Per-edge integer contribution (d·rank·w) // (100·od) — Arrow
    checked kernels, so int64 overflow raises instead of wrapping."""
    rq = b["rq"].cast(pa.int64())
    w = b["weight"].cast(pa.int64())
    od = b["od"].cast(pa.int64())
    num = pc.multiply_checked(
        pc.multiply_checked(rq, w), pa.scalar(damping_pct, pa.int64()))
    den = pc.multiply_checked(od, pa.scalar(100, pa.int64()))
    # Arrow integer divide truncates; all operands are non-negative,
    # so truncation == floor — matching DuckDB's `//`
    out = pc.divide_checked(num, den)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def _col(b: pa.Table, name: str) -> pa.Array:
    c = b[name]
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def pagerank(edges_ds, iters: int = 3, damping_pct: int = 85,
             scale: int = 10 ** 9, num_partitions: int = 16,
             redistribute_dangling: bool = False):
    """(src_host, dst_host, weight) edges → Dataset (host, rank_q):
    ``iters`` rounds of the damped power iteration in int64 units
    (``scale`` = rank 1.0; every node starts at ``scale``).

    rank'(v) = ((100-d)·scale)//100 [+ (d·D)//(100·n) if redistributing]
               + Σ_{u→v} (d · rank(u) · w(u,v)) // (100 · outdeg_w(u))

    where D = Σ rank(u) over dangling u (no out-edges). All arithmetic
    is integer (floor divisions, integer sums), so the result is
    independent of partitioning, join order and summation order — and
    value-exact reproducible by an unrolled SQL oracle. Each round:
    one hash join + one keyed sum (+ one scalar dangling-mass fold
    when ``redistribute_dangling``); the rank table stays
    distributed."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if not (0 <= damping_pct <= 100):
        raise ValueError("damping_pct must be in [0, 100]")
    from ray.data.aggregate import Count, Sum

    edges = edges_ds.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        # an empty graph has no nodes — pin the typed-empty result
        # (the join path cannot key schemaless empty blocks)
        import ray.data

        return ray.data.from_arrow(pa.table({
            "host": pa.array([], pa.string()),
            "rank_q": pa.array([], pa.int64())}))
    # empty hash partitions produce schemaless blocks that break the
    # pyarrow join — size the partition count to the data (the
    # clusters.py guard)
    num_partitions = max(2, min(num_partitions, n_edges // 1000 + 2))

    outdeg = (edges.groupby("src_host")
              .aggregate(Sum("weight", alias_name="od"))
              .map_batches(lambda b: pa.table(
                  {"od_src": b["src_host"],
                   "od": b["od"].cast(pa.int64())}),
                  batch_format="pyarrow"))
    # outdegree attaches ONCE; every iteration reuses the joined edges.
    # repartition merges away schemaless empty join partitions, which
    # the NEXT join cannot key (the similarity.py round-2 gotcha)
    e = edges.join(
        outdeg, join_type="inner", num_partitions=num_partitions,
        on=("src_host",), right_on=("od_src",),
    ).repartition(num_partitions).materialize()

    nodes = (edges.map_batches(
        lambda b: pa.table({"node": pa.concat_arrays(
            [_col(b, "src_host"), _col(b, "dst_host")])}),
        batch_format="pyarrow")
        .groupby("node").aggregate(Count())
        .map_batches(lambda b: pa.table({"node": b["node"]}),
                     batch_format="pyarrow")
        .repartition(num_partitions).materialize())

    dang = None
    n_nodes = 0
    if redistribute_dangling:
        # nodes with no out-edges, computed ONCE (left-anti join);
        # empty is fine — the per-round fold then yields D = 0
        dang = nodes.join(
            outdeg.map_batches(
                lambda b: pa.table({"node": b["od_src"]}),
                batch_format="pyarrow"),
            join_type="left_anti", num_partitions=num_partitions,
            on=("node",),
        ).repartition(num_partitions).materialize()
        n_nodes = nodes.count()
        if dang.count() == 0:
            dang = None

    base = ((100 - damping_pct) * scale) // 100
    ranks = nodes.map_batches(
        lambda b, s=scale: pa.table({
            "node": b["node"],
            "rank_q": pa.array([s] * b.num_rows, pa.int64())}),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        base_r = base
        if dang is not None:
            # the round's ONLY driver sync: a 1-row scalar — total
            # rank mass parked on dangling nodes this round
            got = ranks.join(
                dang.map_batches(lambda b: pa.table(
                    {"dg_node": b["node"]}), batch_format="pyarrow"),
                join_type="inner", num_partitions=num_partitions,
                on=("node",), right_on=("dg_node",),
            ).aggregate(Sum("rank_q", alias_name="dm"))
            d_mass = int((got or {}).get("dm") or 0)
            base_r = base + (damping_pct * d_mass) // (100 * n_nodes)
        msgs = e.join(
            ranks.map_batches(lambda b: pa.table(
                {"r_node": b["node"], "rq": b["rank_q"]}),
                batch_format="pyarrow"),
            join_type="inner", num_partitions=num_partitions,
            on=("src_host",), right_on=("r_node",),
        ).map_batches(
            lambda b, d=damping_pct: pa.table({
                "node": b["dst_host"], "c": _contrib(b, d)}),
            batch_format="pyarrow",
        )
        # zero rows keep in-edge-less nodes present (they get `base`)
        zero = nodes.map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "c": pa.array([0] * b.num_rows, pa.int64())}),
            batch_format="pyarrow")
        ranks = (msgs.union(zero).groupby("node")
                 .aggregate(Sum("c", alias_name="s"))
                 .map_batches(lambda b, bb=base_r: pa.table({
                     "node": b["node"],
                     "rank_q": pc.add_checked(
                         b["s"].cast(pa.int64()),
                         pa.scalar(bb, pa.int64()))}),
                     batch_format="pyarrow")
                 .repartition(num_partitions).materialize())

    return ranks.map_batches(
        lambda b: pa.table({"host": b["node"], "rank_q": b["rank_q"]}),
        batch_format="pyarrow")


def personalized_pagerank(edges_ds, seeds: list[str], iters: int = 3,
                          damping_pct: int = 85, scale: int = 10 ** 9,
                          num_partitions: int = 16):
    """(src_host, dst_host, weight) edges → Dataset (host, rank_q):
    PageRank with restart at a SEED set (random walk with restart —
    the personalization of Page et al. '98 §6, and the TrustRank
    shape of Gyöngyi et al. VLDB'04 when the seeds are trusted
    hosts). Identical integer discipline to :func:`pagerank`:

        rank'(v) = [((100-d)·scale)//100 if v ∈ S else 0]
                   + Σ_{u→v} (d · rank(u) · w(u,v)) // (100 · od(u))

    with rank₀(v) = scale for v ∈ S else 0, so authority flows OUT of
    the seeds and decays with link distance — "related hosts to these
    seeds" rather than global importance. Dangling mass leaks (the
    simplified variant), matching ``pagerank``'s default.

    The seed set is a small driver-side list embedded in the batch
    closures (an ``is_in`` kernel per batch — no join, no broadcast
    table needed); everything else is the pagerank round shape: ONE
    hash join + ONE keyed sum per round, rank table never collected."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if not (0 <= damping_pct <= 100):
        raise ValueError("damping_pct must be in [0, 100]")
    if not seeds:
        raise ValueError("seeds must be a non-empty host list")
    from ray.data.aggregate import Count, Sum

    seed_arr = pa.array(sorted(set(seeds)), pa.string())
    edges = edges_ds.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "host": pa.array([], pa.string()),
            "rank_q": pa.array([], pa.int64())}))
    num_partitions = max(2, min(num_partitions, n_edges // 1000 + 2))

    outdeg = (edges.groupby("src_host")
              .aggregate(Sum("weight", alias_name="od"))
              .map_batches(lambda b: pa.table(
                  {"od_src": b["src_host"],
                   "od": b["od"].cast(pa.int64())}),
                  batch_format="pyarrow"))
    e = edges.join(
        outdeg, join_type="inner", num_partitions=num_partitions,
        on=("src_host",), right_on=("od_src",),
    ).repartition(num_partitions).materialize()

    nodes = (edges.map_batches(
        lambda b: pa.table({"node": pa.concat_arrays(
            [_col(b, "src_host"), _col(b, "dst_host")])}),
        batch_format="pyarrow")
        .groupby("node").aggregate(Count())
        .map_batches(lambda b: pa.table({"node": b["node"]}),
                     batch_format="pyarrow")
        .repartition(num_partitions).materialize())

    base = ((100 - damping_pct) * scale) // 100

    def seed_mass(b: pa.Table, amount: int) -> pa.Table:
        node = _col(b, "node")
        m = pc.if_else(pc.is_in(node, value_set=seed_arr),
                       pa.scalar(amount, pa.int64()),
                       pa.scalar(0, pa.int64()))
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        return pa.table({"node": node, "c": m})

    ranks = nodes.map_batches(
        seed_mass, fn_kwargs={"amount": scale},
        batch_format="pyarrow").map_batches(
        lambda b: pa.table({"node": b["node"], "rank_q": b["c"]}),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        msgs = e.join(
            ranks.map_batches(lambda b: pa.table(
                {"r_node": b["node"], "rq": b["rank_q"]}),
                batch_format="pyarrow"),
            join_type="inner", num_partitions=num_partitions,
            on=("src_host",), right_on=("r_node",),
        ).map_batches(
            lambda b, d=damping_pct: pa.table({
                "node": b["dst_host"], "c": _contrib(b, d)}),
            batch_format="pyarrow",
        )
        # the restart term doubles as the keep-every-node-present rows
        restart = nodes.map_batches(
            seed_mass, fn_kwargs={"amount": base},
            batch_format="pyarrow")
        ranks = (msgs.union(restart).groupby("node")
                 .aggregate(Sum("c", alias_name="rank_q"))
                 .map_batches(lambda b: pa.table({
                     "node": b["node"],
                     "rank_q": b["rank_q"].cast(pa.int64())}),
                     batch_format="pyarrow")
                 .repartition(num_partitions).materialize())

    return ranks.map_batches(
        lambda b: pa.table({"host": b["node"], "rank_q": b["rank_q"]}),
        batch_format="pyarrow")


def hits(edges_ds, iters: int = 2, scale: int = 10 ** 6,
         num_partitions: int = 16):
    """(src_host, dst_host, weight) edges → Dataset
    (host, auth_q, hub_q): Kleinberg's HITS (JACM 46(5), 1999) in
    integer arithmetic, sum-normalized.

    Per round (the mutual-reinforcement update):

        auth_raw(v) = Σ_{u→v} hub(u) · w(u,v)
        auth(v)     = (auth_raw(v) · scale) // Σ_x auth_raw(x)
        hub_raw(u)  = Σ_{u→v} auth(v) · w(u,v)     [the NEW auths]
        hub(u)      = (hub_raw(u) · scale) // Σ_x hub_raw(x)

    Sum-normalization replaces the usual L2 norm so every quantity is
    an int64 (integer sums + one floor division) — order-free,
    partitioning-independent, value-exact reproducible by an unrolled
    DuckDB oracle (the pagerank discipline). Each half-round is ONE
    hash join (scores → edges) + ONE keyed sum; the per-round driver
    sync is two 1-row scalar folds (the normalizers), same budget as
    PageRank's dangling-mass fold.

    int64 headroom: after normalization each score ≤ ``scale`` and the
    scores sum to ≈ ``scale``, so a raw value is ≤ scale · W (W = total
    edge weight) and the normalization multiply is ≤ scale² · W. All
    products use *_checked kernels — with the default ``scale = 10⁶``
    any graph with W < 9.2 × 10⁶ total weight is safe and a larger one
    raises loudly (lower ``scale`` to trade precision for headroom).

    A zero normalizer (no edges, or all mass annihilated) zeroes that
    side's scores rather than dividing by zero."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    from ray.data.aggregate import Count, Sum

    edges = edges_ds.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "host": pa.array([], pa.string()),
            "auth_q": pa.array([], pa.int64()),
            "hub_q": pa.array([], pa.int64())}))
    num_partitions = max(2, min(num_partitions, n_edges // 1000 + 2))

    nodes = (edges.map_batches(
        lambda b: pa.table({"node": pa.concat_arrays(
            [_col(b, "src_host"), _col(b, "dst_host")])}),
        batch_format="pyarrow")
        .groupby("node").aggregate(Count())
        .map_batches(lambda b: pa.table({"node": b["node"]}),
                     batch_format="pyarrow")
        .repartition(num_partitions).materialize())

    def _init(col: str):
        return nodes.map_batches(
            lambda b, s=scale, c=col: pa.table({
                "node": b["node"],
                c: pa.array([s] * b.num_rows, pa.int64())}),
            batch_format="pyarrow").materialize()

    def _half_round(scores, score_col: str, join_on: str, emit: str,
                    out_col: str):
        """scores(node, score_col) → normalized (node, out_col): join
        scores onto the ``join_on`` endpoint of every edge, sum
        score·w into the ``emit`` endpoint, sum-normalize to scale."""
        def msg(b: pa.Table, e=emit) -> pa.Table:
            c = pc.multiply_checked(b["sq"].cast(pa.int64()),
                                    b["weight"].cast(pa.int64()))
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            return pa.table({"node": _col(b, e), "c": c})

        raw = edges.join(
            scores.map_batches(
                lambda b, c=score_col: pa.table(
                    {"j_node": b["node"], "sq": b[c]}),
                batch_format="pyarrow"),
            join_type="inner", num_partitions=num_partitions,
            on=(join_on,), right_on=("j_node",),
        ).map_batches(msg, batch_format="pyarrow")
        zero = nodes.map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "c": pa.array([0] * b.num_rows, pa.int64())}),
            batch_format="pyarrow")
        summed = (raw.union(zero).groupby("node")
                  .aggregate(Sum("c", alias_name="raw"))
                  .repartition(num_partitions).materialize())
        # the half-round's only driver sync: the 1-row normalizer
        got = summed.aggregate(Sum("raw", alias_name="norm"))
        norm = int((got or {}).get("norm") or 0)
        return summed.map_batches(
            lambda b, s=scale, nz=norm, c=out_col: pa.table({
                "node": b["node"],
                c: pc.divide_checked(
                    pc.multiply_checked(b["raw"].cast(pa.int64()),
                                        pa.scalar(s, pa.int64())),
                    pa.scalar(nz, pa.int64()))
                if nz else pa.array([0] * b.num_rows, pa.int64())}),
            batch_format="pyarrow").materialize()

    auths = _init("auth_q")
    hubs = _init("hub_q")
    for _ in range(iters):
        auths = _half_round(hubs, "hub_q", "src_host", "dst_host",
                            "auth_q")
        hubs = _half_round(auths, "auth_q", "dst_host", "src_host",
                           "hub_q")

    return auths.join(
        hubs.map_batches(
            lambda b: pa.table({"h_node": b["node"], "hub_q": b["hub_q"]}),
            batch_format="pyarrow"),
        join_type="inner", num_partitions=num_partitions,
        on=("node",), right_on=("h_node",),
    ).map_batches(
        lambda b: pa.table({"host": b["node"], "auth_q": b["auth_q"],
                            "hub_q": b["hub_q"]}),
        batch_format="pyarrow")


def _cocite_pairs_batch(batch: pa.Table, key_col: str, val_col: str,
                        max_fanout: int = 1000) -> pa.Table:
    """One range-sorted block of (key, val) rows → upper-triangle val
    pairs per key, vectorized (the dedup.py sorted-block pairer shape,
    over string vals). Requires every key's rows to live entirely in
    this block — guaranteed by a range-partitioned ``Dataset.sort`` on
    ``key_col`` (identical keys never straddle a boundary). Pairs are
    ordered ``val_a < val_b`` lexicographically (SQL-oracle parity).

    Keys with more than ``max_fanout`` distinct vals are truncated to
    their lexicographically-smallest vals — NOT silently: a warning
    reports the cap count and every pair from a capped key carries
    ``trunc=1`` (the LSH bucket-cap discipline)."""
    import numpy as np

    empty = pa.table({
        "a": pa.array([], pa.string()),
        "b": pa.array([], pa.string()),
        "trunc": pa.array([], pa.int64()),
    })
    if batch.num_rows == 0:
        return empty
    t = batch.take(pc.sort_indices(
        batch, sort_keys=[(key_col, "ascending"), (val_col, "ascending")]))
    keys = t[key_col].combine_chunks()
    vals = t[val_col].combine_chunks()
    n = len(keys)
    if n > 1:
        key_new = pc.not_equal(keys.slice(1), keys.slice(0, n - 1))
        val_new = pc.not_equal(vals.slice(1), vals.slice(0, n - 1))
        fresh = np.concatenate(
            ([True], pc.or_(key_new, val_new).to_numpy(
                zero_copy_only=False)))
    else:
        fresh = np.array([True])
    # drop duplicate (key, val) rows so each pair counts one key once
    keep_idx = np.flatnonzero(fresh)
    keys_np = keys.take(pa.array(keep_idx)).to_numpy(zero_copy_only=False)
    vals_kept = vals.take(pa.array(keep_idx))
    m0 = keys_np.size
    new_key = np.empty(m0, dtype=bool)
    new_key[0] = True
    new_key[1:] = keys_np[1:] != keys_np[:-1]
    gid = np.cumsum(new_key) - 1
    counts = np.bincount(gid)
    gstart0 = np.concatenate(([0], np.cumsum(counts)))
    over = counts > max_fanout
    if over.any():
        _LOG.warning(
            "cocitation fan-out cap: %d keys over max_fanout=%d, "
            "%d member rows dropped (kept lexicographically smallest)",
            int(over.sum()), max_fanout,
            int((counts[over] - max_fanout).sum()))
        pos = np.arange(m0) - gstart0[:-1][gid]
        keep = pos < max_fanout
        gid = gid[keep]
        vals_kept = vals_kept.take(pa.array(np.flatnonzero(keep)))
        counts = np.minimum(counts, max_fanout)
    m = counts.astype(np.int64)
    npairs = m * (m - 1) // 2
    total = int(npairs.sum())
    if total == 0:
        return empty
    pg = np.repeat(np.arange(m.size), npairs)
    offs = np.concatenate(([0], np.cumsum(npairs)))
    k = np.arange(total, dtype=np.int64) - offs[pg]
    mm = m[pg]
    tt = 2 * mm - 1
    i = ((tt - np.sqrt(tt.astype(np.float64) ** 2 - 8 * k)) // 2).astype(
        np.int64)
    j = k - i * (tt - i) // 2 + i + 1
    gstart = np.concatenate(([0], np.cumsum(m)))
    return pa.table({
        "a": vals_kept.take(pa.array(gstart[pg] + i)),
        "b": vals_kept.take(pa.array(gstart[pg] + j)),
        "trunc": pa.array(over[pg].astype(np.int64), pa.int64()),
    })


def cocitation(edges_ds, mode: str = "cocited", max_fanout: int = 1000,
               min_common: int = 1):
    """(src_host, dst_host, weight) edges → Dataset
    (host_a, host_b, n_common, truncated): link-graph similarity by
    shared neighbors (Small, JASIS 24(4) 1973; Kessler 1963).

    - ``mode="cocited"``: n_common = number of distinct hosts linking
      to BOTH a and b (co-citation — similarity of link TARGETS).
    - ``mode="coupled"``: n_common = number of distinct hosts that
      both a and b link TO (bibliographic coupling — similarity of
      link SOURCES).

    Shape: ONE range sort on the shared-neighbor key co-locates each
    key's adjacency, a vectorized block pairer expands upper-triangle
    (host_a < host_b) pairs, ONE keyed Count+Min folds them — pair
    count is bounded by Σ fanout², so skewed hubs are capped at
    ``max_fanout`` with a loud warning and a ``truncated`` flag that
    survives aggregation (true only if EVERY contributing key was
    capped — the dedup.py distinct_pairs rule, which here degrades the
    COUNT, so any true flag means n_common is a lower bound)."""
    if mode not in ("cocited", "coupled"):
        raise ValueError(f"unknown mode {mode!r}")
    from ray.data.aggregate import Count, Min

    key, val = (("src_host", "dst_host") if mode == "cocited"
                else ("dst_host", "src_host"))

    pairs = edges_ds.select_columns([key, val]).sort(key).map_batches(
        _cocite_pairs_batch,
        fn_kwargs={"key_col": key, "val_col": val,
                   "max_fanout": max_fanout},
        batch_format="pyarrow")
    agg = pairs.groupby(["a", "b"]).aggregate(
        Count(), Min("trunc", alias_name="trunc"))

    def fin(b: pa.Table) -> pa.Table:
        t = pa.table({
            "host_a": b["a"],
            "host_b": b["b"],
            "n_common": b["count()"].cast(pa.int64()),
            "truncated": pc.cast(
                pc.greater(b["trunc"].cast(pa.int64()), 0), pa.bool_()),
        })
        if min_common > 1:
            t = t.filter(pc.greater_equal(
                t["n_common"], pa.scalar(min_common, pa.int64())))
        return t

    return agg.map_batches(fin, batch_format="pyarrow")


def host_components(edges_ds, num_partitions: int = 16):
    """(src_host, dst_host, weight) edges → Dataset
    (host, component): connected components of the UNDIRECTED host
    graph — site-cluster discovery (mirror networks, link farms,
    multi-host properties). Hosts are keyed by their FNV-1a hash (the
    corpus-wide integer id discipline) so the label propagation runs
    on int64; ``component`` = the component's minimum host-hash —
    deterministic and partitioning-independent, reproducible in SQL
    via the same fnv_expr. ONE reuse of clusters.dup_clusters
    (min-label + pointer jumping, O(log diameter) rounds) + one hash
    join back to host strings."""
    from .dedup import _hash_tokens
    from .clusters import dup_clusters

    edges = edges_ds.materialize()
    if edges.count() == 0:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "host": pa.array([], pa.string()),
            "component": pa.array([], pa.int64())}))

    def to_pairs(b: pa.Table) -> pa.Table:
        import numpy as np

        s = _col(b, "src_host")
        d = _col(b, "dst_host")
        # int64 view of the uint64 FNV (the vectorize.py convention)
        ha = _hash_tokens(s).view(np.int64)
        hb = _hash_tokens(d).view(np.int64)
        return pa.table({"doc_a": pa.array(ha, pa.int64()),
                         "doc_b": pa.array(hb, pa.int64())})

    # repartition merges away any schemaless empty blocks a groupby-
    # produced edge dataset carries — dup_clusters' first join cannot
    # key them (the pagerank guard)
    pairs = (edges.map_batches(to_pairs, batch_format="pyarrow")
             .repartition(max(2, min(num_partitions,
                                     edges.count() // 1000 + 2))))
    labels = dup_clusters(pairs, num_partitions=num_partitions)

    def names(b: pa.Table) -> pa.Table:
        import numpy as np

        nodes = pa.concat_arrays(
            [_col(b, "src_host"), _col(b, "dst_host")])
        h = _hash_tokens(nodes).view(np.int64)
        return pa.table({"hid": pa.array(h, pa.int64()),
                         "host": nodes})

    from ray.data.aggregate import Min

    mapping = (edges.map_batches(names, batch_format="pyarrow")
               .groupby("hid").aggregate(Min("host", alias_name="host"))
               .repartition(num_partitions))
    return labels.join(
        mapping, join_type="inner", num_partitions=num_partitions,
        on=("doc_id",), right_on=("hid",),
    ).map_batches(
        lambda b: pa.table({"host": b["host"],
                            "component": b["cluster"].cast(pa.int64())}),
        batch_format="pyarrow")

"""Near-dup cluster resolution: verified pair lists → connected components
→ keeper assignment.

Every near-dup op in this suite (minhash / simhash / ngram-jaccard /
embedding) stops at a verified PAIR list; a training-data pipeline needs the
transitive closure of those pairs — "which rows do I drop" — mirroring
``exact_dedup``'s min-keeper rule (reference analog: the options-hash dedup
in docling-serve's ``docling_conversion.py`` is per-key exact only; the
transitive step has no reference counterpart and is this suite's own rung).

Algorithm — distributed min-label propagation with pointer doubling (no
driver-side union-find, no whole-graph materialization):

- State is a (node, label) Dataset; labels start as the node's own id and
  only ever decrease, always holding some node id of the same component.
- Each round runs two bucketed grouped reduces (ops/shuffle.bucketed_group_agg
  — hash-partitioned, vectorized pandas per bucket):
    1. *edge propagation*: group (label rows ∪ both-direction edge rows) by
       node; the group min label is pushed to every neighbor, and each node
       keeps the min of what it receives (classic hash-join label
       propagation — one hop per round).
    2. *pointer doubling*: relabel every node by label(label(node)) via a
       single grouped reduce keyed on the label value (every label IS a node
       id, so its row is in the same group). This halves chain depth, giving
       O(log diameter) rounds overall instead of O(diameter).
- Convergence is detected with a scalar ``sum("changed")`` (the only value
  that ever reaches the driver); each round's label table is materialized so
  the iterative lineage stays one round deep.

Scale shape at 10^12 docs: the label table holds only nodes that appear in
at least one verified pair (two int64s per row); edges are the verified pair
list (already thin). Both shuffle by hashed node id through bounded buckets;
per-round cost is two thin all-to-alls over pair-ish-sized data, and round
count is logarithmic in the largest cluster's diameter (real near-dup
clusters are near-cliques, so 1-2 rounds in practice).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

_I64MAX = np.iinfo(np.int64).max


def _edge_rows(
    pairs: ray.data.Dataset, a_col: str, b_col: str
) -> ray.data.Dataset:
    """Verified (a, b) pairs → both-direction (src, dst) edge rows."""

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        a = b[a_col].astype("int64")
        bb = b[b_col].astype("int64")
        return pd.DataFrame(
            {
                "src": pd.concat([a, bb], ignore_index=True),
                "dst": pd.concat([bb, a], ignore_index=True),
            }
        )

    return pairs.map_batches(explode, batch_format="pandas")


def _initial_labels(
    edges: ray.data.Dataset, num_buckets: int
) -> ray.data.Dataset:
    """Distinct nodes of the edge list, labelled with their own id."""
    from .shuffle import bucketed_group_agg

    nodes = edges.map_batches(
        lambda b: pd.DataFrame({"node": b["src"].astype("int64")}),
        batch_format="pandas",
    )
    return bucketed_group_agg(
        nodes,
        ["node"],
        lambda g: g.drop_duplicates("node").assign(label=lambda d: d["node"]),
        partial_fn=lambda b: b.drop_duplicates("node"),
        num_buckets=num_buckets,
    )


def _propagate_round(
    labels: ray.data.Dataset, edges: ray.data.Dataset, num_buckets: int
) -> ray.data.Dataset:
    """One edge-propagation round → (node, label, changed) rows.

    Sentinels keep the union schema flat (all int64): label rows carry
    dst = -1; edge rows carry lab = INT64MAX (node ids are non-negative, so
    neither collides with data)."""
    from .shuffle import bucketed_group_agg

    lab_rows = labels.map_batches(
        lambda b: pd.DataFrame(
            {
                "key": b["node"].astype("int64"),
                "dst": np.int64(-1),
                "lab": b["label"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    edge_rows = edges.map_batches(
        lambda b: pd.DataFrame(
            {
                "key": b["src"].astype("int64"),
                "dst": b["dst"].astype("int64"),
                "lab": np.int64(_I64MAX),
            }
        ),
        batch_format="pandas",
    )

    def push_min(g: pd.DataFrame) -> pd.DataFrame:
        # group min over 'lab' is each key's current label (exactly one
        # label row per key); broadcast it to every neighbor of the key
        m = g.groupby("key")["lab"].transform("min")
        is_self = g["dst"].to_numpy() < 0
        return pd.DataFrame(
            {
                "node": np.where(is_self, g["key"], g["dst"]),
                "cand": m.to_numpy(),
                # only the self row remembers the old label (for 'changed')
                "old": np.where(is_self, g["lab"], np.int64(_I64MAX)),
            }
        )

    cands = bucketed_group_agg(
        lab_rows.union(edge_rows), ["key"], push_min, num_buckets=num_buckets
    )

    def take_min(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False).agg(
            label=("cand", "min"), old=("old", "min")
        )
        return pd.DataFrame(
            {
                "node": out["node"].astype("int64"),
                "label": out["label"].astype("int64"),
                "changed": (out["label"] != out["old"]).astype("int64"),
            }
        )

    return bucketed_group_agg(cands, ["node"], take_min, num_buckets=num_buckets)


def _pointer_double(
    labels: ray.data.Dataset, num_buckets: int
) -> ray.data.Dataset:
    """(node, label) → (node, label(label(node))) in ONE grouped reduce.

    Every label value is itself a node id (labels start as ids and move only
    by min over existing labels), so grouping request rows keyed on the
    label value co-locates them with that node's own label row."""
    from .shuffle import bucketed_group_agg

    def split(b: pd.DataFrame) -> pd.DataFrame:
        node = b["node"].astype("int64")
        label = b["label"].astype("int64")
        # request row: "node asks for label(label(node))" + self row that
        # answers "label(key)" for key == node
        return pd.DataFrame(
            {
                "key": pd.concat([label, node], ignore_index=True),
                "req": pd.concat(
                    [node, pd.Series(np.int64(-1), index=node.index)],
                    ignore_index=True,
                ),
                "lab": pd.concat(
                    [pd.Series(np.int64(_I64MAX), index=node.index), label],
                    ignore_index=True,
                ),
            }
        )

    def answer(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("key")["lab"].transform("min")  # label(key)
        req = g["req"].to_numpy() >= 0
        return pd.DataFrame(
            {
                "node": g["req"].to_numpy()[req],
                "label": m.to_numpy()[req],
            }
        )

    rows = labels.map_batches(split, batch_format="pandas")
    return bucketed_group_agg(rows, ["key"], answer, num_buckets=num_buckets)


def connected_components(
    pairs: ray.data.Dataset,
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    num_buckets: int = 64,
    max_rounds: int = 30,
) -> ray.data.Dataset:
    """Pair list → (doc_id, cluster_id, is_keeper) for every doc appearing
    in at least one pair. cluster_id = min doc_id of the component (the
    keeper, mirroring exact_dedup's rule); is_keeper is int64 0/1.

    max_rounds bounds the propagate+double loop; with doubling the label
    depth at round r covers chains of length ~2^r, so 30 rounds handle any
    graph this side of 10^9-long chains. Raises if not converged (never
    silently emits partial closures)."""
    edges = _edge_rows(pairs, a_col, b_col).materialize()
    labels = _initial_labels(edges, num_buckets).materialize()

    # Conditional block-count pin: Ray's sort-shuffle map_groups emits one
    # block per INPUT block and each round unions the edge blocks back in,
    # so block count grows ~2·num_buckets per round and driver scheduling
    # overhead (per block) compounds across rounds (the pagerank lesson —
    # 6.7 → 49.9 s/iter there). Near-dup graphs converge in 1-2 rounds
    # where an unconditional repartition per round costs MORE than it saves
    # (measured: neardup_clusters 7.3 → 15.3 s at sf0.1), so the pin fires
    # only once the materialized table actually exceeds 4× the bucket
    # count — long-chain graphs stay bounded, short ones pay nothing.
    def _pin(ds: ray.data.Dataset) -> ray.data.Dataset:
        m = ds.materialize()
        if m.num_blocks() > 4 * num_buckets:
            m = m.repartition(num_buckets).materialize()
        return m

    for _ in range(max_rounds):
        stepped = _pin(_propagate_round(labels, edges, num_buckets))
        changed = stepped.sum("changed")
        labels = stepped.drop_columns(["changed"])
        if not changed:
            break
        labels = _pin(_pointer_double(labels, num_buckets))
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["node"].astype("int64"),
                "cluster_id": b["label"].astype("int64"),
                "is_keeper": (b["node"] == b["label"]).astype("int64"),
            }
        )

    return labels.map_batches(finalize, batch_format="pandas")


# ---------------------------------------------------------------------------
# neardup_clusters query: minhash-verified pairs → components → keepers
# ---------------------------------------------------------------------------

# Transitive closure of the exact-Jaccard >= 0.7 pair set (the minhash op's
# verified output — LSH-parameter-independent, see ops/dedup.py) via a
# recursive CTE: reach(node, r) holds every (node, reachable id); the
# component id is the min reachable id. Clusters in the augmented test
# corpus are tiny (pairs/triples), so closure cardinality stays trivial.
NEARDUP_CLUSTERS_SQL = """
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM (
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 2000000, text || ' extra token appended'
      FROM documents WHERE doc_id % 10 = 0
    ),
    w AS (SELECT doc_id, string_split(text, ' ') AS words FROM aug),
    sh AS (
      SELECT DISTINCT doc_id,
             words[i+1] || ' ' || words[i+2] || ' ' || words[i+3] AS shingle
      FROM w, LATERAL (SELECT UNNEST(generate_series(0, len(words)-3)) AS i)
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_n
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b
    FROM inter
    JOIN cnt ca ON ca.doc_id = inter.doc_a
    JOIN cnt cb ON cb.doc_id = inter.doc_b
    WHERE inter_n * 1.0 / (ca.n + cb.n - inter_n) >= 0.7
  )
),
e AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT a AS node FROM e),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.node
)
SELECT node AS doc_id,
       MIN(r) AS cluster_id,
       CAST(CASE WHEN node = MIN(r) THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
FROM reach GROUP BY node
"""


def neardup_clusters(sf_dir: str) -> ray.data.Dataset:
    """The 'rows to drop' deliverable: minhash-verified near-dup pairs →
    distributed connected components → (doc_id, cluster_id, is_keeper).
    Drop set = rows with is_keeper = 0."""
    from .dedup import minhash_dedup
    from .shuffle import input_bytes_estimate, scaled_num_buckets

    pairs = minhash_dedup(sf_dir).select_columns(["doc_a", "doc_b"])
    # pair volume scales with the corpus (dup rate × size): byte-scale the
    # component buckets off the input rather than the fixed default
    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/documents.parquet"))
    return connected_components(pairs, num_buckets=nb)


# ---------------------------------------------------------------------------
# embedding_clusters query: embedding-LSH-verified pairs → components
# ---------------------------------------------------------------------------

# Same transitive-closure shape as NEARDUP_CLUSTERS_SQL, over the
# exact-cosine >= 0.99 pair set of the copy-augmented embeddings table
# (LSH-parameter-independent, see ops/similarity.embedding_neardup).
EMBEDDING_CLUSTERS_SQL = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS pa, b.vec_id AS pb
  FROM (SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 10 = 0) a,
       (SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 10 = 0) b
  WHERE a.vec_id < b.vec_id
    AND list_cosine_similarity(a.embedding, b.embedding) >= 0.99
),
e AS (
  SELECT pa AS a, pb AS b FROM pairs
  UNION
  SELECT pb, pa FROM pairs
),
nodes AS (SELECT DISTINCT a AS node FROM e),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.node
)
SELECT node AS vec_id,
       MIN(r) AS cluster_id,
       CAST(CASE WHEN node = MIN(r) THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
FROM reach GROUP BY node
"""


def embedding_clusters(sf_dir: str) -> ray.data.Dataset:
    """Cluster resolution over the embedding near-dup pair set — the same
    connected-components + min-keeper step neardup_clusters applies to
    minhash pairs (the pairs→drop-set rung for EVERY pair-emitting dedup
    op; connected_components is column-agnostic)."""
    from .similarity import embedding_neardup
    from .shuffle import input_bytes_estimate, scaled_num_buckets

    pairs = embedding_neardup(sf_dir)
    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/embeddings.parquet"))
    out = connected_components(
        pairs, a_col="vec_a", b_col="vec_b", num_buckets=nb
    )
    return out.map_batches(
        lambda b: b.rename(columns={"doc_id": "vec_id"}), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# dup_cluster_sizes query: component size distribution
# ---------------------------------------------------------------------------

DUP_CLUSTER_SIZES_SQL = f"""
WITH comp AS ({NEARDUP_CLUSTERS_SQL}),
s AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
  FROM comp GROUP BY cluster_id
)
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM s GROUP BY cluster_size
"""


def dup_cluster_sizes(sf_dir: str) -> ray.data.Dataset:
    """Near-dup cluster-size distribution (cluster_size → n_clusters) —
    the audit a dedup run publishes to spot pathological super-clusters
    (boilerplate explosions show up as one giant component). Composes
    neardup_clusters; per-batch value_counts of cluster_id combine first,
    then one bucketed reduce by cluster_id sums the partials into sizes,
    and a final tiny reduce over the size domain (bounded by the largest
    cluster, not the corpus) emits the histogram."""
    from .shuffle import (
        bucketed_group_agg,
        histogram_merge,
        input_bytes_estimate,
        scaled_num_buckets,
    )

    comp = neardup_clusters(sf_dir)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = b["cluster_id"].value_counts()
        return pd.DataFrame(
            {"cluster_id": h.index.to_numpy().astype("int64"),
             "n": h.to_numpy().astype("int64")}
        )

    nb = scaled_num_buckets(input_bytes_estimate(f"{sf_dir}/documents.parquet"))

    def sizes(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("cluster_id")["n"].sum()
        h = t.value_counts()
        return pd.DataFrame(
            {"cluster_size": h.index.to_numpy().astype("int64"),
             "n_clusters": h.to_numpy().astype("int64")}
        )

    partial_hist = bucketed_group_agg(
        comp.map_batches(partial, batch_format="pandas"),
        ["cluster_id"], sizes, num_buckets=nb,
    )

    return histogram_merge(partial_hist, "cluster_size", "n_clusters")


# --- PageRank (iterative graph algorithm, exact fixed-point integers) -------------
#
# The iterative-algorithm family's graph member (kmeans is the vector one):
# power iteration over the customer→supplier interaction graph derived from
# the fact tables. All arithmetic is int64 fixed-point (SCALE = 10^12,
# damping 85/100, floor division at every step), so numpy and DuckDB compute
# bit-identical ranks — no float summation-order hazard. Rank rule per
# iteration (a deliberate, exactly-specified variant of PageRank):
#
#   share(u→v) = (rank(u) * 85) // (100 * outdeg(u))
#   rank'(v)   = (SCALE * 15) // (100 * N)  +  Σ_{u→v} share(u→v)
#
# Scale shape: the rank frontier is a (node, val) int64 Dataset — the ONLY
# state carried across iterations, materialized once per round to keep the
# lineage one round deep (16 bytes/node; the graph itself is streamed, never
# driver-resident). Each iteration is two bucketed thin shuffles: ranks ⋈
# edges on src (complete src groups per bucket → vectorized merge), then a
# per-dst partial-sum reduce. The driver holds two integers (N, BASE).

PAGERANK_SCALE = 10**12
PAGERANK_ITERS = 5
PAGERANK_SUPP_OFFSET = 10_000_000  # supplier node ids, disjoint from custkeys


def _pagerank_sql() -> str:
    head = f"""
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + {PAGERANK_SUPP_OFFSET} AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
n AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM nodes),
r0 AS (SELECT node, {PAGERANK_SCALE} // (SELECT cnt FROM n) AS val FROM nodes)"""
    its = []
    for i in range(1, PAGERANK_ITERS + 1):
        its.append(f""",
r{i} AS (
  SELECT nd.node,
         ({PAGERANK_SCALE} * 15) // (100 * (SELECT cnt FROM n))
         + COALESCE(SUM((r.val * 85) // (100 * d.deg)), 0) AS val
  FROM nodes nd
  LEFT JOIN edges e ON e.dst = nd.node
  LEFT JOIN r{i - 1} r ON r.node = e.src
  LEFT JOIN outdeg d ON d.src = e.src
  GROUP BY nd.node
)""")
    return (
        head
        + "".join(its)
        + f"\nSELECT node, CAST(val AS BIGINT) AS rank_fp FROM r{PAGERANK_ITERS}"
    )


PAGERANK_SQL = _pagerank_sql()


PAGERANK_LOCAL_MAX_BYTES = 128 * 1024 * 1024  # ≈5M edges × 24 B


def pagerank(
    sf_dir: str, *, local_max_bytes: int = PAGERANK_LOCAL_MAX_BYTES
) -> ray.data.Dataset:
    """Distributed PageRank (5 fixed iterations, damping 0.85, exact int64
    fixed-point) over the bipartite customer→supplier graph: an edge per
    distinct (customer, supplier) trading pair, derived from lineitem ⋈
    orders. Returns (node, rank_fp); supplier nodes are offset by
    PAGERANK_SUPP_OFFSET.

    Adaptive execution (the suite's standard size gate): edge DERIVATION —
    the fact-table-scale work — is always distributed; the power iteration
    itself runs driver-local in exact int64 numpy (np.add.at, identical
    floor arithmetic) when the deduped edge list fits ``local_max_bytes``,
    because ten bucketed-shuffle stages of fixed per-stage overhead swamp
    a sub-128 MB frontier (measured: 33 s → the edge-derivation cost alone
    at sf0.1). Past the gate the distributed loop runs — two thin bucketed
    shuffles per iteration over a (node, val) frontier materialized once
    per round; the driver never holds more than the O(40)-int profile."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    li_path = f"{sf_dir}/lineitem.parquet"
    ord_path = f"{sf_dir}/orders.parquet"
    nb = scaled_num_buckets(input_bytes_estimate(li_path, ord_path))

    # -- edges: bucketed orderkey co-group, then exact pair dedup ------------
    orders = ray.data.read_parquet(
        ord_path, columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {"key": b["o_orderkey"].astype("int64"),
             "val": b["o_custkey"].astype("int64"), "_t": np.int64(0)}
        ),
        batch_format="pandas",
    )
    lines = ray.data.read_parquet(
        li_path, columns=["l_orderkey", "l_suppkey"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {"key": b["l_orderkey"].astype("int64"),
             "val": b["l_suppkey"].astype("int64"), "_t": np.int64(1)}
        ).drop_duplicates(),
        batch_format="pandas",
    )

    def pair_up(g: pd.DataFrame) -> pd.DataFrame:
        cust = g.loc[g["_t"] == 0].set_index("key")["val"]
        e = g.loc[g["_t"] == 1]
        src = e["key"].map(cust)
        out = pd.DataFrame(
            {
                "src": src.astype("int64"),
                "dst": (e["val"] + PAGERANK_SUPP_OFFSET).astype("int64"),
            }
        ).drop_duplicates()
        return out

    pairs = bucketed_group_agg(
        orders.union(lines), ["key"], pair_up, num_buckets=nb
    )

    # Exact pair dedup AND outdeg in ONE src-bucketed reduce: all rows of a
    # given src land in one bucket, so a local drop_duplicates on the pair
    # IS the global distinct, and the per-src transform("size") right after
    # IS the exact outdegree. (Skew bound: a src's group is capped by the
    # supplier domain.) Standing datasets are repartitioned to nb_iter
    # blocks — per-stage driver overhead is per-block, and the iteration
    # loop touches these every round.
    nb_iter = max(16, nb // 4)

    def dedup_and_deg(g: pd.DataFrame) -> pd.DataFrame:
        p = g.drop_duplicates(["src", "dst"])
        return p.assign(
            deg=p.groupby("src")["src"].transform("size").astype("int64")
        )

    edges = bucketed_group_agg(pairs, ["src"], dedup_and_deg, num_buckets=nb)
    edges = edges.repartition(nb_iter).materialize()

    # -- small-graph fast path: local exact iteration under the byte gate ------
    if edges.count() * 24 <= local_max_bytes:
        ep = edges.to_pandas()
        src = ep["src"].to_numpy(dtype="int64")
        dst = ep["dst"].to_numpy(dtype="int64")
        deg = ep["deg"].to_numpy(dtype="int64")
        node_ids = np.unique(np.concatenate([src, dst]))
        n_nodes = len(node_ids)
        base = (PAGERANK_SCALE * 15) // (100 * n_nodes)
        si = np.searchsorted(node_ids, src)
        di = np.searchsorted(node_ids, dst)
        val = np.full(n_nodes, PAGERANK_SCALE // n_nodes, dtype="int64")
        for _ in range(PAGERANK_ITERS):
            share = (val[si] * np.int64(85)) // (np.int64(100) * deg)
            nxt = np.full(n_nodes, base, dtype="int64")
            np.add.at(nxt, di, share)  # int64-exact scatter-add (bincount floats)
            val = nxt
        return ray.data.from_pandas(
            pd.DataFrame({"node": node_ids, "rank_fp": val})
        )

    # -- node set (distinct src ∪ dst) ----------------------------------------
    def node_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": np.unique(np.concatenate([b["src"].to_numpy(),
                                               b["dst"].to_numpy()]))}
        )

    nodes = bucketed_group_agg(
        edges.map_batches(node_rows, batch_format="pandas"),
        ["node"], lambda g: g.drop_duplicates(), num_buckets=nb,
    ).repartition(nb_iter).materialize()
    n_nodes = nodes.count()
    base = (PAGERANK_SCALE * 15) // (100 * n_nodes)
    r0 = PAGERANK_SCALE // n_nodes

    ranks = nodes.map_batches(
        lambda b: b.assign(val=np.int64(r0)), batch_format="pandas"
    ).materialize()

    edge_tag = edges.map_batches(
        lambda b: pd.DataFrame(
            {"key": b["src"], "dst": b["dst"], "deg": b["deg"],
             "val": np.int64(0), "_t": np.int64(1)}
        ),
        batch_format="pandas",
    )
    node_tag = nodes.map_batches(
        lambda b: pd.DataFrame(
            {"key": b["node"].astype("int64"), "share": np.int64(0),
             "_t": np.int64(0)}
        ),
        batch_format="pandas",
    )

    def contrib(g: pd.DataFrame) -> pd.DataFrame:
        r = g.loc[g["_t"] == 0].set_index("key")["val"]
        e = g.loc[g["_t"] == 1]
        if e.empty:
            return pd.DataFrame({"dst": pd.Series([], dtype="int64"),
                                 "share": pd.Series([], dtype="int64")})
        rv = e["key"].map(r).to_numpy(dtype="int64")
        share = (rv * np.int64(85)) // (np.int64(100) * e["deg"].to_numpy())
        out = pd.DataFrame({"dst": e["dst"].to_numpy(), "share": share})
        return out.groupby("dst", as_index=False)["share"].sum().astype(
            {"dst": "int64", "share": "int64"}
        )

    def new_rank(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.loc[g["_t"] == 0, ["key"]]
        c = g.loc[g["_t"] == 1].groupby("key")["share"].sum()
        out = pd.DataFrame(
            {
                "node": nd["key"].astype("int64"),
                "val": (np.int64(base)
                        + nd["key"].map(c).fillna(0).astype("int64")),
            }
        )
        return out

    for _ in range(PAGERANK_ITERS):
        rank_tag = ranks.map_batches(
            lambda b: pd.DataFrame(
                {"key": b["node"].astype("int64"), "dst": np.int64(-1),
                 "deg": np.int64(1), "val": b["val"].astype("int64"),
                 "_t": np.int64(0)}
            ),
            batch_format="pandas",
        )
        contribs = bucketed_group_agg(
            rank_tag.union(edge_tag), ["key"], contrib, num_buckets=nb_iter
        ).map_batches(
            lambda b: pd.DataFrame(
                {"key": b["dst"].astype("int64"),
                 "share": b["share"].astype("int64"), "_t": np.int64(1)}
            ),
            batch_format="pandas",
        )
        # Pin the frontier's block count: sort-based map_groups emits as
        # many blocks as it consumes, and each union adds the tag blocks
        # back — without this repartition the block count grows by ~2·nb
        # per iteration and driver scheduling overhead (per-block, not
        # per-byte) swamps the work (measured: 6.7 → 49.9 s/iter by
        # iteration 5 at sf0.001; constant with the pin).
        ranks = bucketed_group_agg(
            node_tag.union(contribs), ["key"], new_rank, num_buckets=nb_iter
        ).repartition(nb_iter).materialize()

    return ranks.map_batches(
        lambda b: pd.DataFrame(
            {"node": b["node"].astype("int64"),
             "rank_fp": b["val"].astype("int64")}
        ),
        batch_format="pandas",
    )


# --- Triangle census over the co-purchase graph ------------------------------------
#
# Graph-analytics member #2 (pagerank is the iterative one; this is the
# one-shot motif count): edges are part pairs co-purchased in ≥ 2 distinct
# orders, and the census reports edge count, undirected wedge count
# (Σ d(d-1)/2 — the clustering-coefficient denominator) and the exact
# triangle count via the standard node-iterator-on-oriented-adjacency
# scheme (each triangle a<b<c found exactly once from its lowest vertex).

TRIANGLE_MIN_SUPPORT = 2

TRIANGLE_COUNT_SQL = f"""
WITH lp AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
e AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= {TRIANGLE_MIN_SUPPORT}
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT pa AS v FROM e UNION ALL SELECT pb AS v FROM e)
  GROUP BY v
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS t
  FROM e e1
  JOIN e e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
  JOIN e e3 ON e3.pa = e1.pb AND e3.pb = e2.pb
)
SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT SUM(d * (d - 1) // 2) FROM deg) AS BIGINT) AS n_wedges,
       (SELECT t FROM tri) AS n_triangles
"""


def triangle_count(sf_dir: str) -> "pd.DataFrame":
    """One-row graph census (n_edges, n_wedges, n_triangles) of the
    part-level co-purchase graph (edge = pair bought together in ≥ 2
    orders).

    Scale shape: baskets co-locate with ONE bucketed shuffle on orderkey
    (pair expansion is basket-local, C(k,2) with k = order width); pair
    supports reduce in a second byte-scaled bucketed agg and the support
    filter runs inside it, so only surviving edges materialize (pinned
    once, reused by all three census passes — the dedup_apply residency
    rule; pass a higher min_support at 100 TB to bound them). Wedges come
    from a per-node degree reduce (driver holds one integer); triangles
    orient each edge low→high, expand per-source adjacency into wedge
    rows with multiplicities (vectorized self-merge on complete
    per-source groups), reduce multiplicities per (v, w), and close them
    against the edge list with one hash join — the join carries
    |distinct wedge endpoints| ≤ |node pairs| rows, never raw wedges."""
    from .shuffle import (
        bucketed_group_agg,
        input_bytes_estimate,
        join_partitions,
        scaled_num_buckets,
    )

    path = f"{sf_dir}/lineitem.parquet"
    nb = scaled_num_buckets(input_bytes_estimate(path))

    ds = ray.data.read_parquet(path, columns=["l_orderkey", "l_partkey"])

    def lp_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates()

    def basket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        f = g.merge(g, on="l_orderkey", suffixes=("_a", "_b"))
        f = f.loc[f["l_partkey_a"] < f["l_partkey_b"]]
        out = f.groupby(["l_partkey_a", "l_partkey_b"], as_index=False).size()
        out.columns = ["pa", "pb", "n"]
        return out.astype({"pa": "int64", "pb": "int64", "n": "int64"})

    pair_partials = bucketed_group_agg(
        ds.map_batches(lp_partial, batch_format="pandas"),
        ["l_orderkey"], basket_pairs, num_buckets=nb,
    )

    def support_filter(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["pa", "pb"], as_index=False).agg(n=("n", "sum"))
        return s.loc[s["n"] >= TRIANGLE_MIN_SUPPORT, ["pa", "pb"]]

    edges = bucketed_group_agg(
        pair_partials, ["pa", "pb"], support_filter, num_buckets=nb
    ).materialize()

    n_edges = int(edges.count())

    # --- wedges: per-node degree, then Σ d(d-1)/2 -------------------------
    def endpoint_rows(b: pd.DataFrame) -> pd.DataFrame:
        v = np.concatenate([b["pa"].to_numpy(), b["pb"].to_numpy()])
        h = pd.Series(v).value_counts()
        return pd.DataFrame(
            {"v": h.index.to_numpy().astype("int64"),
             "n": h.to_numpy().astype("int64")}
        )

    def wedge_partial(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("v")["n"].sum().to_numpy().astype("int64")
        return pd.DataFrame({"w": [int((d * (d - 1) // 2).sum())]})

    wedge_parts = bucketed_group_agg(
        edges.map_batches(endpoint_rows, batch_format="pandas"),
        ["v"], wedge_partial, num_buckets=nb,
    )
    n_wedges = int(wedge_parts.sum("w") or 0)

    # --- triangles: oriented wedges closed against the edge list ----------
    def adj_wedges(g: pd.DataFrame) -> pd.DataFrame:
        f = g.merge(g, on="pa", suffixes=("_x", "_y"))
        f = f.loc[f["pb_x"] < f["pb_y"]]
        out = f.groupby(["pb_x", "pb_y"], as_index=False).size()
        out.columns = ["wa", "wb", "m"]
        return out.astype({"wa": "int64", "wb": "int64", "m": "int64"})

    wedge_rows = bucketed_group_agg(
        edges, ["pa"], adj_wedges, num_buckets=nb,
    )

    def wedge_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["wa", "wb"], as_index=False).agg(m=("m", "sum"))

    wedge_counts = bucketed_group_agg(
        wedge_rows, ["wa", "wb"], wedge_reduce, num_buckets=nb
    )

    P, jkw = join_partitions(size_bytes=input_bytes_estimate(path))
    closed = wedge_counts.join(
        edges, "inner", P, on=("wa", "wb"), right_on=("pa", "pb"), **jkw
    )
    n_triangles = int(closed.sum("m") or 0)

    return pd.DataFrame(
        {
            "n_edges": pd.Series([n_edges], dtype="int64"),
            "n_wedges": pd.Series([n_wedges], dtype="int64"),
            "n_triangles": pd.Series([n_triangles], dtype="int64"),
        }
    )


# --- degree distribution of the co-purchase graph ------------------------------------

DEGREE_HISTOGRAM_SQL = f"""
WITH lp AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
e AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= {TRIANGLE_MIN_SUPPORT}
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT pa AS v FROM e UNION ALL SELECT pb AS v FROM e)
  GROUP BY v
)
SELECT d AS degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY d
"""


def degree_histogram(sf_dir: str) -> ray.data.Dataset:
    """Degree distribution (degree → node count) of the same support-≥2
    co-purchase graph triangle_count censuses — the first plot every
    graph pipeline draws (power-law check / hub detection).

    Identical scale shape to triangle_count's first two passes: basket
    co-location on orderkey (pair expansion is basket-local), support
    filter inside the byte-scaled pair reduce so only surviving edges
    materialize, then per-node degrees from a bucketed endpoint-count
    reduce (each bucket owns its nodes fully, so local sums are exact
    degrees) emitting per-bucket partial histograms; partials merge in
    one task over the tiny distinct-degree domain."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    path = f"{sf_dir}/lineitem.parquet"
    nb = scaled_num_buckets(input_bytes_estimate(path))
    ds = ray.data.read_parquet(path, columns=["l_orderkey", "l_partkey"])

    def basket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        f = g.merge(g, on="l_orderkey", suffixes=("_a", "_b"))
        f = f.loc[f["l_partkey_a"] < f["l_partkey_b"]]
        out = f.groupby(["l_partkey_a", "l_partkey_b"], as_index=False).size()
        out.columns = ["pa", "pb", "n"]
        return out.astype({"pa": "int64", "pb": "int64", "n": "int64"})

    pair_partials = bucketed_group_agg(
        ds.map_batches(lambda b: b.drop_duplicates(), batch_format="pandas"),
        ["l_orderkey"], basket_pairs, num_buckets=nb,
    )

    def support_filter(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["pa", "pb"], as_index=False).agg(n=("n", "sum"))
        return s.loc[s["n"] >= TRIANGLE_MIN_SUPPORT, ["pa", "pb"]]

    edges = bucketed_group_agg(
        pair_partials, ["pa", "pb"], support_filter, num_buckets=nb
    )

    def endpoint_rows(b: pd.DataFrame) -> pd.DataFrame:
        v = np.concatenate([b["pa"].to_numpy(), b["pb"].to_numpy()])
        h = pd.Series(v).value_counts()
        return pd.DataFrame(
            {"v": h.index.to_numpy().astype("int64"),
             "n": h.to_numpy().astype("int64")}
        )

    def degree_hist_partial(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("v")["n"].sum()
        h = d.value_counts()
        return pd.DataFrame(
            {"degree": h.index.to_numpy().astype("int64"),
             "n_nodes": h.to_numpy().astype("int64")}
        )

    partials = bucketed_group_agg(
        edges.map_batches(endpoint_rows, batch_format="pandas"),
        ["v"], degree_hist_partial, num_buckets=nb,
    )

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby("degree", as_index=False)["n_nodes"].sum()
        return s.astype({"degree": "int64", "n_nodes": "int64"})

    return partials.repartition(1).map_batches(merge, batch_format="pandas")


# --- per-node clustering coefficient (top-k report) ----------------------------------

NODE_CLUSTERING_TOP_K = 20

NODE_CLUSTERING_SQL = f"""
WITH lp AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
e AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= {{TRIANGLE_MIN_SUPPORT}}
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT pa AS v FROM e UNION ALL SELECT pb AS v FROM e) GROUP BY v
),
tri AS (
  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
  FROM e e1
  JOIN e e2 ON e2.pa = e1.pa AND e1.pb < e2.pb
  JOIN e e3 ON e3.pa = e1.pb AND e3.pb = e2.pb
),
tn AS (
  SELECT p, CAST(count(*) AS BIGINT) AS t FROM (
    SELECT a AS p FROM tri UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY p
),
c AS (
  SELECT d.v AS node, d.deg, COALESCE(tn.t, 0) AS n_tri,
         CAST(COALESCE(tn.t, 0) * 2000000 // (d.deg * (d.deg - 1)) AS BIGINT)
           AS clustering_ppm
  FROM deg d LEFT JOIN tn ON tn.p = d.v
  WHERE d.deg >= 2
)
SELECT node, deg, n_tri, clustering_ppm,
       CAST(row_number() OVER (ORDER BY clustering_ppm DESC, node) AS BIGINT)
         AS rank
FROM c
QUALIFY row_number() OVER (ORDER BY clustering_ppm DESC, node) <= {{K}}
""".format(TRIANGLE_MIN_SUPPORT=TRIANGLE_MIN_SUPPORT, K=NODE_CLUSTERING_TOP_K)


def node_clustering(
    sf_dir: str, *, local_max_bytes: int = 128 << 20
) -> ray.data.Dataset:
    """Top-20 nodes of the co-purchase graph by LOCAL clustering
    coefficient (2·tri / deg·(deg−1), exact integer ppm) — the
    community-tightness ranking behind recommender neighborhoods and
    fraud-ring detection; triangle_count's global census, attributed
    per node.

    Scale shape: the edge derivation is triangle_count's (basket
    co-location, in-reduce support filter) and always distributed. The
    CLOSE is size-gated exactly like pagerank's power iteration: a
    support-filtered co-purchase edge list is tiny relative to the
    corpus (3.6k edges at sf0.1), so under ``local_max_bytes`` the
    wedge/closure/credit stages run as ONE local pandas task (saving 3
    bucketed exchanges of pure fixed tax, ~6 s at sf0.1×32); past the
    gate — or test-forced via ``local_max_bytes=0`` — the fully
    distributed path runs: explicit (u, v, w) wedge rows (the
    Σ C(deg_oriented, 2) enumeration cost, paid because closure must
    credit all three corners), a tag-union bucketed closure on (v, w)
    (no hash join, per the join fixed-tax lesson), and credits +
    endpoint degrees sharing ONE node-keyed reduce with per-bucket
    top-k candidates."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    path = f"{sf_dir}/lineitem.parquet"
    nb = scaled_num_buckets(input_bytes_estimate(path))
    ds = ray.data.read_parquet(path, columns=["l_orderkey", "l_partkey"])

    def basket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        f = g.merge(g, on="l_orderkey", suffixes=("_a", "_b"))
        f = f.loc[f["l_partkey_a"] < f["l_partkey_b"]]
        out = f.groupby(["l_partkey_a", "l_partkey_b"], as_index=False).size()
        out.columns = ["pa", "pb", "n"]
        return out.astype({"pa": "int64", "pb": "int64", "n": "int64"})

    pair_partials = bucketed_group_agg(
        ds.map_batches(lambda b: b.drop_duplicates(), batch_format="pandas"),
        ["l_orderkey"], basket_pairs, num_buckets=nb,
    )

    def support_filter(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["pa", "pb"], as_index=False).agg(n=("n", "sum"))
        return s.loc[s["n"] >= TRIANGLE_MIN_SUPPORT, ["pa", "pb"]]

    edges = bucketed_group_agg(
        pair_partials, ["pa", "pb"], support_filter, num_buckets=nb
    ).materialize()

    if (edges.size_bytes() or 0) <= local_max_bytes:
        e = edges.to_pandas()

        def local_close(_: pd.DataFrame) -> pd.DataFrame:
            w = e.merge(e, on="pa", suffixes=("_x", "_y"))
            w = w.loc[w["pb_x"] < w["pb_y"]]
            tri = w.merge(
                e.rename(columns={"pa": "pb_x", "pb": "pb_y"}),
                on=["pb_x", "pb_y"],
            )
            nodes = np.concatenate(
                [tri["pa"].to_numpy(), tri["pb_x"].to_numpy(),
                 tri["pb_y"].to_numpy()]
            )
            tcnt = pd.Series(nodes).value_counts()
            deg = pd.Series(
                np.concatenate([e["pa"].to_numpy(), e["pb"].to_numpy()])
            ).value_counts()
            out = pd.DataFrame(
                {"node": deg.index.to_numpy().astype("int64"),
                 "deg": deg.to_numpy().astype("int64")}
            )
            out = out.loc[out["deg"] >= 2]
            out["n_tri"] = out["node"].map(tcnt).fillna(0).astype("int64")
            out["clustering_ppm"] = (
                out["n_tri"] * 2_000_000 // (out["deg"] * (out["deg"] - 1))
            ).astype("int64")
            top = out.sort_values(
                ["clustering_ppm", "node"], ascending=[False, True]
            ).head(NODE_CLUSTERING_TOP_K)
            return pd.DataFrame(
                {"node": top["node"].to_numpy(),
                 "deg": top["deg"].to_numpy(),
                 "n_tri": top["n_tri"].to_numpy(),
                 "clustering_ppm": top["clustering_ppm"].to_numpy(),
                 "rank": np.arange(1, len(top) + 1, dtype="int64")}
            )

        one = ray.data.from_pandas(pd.DataFrame({"x": [0]}))
        return one.map_batches(
            local_close, batch_format="pandas", batch_size=None
        )

    # explicit oriented wedges (u, wa, wb) from per-source adjacency
    def adj_wedges(g: pd.DataFrame) -> pd.DataFrame:
        f = g.merge(g, on="pa", suffixes=("_x", "_y"))
        f = f.loc[f["pb_x"] < f["pb_y"]]
        return pd.DataFrame(
            {"wa": f["pb_x"].astype("int64"), "wb": f["pb_y"].astype("int64"),
             "u": f["pa"].astype("int64"), "_t": np.int64(0)}
        )

    wedges = bucketed_group_agg(edges, ["pa"], adj_wedges, num_buckets=nb)
    etags = edges.map_batches(
        lambda b: pd.DataFrame(
            {"wa": b["pa"].astype("int64"), "wb": b["pb"].astype("int64"),
             "u": np.int64(-1), "_t": np.int64(1)}
        ),
        batch_format="pandas",
    )

    def close_credit(g: pd.DataFrame) -> pd.DataFrame:
        has_edge = g.groupby(["wa", "wb"])["_t"].transform("max") == 1
        w = g.loc[(g["_t"] == 0) & has_edge]
        if w.empty:
            return pd.DataFrame({"node": pd.Series(dtype="int64"),
                                 "t": pd.Series(dtype="int64"),
                                 "dn": pd.Series(dtype="int64")})
        nodes = np.concatenate(
            [w["u"].to_numpy(), w["wa"].to_numpy(), w["wb"].to_numpy()]
        )
        h = pd.Series(nodes).value_counts()
        return pd.DataFrame(
            {"node": h.index.to_numpy().astype("int64"),
             "t": h.to_numpy().astype("int64"), "dn": np.int64(0)}
        )

    credits = bucketed_group_agg(
        wedges.union(etags), ["wa", "wb"], close_credit, num_buckets=nb
    )

    def endpoint_rows(b: pd.DataFrame) -> pd.DataFrame:
        v = np.concatenate([b["pa"].to_numpy(), b["pb"].to_numpy()])
        h = pd.Series(v).value_counts()
        return pd.DataFrame(
            {"node": h.index.to_numpy().astype("int64"),
             "t": np.int64(0), "dn": h.to_numpy().astype("int64")}
        )

    degs = edges.map_batches(endpoint_rows, batch_format="pandas")

    def per_node(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("node", as_index=False).agg(
            n_tri=("t", "sum"), deg=("dn", "sum")
        )
        s = s.loc[s["deg"] >= 2]
        s["clustering_ppm"] = (
            s["n_tri"] * 2_000_000 // (s["deg"] * (s["deg"] - 1))
        ).astype("int64")
        return s.sort_values(
            ["clustering_ppm", "node"], ascending=[False, True]
        ).head(NODE_CLUSTERING_TOP_K)

    cands = bucketed_group_agg(
        credits.union(degs), ["node"], per_node, num_buckets=min(nb, 128)
    )

    def final(b: pd.DataFrame) -> pd.DataFrame:
        top = b.sort_values(
            ["clustering_ppm", "node"], ascending=[False, True]
        ).head(NODE_CLUSTERING_TOP_K)
        return pd.DataFrame(
            {"node": top["node"].to_numpy().astype("int64"),
             "deg": top["deg"].to_numpy().astype("int64"),
             "n_tri": top["n_tri"].to_numpy().astype("int64"),
             "clustering_ppm": top["clustering_ppm"].to_numpy().astype("int64"),
             "rank": np.arange(1, len(top) + 1, dtype="int64")}
        )

    return cands.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


# --- item-item Jaccard similarity (collaborative-filtering neighbors) -----------------

JACCARD_ITEMS_TOP_K = 20
JACCARD_ITEMS_MIN_CO = 2

JACCARD_ITEM_SIMILARITY_SQL = f"""
WITH lp AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
od AS (SELECT l_partkey AS p, CAST(count(*) AS BIGINT) AS d FROM lp GROUP BY p),
co AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(count(*) AS BIGINT) AS c
  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= {JACCARD_ITEMS_MIN_CO}
),
j AS (
  SELECT co.pa, co.pb, co.c,
         CAST(co.c * 1000000 // (da.d + db.d - co.c) AS BIGINT) AS jaccard_ppm
  FROM co JOIN od da ON da.p = co.pa JOIN od db ON db.p = co.pb
)
SELECT pa, pb, c AS n_co, jaccard_ppm,
       CAST(row_number() OVER (ORDER BY jaccard_ppm DESC, pa, pb) AS BIGINT)
         AS rank
FROM j
QUALIFY row_number() OVER (ORDER BY jaccard_ppm DESC, pa, pb) <= {JACCARD_ITEMS_TOP_K}
"""


def jaccard_item_similarity(
    sf_dir: str, *, local_max_bytes: int = 128 << 20
) -> ray.data.Dataset:
    """Top-20 item pairs by exact basket-set Jaccard (|A∩B| / |A∪B| in
    integer ppm) — item-item collaborative filtering's similarity core
    (the Amazon-style 'customers who bought X' neighbor table), with the
    co-occurrence floor pruning the long tail before any ratio is taken.

    Scale shape: co-occurrence counts ride the basket-pairs machinery
    (one orderkey co-location shuffle, in-reduce min-co filter; exact
    per-item order-degree partials come from the SAME complete-order
    reduce). The fold is size-gated like pagerank / node_clustering:
    the min-co-filtered pair list is tiny relative to the corpus, and
    only the degrees of items APPEARING in it matter (≤ 2·|pairs|), so
    under ``local_max_bytes`` the surviving pairs collect once, the
    relevant degrees reduce through a broadcast-filtered thin pass, and
    ONE task computes the ppm + top-k (saving two bucketed exchanges of
    fixed tax). Past the gate — or test-forced via ``local_max_bytes=0``
    — the fully distributed fold runs: each pair visits BOTH endpoints'
    item buckets (two thin rows per pair) to pick up degrees, a
    pair-keyed reduce folds the halves, per-bucket top-k candidates
    bound the final merge — no hash join, no unbounded broadcast."""
    from .shuffle import bucketed_group_agg, input_bytes_estimate, scaled_num_buckets

    path = f"{sf_dir}/lineitem.parquet"
    nb = scaled_num_buckets(input_bytes_estimate(path))
    ds = ray.data.read_parquet(path, columns=["l_orderkey", "l_partkey"])

    # ONE complete-order reduce emits both pair partials (kind 0) and
    # EXACT per-item order-degree partials (kind 1) — degrees must come
    # from complete orders, a per-batch value_counts would double-count
    # an order split across input batches
    def basket_stage(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        f = g.merge(g, on="l_orderkey", suffixes=("_a", "_b"))
        f = f.loc[f["l_partkey_a"] < f["l_partkey_b"]]
        pairs = f.groupby(["l_partkey_a", "l_partkey_b"], as_index=False).size()
        pairs.columns = ["pa", "pb", "n"]
        pairs = pairs.astype({"pa": "int64", "pb": "int64", "n": "int64"})
        pairs["kind"] = np.int64(0)
        pairs["item"] = np.int64(-1)
        h = g["l_partkey"].value_counts()  # one row per (order, item)
        degp = pd.DataFrame(
            {"pa": np.int64(-1), "pb": np.int64(-1),
             "n": h.to_numpy().astype("int64"), "kind": np.int64(1),
             "item": h.index.to_numpy().astype("int64")}
        )
        cols = ["kind", "pa", "pb", "n", "item"]
        return pd.concat([pairs[cols], degp[cols]], ignore_index=True)

    stage1 = bucketed_group_agg(
        ds.map_batches(lambda b: b.drop_duplicates(), batch_format="pandas"),
        ["l_orderkey"], basket_stage, num_buckets=nb,
    ).materialize()

    pair_partials = stage1.map_batches(
        lambda b: b.loc[b["kind"] == 0, ["pa", "pb", "n"]],
        batch_format="pandas",
    )

    def co_filter(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["pa", "pb"], as_index=False).agg(c=("n", "sum"))
        return s.loc[s["c"] >= JACCARD_ITEMS_MIN_CO]

    co = bucketed_group_agg(
        pair_partials, ["pa", "pb"], co_filter, num_buckets=nb
    ).materialize()

    if (co.size_bytes() or 0) <= local_max_bytes:
        co_pd = co.to_pandas()
        items = np.unique(
            np.concatenate([co_pd["pa"].to_numpy(), co_pd["pb"].to_numpy()])
        )
        items_ref = ray.put(items)

        def deg_of_interest(b: pd.DataFrame) -> pd.DataFrame:
            it = ray.get(items_ref)
            d = b.loc[b["kind"] == 1, ["item", "n"]]
            pos = np.searchsorted(it, d["item"].to_numpy())
            hit = (pos < len(it)) & (
                it[np.minimum(pos, len(it) - 1)] == d["item"].to_numpy()
            )
            return d.loc[hit]

        dsum = (
            stage1.map_batches(deg_of_interest, batch_format="pandas")
            .repartition(1)
            .map_batches(
                lambda b: b.groupby("item", as_index=False)["n"].sum(),
                batch_format="pandas", batch_size=None,
            )
            .to_pandas()
            .set_index("item")["n"]
        )

        f = co_pd.assign(
            da=co_pd["pa"].map(dsum).astype("int64"),
            db=co_pd["pb"].map(dsum).astype("int64"),
        )
        f["jaccard_ppm"] = (
            f["c"] * 1_000_000 // (f["da"] + f["db"] - f["c"])
        ).astype("int64")
        top = f.rename(columns={"c": "n_co"}).sort_values(
            ["jaccard_ppm", "pa", "pb"], ascending=[False, True, True]
        ).head(JACCARD_ITEMS_TOP_K)
        res = pd.DataFrame(
            {"pa": top["pa"].to_numpy().astype("int64"),
             "pb": top["pb"].to_numpy().astype("int64"),
             "n_co": top["n_co"].to_numpy().astype("int64"),
             "jaccard_ppm": top["jaccard_ppm"].to_numpy().astype("int64"),
             "rank": np.arange(1, len(top) + 1, dtype="int64")}
        )
        return ray.data.from_pandas(res)

    degs = stage1.map_batches(
        lambda b: b.loc[b["kind"] == 1, ["item", "n"]].rename(
            columns={"n": "d"}
        ).assign(pa=np.int64(-1), pb=np.int64(-1), c=np.int64(0),
                 side=np.int64(-1)),
        batch_format="pandas",
    )

    # each pair visits both endpoints' item buckets to pick up degrees
    def pair_halves(b: pd.DataFrame) -> pd.DataFrame:
        a = pd.DataFrame(
            {"item": b["pa"].astype("int64"), "d": np.int64(0),
             "pa": b["pa"].astype("int64"), "pb": b["pb"].astype("int64"),
             "c": b["c"].astype("int64"), "side": np.int64(0)}
        )
        z = a.copy()
        z["item"] = b["pb"].to_numpy()
        z["side"] = np.int64(1)
        return pd.concat([a, z], ignore_index=True)

    halves = co.map_batches(pair_halves, batch_format="pandas")

    def attach_degree(g: pd.DataFrame) -> pd.DataFrame:
        d_of = g.loc[g["side"] == -1].groupby("item")["d"].sum()
        h = g.loc[g["side"] >= 0].copy()
        h["d"] = h["item"].map(d_of).fillna(0).astype("int64")
        return h[["pa", "pb", "c", "side", "d"]]

    attached = bucketed_group_agg(
        degs.union(halves), ["item"], attach_degree, num_buckets=nb
    )

    def fold_pair(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["pa", "pb"], as_index=False).agg(
            c=("c", "first"), dsum=("d", "sum")
        )
        s["jaccard_ppm"] = (
            s["c"] * 1_000_000 // (s["dsum"] - s["c"])
        ).astype("int64")
        s = s.rename(columns={"c": "n_co"})
        return s[["pa", "pb", "n_co", "jaccard_ppm"]].sort_values(
            ["jaccard_ppm", "pa", "pb"], ascending=[False, True, True]
        ).head(JACCARD_ITEMS_TOP_K)

    cands = bucketed_group_agg(
        attached, ["pa", "pb"], fold_pair, num_buckets=min(nb, 128)
    )

    def final(b: pd.DataFrame) -> pd.DataFrame:
        top = b.sort_values(
            ["jaccard_ppm", "pa", "pb"], ascending=[False, True, True]
        ).head(JACCARD_ITEMS_TOP_K)
        return pd.DataFrame(
            {"pa": top["pa"].to_numpy().astype("int64"),
             "pb": top["pb"].to_numpy().astype("int64"),
             "n_co": top["n_co"].to_numpy().astype("int64"),
             "jaccard_ppm": top["jaccard_ppm"].to_numpy().astype("int64"),
             "rank": np.arange(1, len(top) + 1, dtype="int64")}
        )

    return cands.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )

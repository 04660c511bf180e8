"""Link-graph centrality for crawl quality (SURVEY.md §2.11 C38).

Production crawl curation scores HOSTS before it scores documents:
Common-Crawl-derived pipelines weight pages by the centrality of their
(registered) domain in the host link graph, so spam constellations that
only link to themselves rank low however much text they ship. This
module provides distributed PageRank over an edge list — composes with
`operators.urls.registered_domain` (build host edges from page links)
and joins back onto documents as a quality prior.

Spark mapping (same iterative discipline as dedup.connected_components):

- one shuffle per power-iteration round (join ranks→edges, groupBy dst);
- out-degrees computed ONCE and cached with the symmetrized edge set;
- dangling-node mass (pages with no outlinks) is redistributed
  uniformly each round — one scalar aggregate, driver holds one float;
- `localCheckpoint` truncates lineage so round N never replays rounds
  1..N-1; the driver-side loop holds only the convergence delta.

Convergence: L1 delta between successive rank vectors < ``tol`` (one
aggregate per round), or ``max_iter``. Ranks sum to 1 at every round by
construction (teleport + dangling redistribution), which is what the
equivalence test checks against a dense numpy power iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dbbspark.session import cut_lineage


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 30,
    tol: float = 1e-6,
) -> DataFrame:
    """(node, rank) for every node appearing in ``edges`` (either end).

    Standard PageRank: rank = (1-d)/N + d·(Σ_in rank/outdeg + dangling
    mass/N). Duplicate (src, dst) rows count once (a page linking twice
    confers no extra endorsement — the usual host-graph convention)."""
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .where(F.col("s").isNotNull() & F.col("d").isNotNull())
        .distinct()
        .transform(cut_lineage, eager=True)
    )
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .transform(cut_lineage, eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("s").agg(F.count("*").alias("deg"))
    # contribution edges: each (s, d) carries rank(s)/deg(s); built once
    contrib_edges = e.join(outdeg, "s").transform(cut_lineage, eager=True)
    contrib_edges.count()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).transform(
        cut_lineage, eager=False
    )
    base = (1.0 - damping) / n
    for _ in range(max_iter):
        # dangling mass: rank parked on nodes with no outlinks
        dangling = (
            ranks.join(outdeg, ranks.node == outdeg.s, "left_anti")
            .agg(F.sum("rank"))
            .first()[0]
            or 0.0
        )
        inflow = (
            contrib_edges.join(ranks, contrib_edges.s == ranks.node)
            .groupBy("d")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("inflow"))
        )
        new_ranks = (
            ranks.join(inflow, ranks.node == inflow.d, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce("inflow", F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .transform(cut_lineage, eager=False)
        )
        delta = (
            ranks.select("node", F.col("rank").alias("old"))
            .join(new_ranks, "node")
            .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
            .first()[0]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    return ranks


def domain_rank_prior(
    docs: DataFrame,
    ranks: DataFrame,
    url_col: str = "url",
    out_col: str = "domain_rank",
) -> DataFrame:
    """Attach each doc's registered-domain PageRank as ``out_col``
    (null → the domain never appeared in the link graph; the caller's
    quality gate decides the prior for unknowns). The rank table is
    node-per-domain — broadcast-sized for any real blocklist-scale
    graph, so this is a map-side join."""
    from .urls import registered_domain

    r = ranks.select(F.col("node").alias("__dom"), F.col("rank").alias(out_col))
    return (
        docs.withColumn("__dom", registered_domain(F.col(url_col)))
        .join(F.broadcast(r), "__dom", "left")
        .drop("__dom")
    )

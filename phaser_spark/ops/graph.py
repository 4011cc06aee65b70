"""Distributed graph primitives (engine addition).

``connected_components`` is the clustering core behind near-dup
deduplication (``ops.dedup.minhash_dedup``), and the same primitive an
entity-resolution or citation-graph pipeline needs, so it is exposed as
a first-class operator on an edge DataFrame.

Scale design: iterative min-label propagation — each round every vertex
adopts the smallest component label among its neighbors, a
``groupBy(vertex).min`` plus a join, both shuffle-on-key and map-side
combinable; no adjacency ever materializes on the driver.  Plain
propagation needs O(graph diameter) rounds; with ``path_compression``
each round also pointer-jumps labels one level (``root := root(root)``),
the classic doubling trick that collapses long chains in O(log diameter)
rounds — the difference between 6 and 60 shuffles on a 10⁶-hop chain.
Rounds run to a FIXPOINT (changed-label count == 0, one small driver
long per round) with a ``max_iters`` safety net — a fixed round count
silently mis-clusters chains longer than its hop budget.

Lineage discipline: each round's labels are ``localCheckpoint``-ed, not
merely cached.  A cache keeps the LOGICAL plan growing — and the
pointer-jump self-join doubles it per round, so by round k the analyzer
is walking a 2^k-node tree (measured: minutes of pure planning within a
dozen rounds).  The local checkpoint materializes the small
``(id, root)`` frame and truncates the plan to a scan of it — the
standard iterative-algorithm pattern.  The returned frame reads from the
final checkpoint, so downstream actions don't re-run the propagation.
"""

from __future__ import annotations

import gc
import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import PhaserError


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    id_col: str = "id",
    component_col: str = "component",
    max_iters: int = 50,
    path_compression: bool = True,
) -> DataFrame:
    """Label every vertex with the minimum vertex id of its connected
    component (undirected).  ``vertices`` (a one-column DataFrame named
    ``id_col``) adds isolated vertices — without it the vertex set is the
    union of edge endpoints.  Returns ``(id_col, component_col)``, cached.
    """
    if src not in edges.columns or dst not in edges.columns:
        raise PhaserError(
            f"connected_components: edges needs columns {src!r}/{dst!r}, "
            f"has {edges.columns}"
        )
    if max_iters < 1:
        # zero rounds would "return" the initial all-singleton labels
        # with only a warning — a silent full mis-clustering
        raise PhaserError(
            f"connected_components: max_iters must be >= 1, got {max_iters}"
        )
    # a NULL endpoint can neither join nor propagate, so only fully
    # non-null edges feed the propagation — but the OTHER endpoint of a
    # half-null edge is still a real vertex and must stay in the vertex
    # set (as a singleton unless another edge connects it); dropping the
    # whole row would silently erase it from the output
    raw = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = raw.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    endpoint_ids = (
        raw.select(F.col("src").alias("id"))
        .union(raw.select(F.col("dst").alias("id")))
        .filter(F.col("id").isNotNull())
        .distinct()
    )
    if vertices is not None:
        # UNION with the edge endpoints, never replace them: the label
        # propagation inner-joins neighbor labels against the vertex set,
        # so a vertices= frame missing an edge endpoint would silently
        # split that component instead of erroring
        verts = (
            vertices.select(F.col(id_col).alias("id"))
            .union(endpoint_ids)
            .distinct()
        )
    else:
        verts = endpoint_ids
    labels = verts.withColumn("root", F.col("id"))
    e = e.localCheckpoint(eager=False)
    converged = False
    for _it in range(max_iters):
        nbr_min = (
            e.select(F.col("src").alias("id"), F.col("dst").alias("nbr"))
            .union(e.select(F.col("dst").alias("id"), F.col("src").alias("nbr")))
            .join(
                labels.select(F.col("id").alias("nbr"), F.col("root").alias("nbr_root")),
                "nbr",
            )
            .groupBy("id")
            .agg(F.min("nbr_root").alias("min_nbr_root"))
        )
        stepped = labels.join(nbr_min, "id", "left").select(
            "id",
            F.col("root").alias("old_root"),
            F.least(
                F.col("root"), F.coalesce(F.col("min_nbr_root"), F.col("root"))
            ).alias("root"),
        )
        if path_compression:
            # pointer jump: root := root(root).  One extra keyed join per
            # round turns O(diameter) convergence into O(log diameter).
            jumped = stepped.alias("l").join(
                stepped.select(
                    F.col("id").alias("root"), F.col("root").alias("root2")
                ).alias("r"),
                "root",
                "left",
            )
            stepped = jumped.select(
                "id",
                "old_root",
                F.least(
                    F.col("root"), F.coalesce(F.col("root2"), F.col("root"))
                ).alias("root"),
            )
        # lazy checkpoint: the convergence count() right below materializes
        # the round's label frame, so each round pays one job, not an
        # eager-materialization job plus a count job (rows identical)
        new_labels = stepped.localCheckpoint(eager=False)
        changed = new_labels.filter(F.col("old_root") != F.col("root")).count()
        labels = new_labels.select("id", "root")
        # prior rounds' checkpoint blocks are freed by the ContextCleaner
        # once their Python/JVM references drop; rebinding `labels` above
        # drops ours, and a driver-side gc.collect() makes the py4j
        # detach (and hence the executor-block cleanup) prompt instead of
        # waiting for an incidental GC — tens of rounds of O(|V|) blocks
        # would otherwise accumulate on a large graph.  r12: the collect
        # costs 50-70 ms of driver time (measured), so it runs every 8th
        # round (bounding accumulation at 8 vertex-sized block sets) and
        # once after the loop, instead of every round.
        if (_it + 1) % 8 == 0:
            gc.collect()
        if changed == 0:
            converged = True
            break
    gc.collect()
    if not converged:
        warnings.warn(
            f"connected_components: no fixpoint after {max_iters} rounds — "
            "labels may split components; raise max_iters (chains longer "
            "than the hop budget, or disable path_compression only with a "
            "generous budget)",
            stacklevel=2,
        )
    return labels.select(
        F.col("id").alias(id_col), F.col("root").alias(component_col)
    )


def component_size_stats(
    components: DataFrame,
    component_col: str = "component",
    size_col: str = "size",
) -> DataFrame:
    """Cluster-size histogram over any component/cluster labeling — the
    "how duplicated is my corpus" audit that pairs with
    :func:`connected_components` / dedup clustering / leakage splits:
    one output row per distinct cluster SIZE::

        (size, n_clusters, n_rows, row_share)

    ``size=1`` rows are the unique documents; the tail tells you whether
    dup mass sits in many small clusters (organic near-dups) or a few
    mega-clusters (boilerplate, templated spam — the case that skews
    cluster-keyed split shares and quadratic pair generators).  Rows
    with a NULL label count as a single ``size``-NULL bucket (visible,
    like ``split_shares``'s NULL row) rather than one giant phantom
    cluster.

    Scale: two map-side-combined aggregates (corpus → cluster sizes →
    size histogram) and share arithmetic over the tiny histogram (its
    row count is bounded by the number of DISTINCT sizes — ≤ √(2·rows)
    even adversarially, in practice dozens).  ``row_share`` is an exact
    bigint ratio evaluated in one double division, so external engines
    reproduce it bit-for-bit.
    """
    from pyspark.sql import Window

    grouped = components.groupBy(F.col(component_col).alias("__c__")).agg(
        F.count(F.lit(1)).alias("__n__")
    )
    # NULL-labeled rows form the size-NULL bucket with their true row
    # mass but ZERO clusters — never one giant phantom cluster
    hist = grouped.groupBy(
        F.when(F.col("__c__").isNotNull(), F.col("__n__")).alias(size_col)
    ).agg(
        F.count(F.when(F.col("__c__").isNotNull(), F.lit(1))).alias(
            "n_clusters"
        ),
        F.sum("__n__").alias("n_rows"),
    )
    whole = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return hist.withColumn(
        "row_share", F.col("n_rows") / F.sum("n_rows").over(whole)
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iters: int = 10,
    vertices: DataFrame | None = None,
    id_col: str = "id",
    rank_col: str = "pagerank",
    digits: int = 12,
    weight_col: str | None = None,
    delta_col: str | None = None,
) -> DataFrame:
    """PageRank over a directed edge DataFrame — the authority signal a
    web-curation pipeline ranks domains/pages by (engine addition; the
    reference, lisad/phaser, has no graph operators).

    Standard damped PageRank with uniform teleport and dangling-mass
    redistribution, run for a FIXED ``n_iters`` (deterministic and
    oracle-replayable — a convergence test would make the iteration
    count, and hence every score, data-dependent)::

        pr[v] = (1-d)/N + d * (dangling/N + Σ_{u→v} pr[u]/outdeg(u))

    Parallel edges collapse (``distinct``) and edges with a NULL endpoint
    feed only their non-null vertex into the vertex set (as in
    :func:`connected_components`); self-loops are legal and keep their
    mass.  Returns ``(id_col, rank_col)`` with the rank truncated to
    ``digits`` decimal digits (reproducible cross-engine; see
    ``ops/dedup.trunc_digits``).

    ``weight_col`` switches to WEIGHTED PageRank — the curation shape
    where links carry fetch quality / click counts: vertex u spreads
    its mass proportional to each out-edge's share of u's total
    out-weight (``pr[u]·w(u,v)/W_out(u)``).  Parallel edges SUM their
    weights instead of collapsing; NULL and non-positive weights drop
    the edge (its endpoints stay vertices, like half-null edges);
    weights accumulate as exact ``decimal(28,12)`` so per-vertex
    out-weights are shuffle-order-independent, and a weight that does
    not fit (>= 1e16, or NaN) raises up front with a rescale hint
    rather than an ANSI overflow mid-round — the same loud contract as
    ``ops.sampling.pps_sample``.

    ``delta_col`` adds the LAST round's per-vertex movement
    ``|pr_n − pr_{n−1}|`` (same truncation) to the output — sum it for
    the L1 convergence residual, max it for the worst vertex.  This is
    the deterministic alternative to a convergence LOOP (which would
    make the iteration count data-dependent): run fixed ``n_iters``,
    read the residual, decide whether to rerun deeper.  Costs one extra
    vertex-sized join at the end, zero extra driver actions.

    Determinism contract: the cross-row sums (per-vertex contribution
    sum, the dangling-mass total) accumulate as ``decimal(38,18)`` so
    the result is independent of partition/shuffle order; everything
    else is IEEE double arithmetic with the SAME expression tree the SQL
    oracle spells out, so an external engine reproduces the scores
    bit-for-bit.

    Scale shape: per iteration one equi-join of edges against the
    (vertex-sized) rank frame, one ``groupBy(dst)`` sum (map-side
    combined), one anti-join-shaped dangling aggregate (one-row, ridden
    in on a broadcast crossJoin), and a ``localCheckpoint`` that
    truncates the otherwise exponentially growing plan — the
    connected-components lineage discipline.  Nothing corpus-sized ever
    reaches the driver: N is one long, the dangling mass one decimal.
    """
    if src not in edges.columns or dst not in edges.columns:
        raise PhaserError(
            f"pagerank: edges needs columns {src!r}/{dst!r}, has {edges.columns}"
        )
    if not 0.0 < damping < 1.0:
        raise PhaserError(f"pagerank: damping must be in (0, 1), got {damping}")
    if n_iters < 1:
        raise PhaserError(f"pagerank: n_iters must be >= 1, got {n_iters}")
    from .dedup import trunc_digits

    if weight_col is not None and weight_col not in edges.columns:
        raise PhaserError(
            f"pagerank: weight_col {weight_col!r} not in edge columns "
            f"{edges.columns}"
        )
    if delta_col is not None and delta_col in (id_col, rank_col):
        raise PhaserError(
            f"pagerank: delta_col {delta_col!r} collides with "
            f"id_col/rank_col — the output would carry duplicate names"
        )
    raw = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if weight_col is None:
        e = raw.filter(
            F.col("src").isNotNull() & F.col("dst").isNotNull()
        ).distinct()
    else:
        # exact decimal weights: per-vertex out-weight sums must be
        # shuffle-order independent or scores drift run-to-run
        wtry = F.col(weight_col).try_cast("decimal(28,12)")
        w = F.when(
            F.col(weight_col).isNotNull() & wtry.isNull(),
            F.raise_error(
                F.concat(
                    F.lit("pagerank: edge weight "),
                    F.col(weight_col).cast("string"),
                    F.lit(
                        " does not fit decimal(28,12) (weights must be "
                        "finite and < 1e16); rescale the weight column"
                    ),
                )
            ).cast("decimal(28,12)"),
        ).otherwise(wtry)
        e = (
            edges.select(
                F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
            )
            .filter(
                F.col("src").isNotNull()
                & F.col("dst").isNotNull()
                & F.col("w").isNotNull()
                & (F.col("w") > 0)
            )
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
    verts = (
        raw.select(F.col("src").alias("id"))
        .union(raw.select(F.col("dst").alias("id")))
        .filter(F.col("id").isNotNull())
        .distinct()
    )
    if vertices is not None:
        verts = (
            vertices.select(F.col(id_col).alias("id")).union(verts).distinct()
        )
    outdeg_keys = e.select("src").distinct()
    # r12 (guide §2.4): the dangling-mass aggregate used to anti-join the
    # vertex-sized rank frame against the out-degree table EVERY round —
    # but the dangling SET is a round-invariant.  Stamp one boolean on
    # the vertex frame up front and each round's dangling mass becomes a
    # plain aggregate over the already-checkpointed rank frame: one join
    # (plus its exchanges) removed per iteration.
    verts = (
        verts.join(
            outdeg_keys.select(F.col("src").alias("id"), F.lit(True).alias("__has_out__")),
            "id",
            "left",
        )
        .select("id", F.coalesce(F.col("__has_out__"), F.lit(False)).alias("__has_out__"))
        # lazy: the count() right below materializes the checkpoint in the
        # same job instead of paying a separate eager-materialization job
        .localCheckpoint(eager=False)
    )
    n = verts.count()  # one driver long; every other aggregate stays lazy
    if n == 0:
        # schema must be invariant with the non-empty path: include the
        # delta column (NULL-cast) whenever it was requested so unions /
        # downstream selects don't break on a degenerate empty edge frame
        empty_cols = [
            F.col("id").alias(id_col),
            F.lit(None).cast("double").alias(rank_col),
        ]
        if delta_col is not None:
            empty_cols.append(F.lit(None).cast("double").alias(delta_col))
        return verts.select(*empty_cols)
    if weight_col is None:
        outdeg = e.groupBy("src").agg(
            F.count(F.lit(1)).cast("double").alias("deg")
        )
    else:
        # decimal sum (exact) then one cast: deterministic out-weight
        outdeg = e.groupBy("src").agg(
            F.sum("w").cast("double").alias("deg")
        )
        e = e.select("src", "dst", F.col("w").cast("double").alias("w"))
    # join the degree in once: each iteration then only joins pr by src.
    # Lazy checkpoint: round 1's contribs aggregate materializes it inside
    # the first checkpoint job (saving the separate eager job); rounds 2..N
    # read the pinned blocks either way.  The IN-LOOP pr checkpoint below
    # stays EAGER deliberately — it is the only action each round, and a
    # lazy version would defer every round's work into the next round's
    # broadcast(dangling) build, nesting N rounds of computation inside
    # chained broadcast futures (a guaranteed spark.sql.broadcastTimeout
    # at scale and an unbounded job fusion locally).
    e_deg = e.join(outdeg, "src").localCheckpoint(eager=False)
    n_lit = F.lit(float(n))
    teleport = (F.lit(1.0) - F.lit(damping)) / n_lit
    pr = verts.select("id", "__has_out__", (F.lit(1.0) / n_lit).alias("pr"))
    prev = pr
    contrib_term = (
        F.col("pr") / F.col("deg")
        if weight_col is None
        else F.col("pr") * F.col("w") / F.col("deg")
    )
    for it in range(n_iters):
        contribs = (
            e_deg.join(pr.select(F.col("id").alias("src"), "pr"), "src")
            .groupBy("dst")
            .agg(F.sum(contrib_term.cast("decimal(38,18)")).alias("s"))
        )
        # same addend set as the old per-round anti-join (vertices with no
        # out-edge), read off the round-invariant flag instead
        dangling = pr.agg(
            F.coalesce(
                F.sum(
                    F.when(~F.col("__has_out__"), F.col("pr")).cast(
                        "decimal(38,18)"
                    )
                ),
                F.lit(0).cast("decimal(38,18)"),
            ).alias("dm")
        )
        stepped = (
            pr.select("id", "__has_out__")
            .join(contribs.select(F.col("dst").alias("id"), "s"), "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                "__has_out__",
                (
                    teleport
                    + F.lit(damping)
                    * (
                        F.col("dm").cast("double") / n_lit
                        + F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                    )
                ).alias("pr"),
            )
        )
        prev = pr
        pr = stepped.localCheckpoint(eager=True)
        if (it + 1) % 8 == 0:
            # a driver gc.collect() costs 50-70 ms (measured) — amortize
            # the py4j-detach pass over batches of rounds; the final
            # collect below still frees everything promptly at loop exit
            gc.collect()
    gc.collect()
    if delta_col is None:
        return pr.select(
            F.col("id").alias(id_col),
            trunc_digits(F.col("pr"), digits).alias(rank_col),
        )
    # last-round movement off the two already-checkpointed frames: one
    # vertex-sized join, no recompute, no driver action
    return (
        pr.join(prev.select("id", F.col("pr").alias("__prev_pr__")), "id")
        .select(
            F.col("id").alias(id_col),
            trunc_digits(F.col("pr"), digits).alias(rank_col),
            trunc_digits(
                F.abs(F.col("pr") - F.col("__prev_pr__")), digits
            ).alias(delta_col),
        )
    )

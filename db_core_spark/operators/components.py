"""Connected components via min-label propagation with pointer doubling.

Shared by the transitive-dedup closures (`dedup_cluster_components`,
`dedup_keep_best_quality`, `embedding_semantic_clusters`): given an
undirected edge list, every vertex ends with ``label = min(vertex id in
its component)`` — the canonical-member rule of every dedup pipeline.

r11 rewrite, measured first (guide §1/§2.6): the r10 plain propagation
needed one round per unit of component DIAMETER — 17 rounds at sf0.1
(near-dup chains are long even at fixture scale), i.e. 17 driver-blocking
convergence actions and ~145 AQE stage-jobs per run, and a diameter > 20
would have tripped the loud-fail cap at larger corpora. Two changes:

1. **Pointer doubling** (the classic hash-to-min shortcut): each round,
   after every vertex adopts ``min(own label, neighbors' labels)``, labels
   chase one indirection — ``label <- label[label]``. The frontier a label
   crosses doubles per round, so convergence needs O(log diameter) rounds
   (sf0.1: 17 -> 5 measured). The cap stays 20, which now covers
   diameters up to ~2^20 — log-scale safe at any corpus size, closing the
   r10 hazard where the cap sat 3 rounds above the observed diameter.
2. **Convergence observed every CHECK_EVERY rounds** (not every round):
   the count is the loop's only driver barrier; propagation past the
   fixpoint is a no-op, and ``changed == 0`` for the LAST round implies
   the global fixpoint (for every edge (u,v): label[u] <= label[v] and
   vice versa => labels constant per component; the constant can only be
   the component min). Rounds between checks chain lazily through the
   per-round localCheckpoint and materialize together in the next check's
   single action.

Fixpoint equality with the plain formulation is pinned by pytest on a
long-chain graph (worst case for plain propagation) plus the three
consumers' oracles at three SFs; the DuckDB oracle computes the closure
with a recursive CTE, so any label drift breaks the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CHECK_EVERY = 2
MAX_ROUNDS = 20


def min_label_components(
    edges: DataFrame,
    id_col: str,
    max_rounds: int = MAX_ROUNDS,
    check_every: int = CHECK_EVERY,
) -> DataFrame:
    """``edges`` is a DIRECTED edge list with columns (u, v) that must
    already contain both directions of every undirected edge. Returns
    (``id_col``, label) for every vertex that appears as ``u``, with
    label = min vertex id of its connected component.

    Each round is vertex/edge-scale shuffles only (join + partial-agg min
    + two label-scale joins); nothing is collected, and the convergence
    count is the only action. At 100 TB the same loop runs with edges
    bucketed on u; rounds are O(log diameter) by the doubling argument."""
    edges = edges.localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("u").alias(id_col)).distinct()
        .withColumn("label", F.col(id_col))
        .localCheckpoint(eager=False)
    )
    rnd = 0
    while rnd < max_rounds:
        rnd += 1
        # hash-to-min step: adopt the smallest label in the neighborhood
        msgs = (
            edges.join(labels, edges.v == labels[id_col])
            .groupBy("u")
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = labels.join(msgs, labels[id_col] == msgs.u, "left").select(
            id_col,
            F.col("label").alias("old_label"),
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
            ).alias("label"),
        )
        # pointer doubling: chase one indirection so the reached frontier
        # doubles per round. Every label value IS some vertex's id (labels
        # start at self and only ever adopt other vertices' ids), so the
        # left join misses only in degenerate cases where coalesce keeps
        # the current label.
        lut = stepped.select(
            F.col(id_col).alias("_l_id"), F.col("label").alias("_l_lab")
        )
        shortcut = (
            stepped.join(lut, stepped.label == lut._l_id, "left")
            .select(
                id_col,
                "old_label",
                F.coalesce("_l_lab", "label").alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        labels = shortcut.select(id_col, "label")
        if rnd % check_every == 0 or rnd == max_rounds:
            changed = shortcut.filter(F.col("label") != F.col("old_label")).count()
            if changed == 0:
                return labels
    raise RuntimeError(
        f"min_label_components: label propagation did not converge in "
        f"{max_rounds} rounds — with pointer doubling that means a "
        f"component diameter beyond ~2^{max_rounds}, which indicates a "
        "degenerate edge list rather than a real corpus; raise max_rounds "
        "only after inspecting the graph"
    )

"""Connected components over duplicate-pair edges: pairs → clusters →
keep/drop.

The near-dup operators (:mod:`.dedup`, :mod:`.similarity`) emit PAIRS;
a pipeline must resolve them into per-document decisions (keep one
representative per duplicate CLUSTER — pairs are not enough: a~b, b~c
must drop both b and c even when a~c was never emitted). This is
min-label propagation with pointer jumping, pure DataFrame ops — no
GraphFrames/GraphX dependency:

- each iteration: every node takes the min of its own label, its
  neighbors' labels (one shuffle: edge ⋈ label + groupBy min), and its
  label's label (pointer jump — label chains halve each round, giving
  O(log diameter) convergence instead of O(diameter));
- iterations are ``localCheckpoint``-ed: iterative plans otherwise grow
  lineage exponentially and re-execute the whole history each round;
- convergence = zero labels changed. The changed-count rides the SAME
  action as the jump: the previous label travels in the jumped frame,
  which is marked for non-eager ``localCheckpoint`` so the convergence
  ``count()`` both materializes the checkpoint and reads the flag —
  ONE Spark job per iteration (plus the two setup checkpoints), not a
  separate re-join-and-count job per round.

Duplicate clusters in practice are near-cliques of tiny diameter, so
this converges in 2-3 rounds; the pointer jump bounds adversarial
chains. At 10^12 scale each round is one self-equijoin on node id — the
edge set (near-dup pairs) is orders of magnitude smaller than the
corpus, so the loop runs on the candidate subgraph only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "resolve_duplicates"]


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
    info: dict | None = None,
) -> DataFrame:
    """(id, component) for every node appearing in ``pairs``; the
    component label is the minimum node id of the component (so a
    label equal to the node's own id marks the representative).

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without
    convergence — returning partially-propagated labels would make
    downstream :func:`resolve_duplicates` emit silently wrong
    keep/drop decisions. Pointer jumping gives O(log diameter)
    rounds, so 30 covers any graph of diameter < 2^30; hitting the
    cap means the input is pathological, not that more rounds help.

    If ``info`` (a dict) is passed it is filled with
    ``{"iterations": k, "converged": True}`` — used by tests to gate
    jobs-per-round.
    """
    e = pairs.select(
        F.col(id_a).cast("long").alias("a"), F.col(id_b).cast("long").alias("b")
    )
    edges = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().localCheckpoint()
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    converged = False
    iterations = 0
    for _it in range(max_iter):
        iterations += 1
        nbr = (
            edges.join(labels, edges["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = labels.join(nbr, labels["id"] == nbr["a"], "left").select(
            labels["id"],
            F.col("label").alias("old"),
            F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
        )
        parent = stepped.select(
            F.col("id").alias("pid"), F.col("label").alias("plabel")
        )
        # the previous label rides along so convergence needs no second
        # join; non-eager checkpoint → the count() below is the ONE job
        # of this round: it materializes the checkpoint and reads `old`
        jumped = (
            stepped.join(parent, stepped["label"] == parent["pid"], "left")
            .select(
                stepped["id"],
                F.col("old"),
                F.coalesce("plabel", stepped["label"]).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = jumped.filter(F.col("label") != F.col("old")).count()
        labels.unpersist()
        labels = jumped
        if changed == 0:
            converged = True
            break
    if info is not None:
        info["iterations"] = iterations
        info["converged"] = converged
    if not converged:
        raise RuntimeError(
            f"connected_components: not converged after {max_iter} "
            "iterations (pathologically long duplicate chain?) — "
            "refusing to return partial labels; raise max_iter"
        )
    return labels.select("id", F.col("label").alias("component"))


def resolve_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Per-document keep/drop from near-dup pairs: one row per doc with
    ``(id_col, component, keep)`` — ``keep`` is true for the minimum-id
    member of each duplicate cluster and for every unpaired doc."""
    comp = connected_components(pairs, id_a, id_b)
    base = docs.select(F.col(id_col).cast("long").alias("id")).distinct()
    return (
        base.join(comp, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("component", F.col("id")).alias("component"),
            (
                F.col("component").isNull()
                | (F.col("component") == F.col("id"))
            ).alias("keep"),
        )
    )


def resolve_best(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Quality-aware cluster resolution: one row per doc with
    ``(id_col, component, score_col, keep)`` where ``keep`` marks the
    HIGHEST-``score_col`` member of each duplicate cluster (ties break
    to the minimum id) and every unpaired doc.

    This is the curation-grade variant of :func:`resolve_duplicates`:
    instead of keeping an arbitrary (min-id) representative, each
    near-dup cluster keeps its best copy — e.g. the longest or
    highest-quality-scored document. Plan shape: the component labels
    come from the same pointer-jumping propagation; the argmax is one
    window partitioned by component — cluster-sized partitions, so no
    skew risk at corpus scale (a duplicate cluster is bounded, not
    corpus-sized; pathological mega-clusters already fail loudly in
    :func:`connected_components`)."""
    from pyspark.sql import Window

    comp = connected_components(pairs, id_a, id_b)
    base = docs.select(
        F.col(id_col).cast("long").alias("id"), F.col(score_col)
    )
    labeled = base.join(comp, "id", "left").select(
        "id",
        F.coalesce("component", F.col("id")).alias("component"),
        score_col,
    )
    w = Window.partitionBy("component").orderBy(
        F.col(score_col).desc(), F.col("id").asc()
    )
    return labeled.select(
        F.col("id").alias(id_col),
        "component",
        score_col,
        (F.row_number().over(w) == 1).alias("keep"),
    )

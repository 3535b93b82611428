"""Connected components over a pair list — the dedup-clustering
primitive (one canonical keeper per near-duplicate cluster).

Generalizes the reference's connected-component extraction step
(/root/reference/handwriting/predict.py:64, cv2.findContours) from pixel
grids to arbitrary similarity graphs, distributed.

Algorithm: min-label propagation with POINTER DOUBLING (label
shortcutting).  Each round does
  (a) a neighbor-min step over the edge list — every node takes the min
      of its own and its neighbors' labels (one join + one aggregation),
  (b) a shortcut step — every node replaces its label with its label's
      label, lab <- labels[lab] (one self-join + min).
Step (b) composes the label mapping with itself, so the propagation
horizon roughly doubles every round: a path-shaped component of length L
converges in O(log L) rounds instead of the O(L) rounds plain
propagation needs (the pointer-jumping idea of the MapReduce
connected-components literature, e.g. the Hash-to-Min and
large-star/small-star families).  Near-dup clusters are usually dense
(diameter ~2) where both variants finish in 2-3 rounds; the log bound is
what protects the 100 TB run from a pathological chain of
templated documents.

Scale notes: per round the driver sees only ONE metadata count (the
convergence check), never data.  The shortcut join keys on `lab`, whose
multiplicity is the component size — a giant component makes it a
classic skewed-foreign-key join, which AQE skew-join splitting handles
(the build side is one row per node).  Each round's label set is
lineage-truncated with an eager localCheckpoint: the round-N plan
references the round-(N-1) labels TWICE (neighbor-min and shortcut), so
without truncation the logical plan Catalyst re-analyzes doubles per
round and the driver OOMs around 9 rounds — caching alone never shrinks
the plan.  localCheckpoint is the single-JVM stand-in; a production run
writes each round to a table (reliable checkpoint) for fault tolerance.
The converged label set is returned cached (checkpoint storage) and tiny
— one row per node in a dup pair.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    pairs: DataFrame, a: str = "src", b: str = "dst", max_rounds: int = 64
) -> tuple[DataFrame, int]:
    """Labels every node of the undirected graph given by `pairs` rows
    (a, b) with the minimum node id reachable from it.

    Returns (labels, n_rounds): labels has columns (doc_id, lab), is
    materialized with truncated lineage (safe to reuse any number of
    times); n_rounds counts loop iterations including the final
    no-change confirmation round.  Only nodes that appear in some pair
    are labeled (isolated nodes are their own trivial component and
    never enter the pair list).
    """
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("lab", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    rounds = 0
    while True:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"connected_components exceeded {max_rounds} rounds — "
                "with pointer doubling this means a component of diameter "
                f"> 2^{max_rounds}, i.e. malformed input"
            )
        # (a) neighbor-min: node <- min(own label, neighbors' labels)
        nbr = edges.join(
            labels.withColumnRenamed("doc_id", "dst"), "dst"
        ).select(F.col("src").alias("doc_id"), "lab")
        stepped = (
            labels.unionByName(nbr)
            .groupBy("doc_id")
            .agg(F.min("lab").alias("lab"))
        )
        # (b) pointer doubling: lab <- labels[lab].  Every label IS a
        # node id (labels start as self and only min-combine), so the
        # lookup always matches; left+coalesce keeps it total anyway.
        # least() is monotonicity insurance — labels(x) <= x invariant
        # already guarantees lab2 <= lab.
        parent = stepped.select(
            F.col("doc_id").alias("lab"), F.col("lab").alias("lab2")
        )
        new_labels = (
            stepped.join(parent, "lab", "left")
            .select(
                "doc_id",
                F.least(F.col("lab"), F.coalesce("lab2", "lab")).alias("lab"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            labels.withColumnRenamed("lab", "old_lab")
            .join(new_labels, "doc_id")
            .filter(F.col("old_lab") != F.col("lab"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels, rounds

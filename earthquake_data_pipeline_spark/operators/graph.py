"""Graph operators: integer-exact PageRank over an edge list.

Iterative algorithms are where engine-neutral determinism usually dies:
float mass summed in shuffle order drifts run to run. This PageRank
keeps every rank in integer ppm (parts-per-million of total mass) and
every transfer as integer DIV — the whole fixed-point loop is exactly
replayable by a SQL oracle with one unrolled CTE per iteration.

Semantics (documented deviations from the textbook real-valued form,
both deterministic and conservative):
- per-edge transfer is (rank(s) * w) DIV wout(s): each edge floors,
  so a node's emitted mass can undershoot rank(s) by < outdeg(s) ppm;
- dangling nodes (no out-edges) leak their mass instead of
  redistributing it (the standard sparse-implementation shortcut);
- edges with weight <= 0 are non-edges for the transfer (their
  endpoints still count as nodes) — a source with only such edges is
  dangling, and an empty graph returns the empty contract frame.

100 TB: the rank table is node-sized, edges are edge-sized; each
iteration is one join (edges × ranks) + one aggregate keyed by dst —
exactly the Pregel-style plan GraphX/GraphFrames runs. Two scale
disciplines (VERDICT r06 item 5):

- the rank vector is re-published through qcommon.reuse (checkpoint
  flavor by deployment) after every iteration, so iteration k's plan
  is bounded (scan ⋈ checkpoint →
  agg → checkpoint) instead of a k-deep join tower — without it the
  optimizer re-derives the full lineage each round and a long run
  blows the driver's plan memory. Storage note: each iteration's
  checkpoint caches one node-sized RDD; the intermediates are
  dereferenced as the loop advances and Spark's ContextCleaner
  unpersists them on GC — only the RETURNED frame's blocks are
  long-lived (they back its truncated lineage, so they must stay);
- when the node domain is small (``broadcast_ranks``, auto below
  _BROADCAST_NODES nodes), the per-iteration join BROADCASTS the
  node-sized rank vector so the edge table — the 100 TB side — is
  never shuffled; only the dst-keyed aggregate exchanges, and its
  input is pre-combined map-side. With a huge node domain the join
  falls back to a shuffle on src, which is the correct shape there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..qcommon import reuse

PPM = 1_000_000

# A rank row is ~16 bytes; 4M nodes ≈ 64 MB broadcast — within the
# comfortable executor-memory envelope for a per-iteration broadcast.
_BROADCAST_NODES = 4_000_000


def pagerank_ppm(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    iterations: int = 3,
    damping_ppm: int = 850_000,
    broadcast_ranks: bool | None = None,
) -> DataFrame:
    """Weighted PageRank in integer ppm after ``iterations`` rounds.

    rank_0(v) = PPM DIV n for all nodes;
    rank_{k+1}(v) = (PPM - damping) DIV n
                    + (damping * Σ_{(s,v,w)} (rank_k(s)*w) DIV wout(s))
                      DIV PPM.

    Overflow bounds: ranks ≤ PPM, weights ≤ ~2^40 keeps every product
    under 2^63.
    """
    # r17: pin the edge input up front — this frame fans out FOUR ways
    # (wout aggregate, ew join side, nodes union s-leg, nodes union
    # d-leg), so an unpinned caller subtree (tokenize + pair-expand +
    # count here) would re-evaluate once per leg; one materialization
    # feeds all of them (guide §1.2: don't compute things twice).
    e = reuse(
        edges.select(
            F.col(src_col).alias("s"),
            F.col(dst_col).alias("d"),
            F.col(weight_col).cast("long").alias("w"),
        )
    )
    # w <= 0 edges carry no mass: they are NON-EDGES for the transfer
    # (a source with no positive-weight out-edge becomes dangling and
    # leaks its mass — the documented semantics above) but still
    # register their endpoints as nodes. Without this filter a node
    # whose out-weights sum to 0 hits an ANSI DIVIDE_BY_ZERO deep
    # inside the codegen'd transfer expression.
    pos = e.filter(F.col("w") > 0)
    wout = pos.groupBy("s").agg(F.sum("w").alias("wout"))
    # qcommon.reuse, not raw localCheckpoint (r13 rotation migration):
    # both frames are re-referenced every iteration, and the reliable
    # flavor survives executor loss on a checkpoint-dir cluster
    ew = reuse(pos.join(wout, "s"))
    nodes = reuse(
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
    )
    n = nodes.count()  # node count: one scalar action up front
    if n == 0:
        # empty graph: the contract-schema empty frame (node type is
        # caller-defined), not a driver-side ZeroDivisionError on PPM//n
        return nodes.select(
            "node", F.lit(0).cast("long").alias("rank_ppm")
        )
    if broadcast_ranks is None:
        broadcast_ranks = n <= _BROADCAST_NODES
    base = (PPM - damping_ppm) // n
    ranks = nodes.select("node", (F.lit(PPM // n)).alias("rank_ppm"))
    for _ in range(iterations):
        rank_side = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            ew.join(rank_side, ew["s"] == rank_side["node"])
            .select(
                F.col("d").alias("node"),
                F.expr("(rank_ppm * w) DIV wout").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        if broadcast_ranks:
            contrib = F.broadcast(contrib)
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_ppm} * coalesce(in_sum, 0)) DIV {PPM}"
                    )
                ).cast("long").alias("rank_ppm"),
            )
        )
        # bound iteration k's plan to one join's depth: without this
        # the k-th round re-optimizes a k-deep join tower. reuse()
        # (r13): checkpoint flavors truncate lineage exactly like the
        # old raw localCheckpoint; the opt-in persist flavor keeps
        # lineage (recompute-on-loss) and trades plan-depth growth for
        # it — acceptable for the documented small iteration counts
        ranks = reuse(ranks)
    return ranks

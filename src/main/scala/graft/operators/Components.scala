package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the shared fixpoint behind `dedup_clusters` (text near-dup edges) and
  * `embed_clusters` (semantic kNN-graph edges).
  *
  * Reference semantics: duplicate-group resolution, the cluster step of
  * every keep-one-per-group dedup (Lee et al. §3 resolve pair sets the
  * same way). Expressed Spark-first: per round one join + one min
  * aggregate, bounded lineage via localCheckpoint, convergence detected
  * by a single tiny aggregate. */
object Components {

  /** Labels every vertex incident to an edge with the minimum vertex id
    * reachable from it: input is a DIRECTED edge list (a, b); output is
    * (doc_id, lbl). Vertices with no edges are the caller's business
    * (their label can never change, so keeping the usually-huge
    * singleton majority out of the loop makes each round O(|dup
    * subgraph|), not O(corpus)). */
  def minLabel(directed: DataFrame): DataFrame = {
    val edges = directed
      .unionByName(directed.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    val edgeDocs = edges.select(col("a").as("doc_id")).distinct().localCheckpoint()
    var labels = edgeDocs.select(col("doc_id"), col("doc_id").as("lbl")).localCheckpoint()
    // convergence check: labels are min-propagated, so they only ever
    // DECREASE — Σ lbl is strictly monotone and stalls exactly at the
    // fixpoint. One tiny aggregate per round replaces a prev↔next join +
    // count (halves the per-round job count; at cluster scale the saved
    // pass is a full labels shuffle per iteration). Summed as
    // decimal(38,0): 64-bit id schemes (snowflake-style ~1e18 doc_ids)
    // overflow a Long sum within a handful of rows, which ANSI turns into
    // a mid-loop abort.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("lbl").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")))
        .head().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    while (!converged) {
      val viaNeighbors = edges.join(labels, edges("b") === labels("doc_id"))
        .select(edges("a").as("doc_id"), labels("lbl"))
      val next = labels.unionByName(viaNeighbors)
        .groupBy(col("doc_id")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
    }
    labels
  }
}

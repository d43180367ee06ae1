package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed link-graph centrality — the crawl-prioritization /
  * document-quality-weighting primitive of a web-scale training-data
  * pipeline (rank pages by link structure before spending tokens on
  * them; reference scope is ingestion-side, this is the curation-side
  * complement alongside `operators/Dedup.connectedComponents`).
  *
  * Scale shape: every power iteration is ONE shuffle keyed on the
  * destination node (contributions grouped per target) plus an
  * outdegree join, both standard hash aggregates/joins — no corpus
  * window, no adjacency matrix, no driver-side graph state (the only
  * driver scalar is the node count). `iters` bounds total work at
  * iters × (join + agg) whatever the edge count; rank state is one row
  * per node throughout.
  */
object Graph {

  /** PageRank by bounded power iteration: starting uniform at `1/n`,
    * each node's next rank is `(1-d)/n + d · Σ rank(u)/outdeg(u)` over
    * its in-edges. Deterministic closed form — `iters` fixed steps, no
    * convergence test — so the result is oracle-checkable by unrolling
    * the same arithmetic. Dangling nodes (no out-edges) simply
    * contribute no mass; callers wanting the classic correction add
    * `d · (dangling mass)/n` per iteration (kept out of the operator so
    * its semantics stay the mirror-able closed form). Self-loops are
    * legal and keep their mass. Output `(id, rank)` — one row per node
    * of `nodes`, including isolated ones (rank `(1-d)/n` after the
    * first step).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, nodeCol: String, iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 50,
      s"iters must be in [1, 50], got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val ids = nodes.select(col(nodeCol).as("id"))
    val n = ids.count().toDouble // bounded driver scalar, like Ivf's k
    require(n > 0, "pageRank needs at least one node")
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
    val deg = e.groupBy("_src")
      .agg(count(lit(1)).cast("double").as("_outdeg"))
    var rank = ids.withColumn("rank", lit(1.0) / lit(n))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(rank.select(col("id").as("_src"), col("rank").as("_r")),
          Seq("_src"))
        .join(deg, Seq("_src"))
        .groupBy(col("_dst"))
        .agg(sum(col("_r") / col("_outdeg")).as("_m"))
        .select(col("_dst").as("id"), col("_m"))
      rank = ids.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) / lit(n) +
            lit(damping) * coalesce(col("_m"), lit(0.0))).as("rank"))
    }
    rank
  }

  /** Topic-sensitive (personalized) PageRank: the teleport mass lands
    * ONLY on the topic set — `(1-d)·1[v∈T]/|T| + d·Σ rank(u)/outdeg(u)`
    * — so centrality is measured relative to a seed interest set
    * ("rank the crawl around the pages we already trust"). Same shape
    * and cost as [[pageRank]]: one shuffle per iteration, the topic
    * membership is a plan-time column on the node frame, |T| the second
    * bounded driver scalar. Non-topic nodes with no in-edges rank
    * exactly 0 — mass exists only where the topic set can reach.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
      dstCol: String, nodes: DataFrame, nodeCol: String,
      topicPredicate: org.apache.spark.sql.Column, iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 50,
      s"iters must be in [1, 50], got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val ids = nodes.select(col(nodeCol).as("id"),
      topicPredicate.cast("boolean").as("_topic"))
    val t = ids.filter(col("_topic")).count().toDouble
    require(t > 0, "personalizedPageRank needs a non-empty topic set")
    val teleport = when(col("_topic"), lit(1.0 - damping) / lit(t))
      .otherwise(lit(0.0))
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
    val deg = e.groupBy("_src")
      .agg(count(lit(1)).cast("double").as("_outdeg"))
    var rank = ids.withColumn("rank",
      when(col("_topic"), lit(1.0) / lit(t)).otherwise(lit(0.0)))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(rank.select(col("id").as("_src"), col("rank").as("_r")),
          Seq("_src"))
        .join(deg, Seq("_src"))
        .groupBy(col("_dst"))
        .agg(sum(col("_r") / col("_outdeg")).as("_m"))
        .select(col("_dst").as("id"), col("_m"))
      rank = ids.join(contrib, Seq("id"), "left")
        .select(col("id"), col("_topic"),
          (teleport +
            lit(damping) * coalesce(col("_m"), lit(0.0))).as("rank"))
    }
    rank.select(col("id"), col("rank"))
  }
}

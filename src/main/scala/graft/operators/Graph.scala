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
    // r18 (guide §1.2): the edge list and outdegree table are re-derived
    // by EVERY iteration's join inside the one final action — cut each
    // once. The rank chain itself is NOT checkpointed: each iteration
    // references the previous rank exactly once, so the whole chain
    // executes once per action and a per-round eager cut was MEASURED
    // pure overhead at 5 iterations (x_pagerank +6% — the hits/walks
    // operators, whose intermediates ARE multiply referenced, keep
    // their cuts). Trade (documented at the LSH checkpoint): no lineage
    // recovery for the two derived tables.
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .localCheckpoint()
    val deg = e.groupBy("_src")
      .agg(count(lit(1)).cast("double").as("_outdeg"))
      .localCheckpoint()
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
    // r18: same edge/outdegree lineage cuts as [[pageRank]] (guide
    // §1.2); the rank chain stays uncut for the same measured reason.
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .localCheckpoint()
    val deg = e.groupBy("_src")
      .agg(count(lit(1)).cast("double").as("_outdeg"))
      .localCheckpoint()
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

  /** Multi-source BFS hop distance: `dist(v)` = fewest edges from ANY
    * source to `v`, up to `maxHops` — reachability/proximity labeling
    * over a link graph ("how far is every page from the trusted seed
    * set"). Frontier iteration: each hop is ONE join of the CURRENT
    * frontier (newly-reached nodes only, never the accumulated set)
    * against the edge list plus an anti-join to drop already-settled
    * nodes — BFS settles a node at its first reach, so the frontier
    * shrinks to exactly the new perimeter and total work is O(E) per
    * hop. Lineage is truncated per round (the connectedComponents
    * convention); the early-exit probe is a `limit(1)` existence check,
    * not a count. Returns `(id, dist)` for REACHED nodes only.
    */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
      sources: DataFrame, sourceCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 100,
      s"maxHops must be in [1, 100], got $maxHops")
    // r18: the edge list is re-derived by every hop's join — cut it once
    // (guide §1.2; recovery trade documented at pageRank's checkpoint)
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .localCheckpoint()
    var dist = sources.select(col(sourceCol).as("id")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    var frontier = dist.select("id")
    var hop = 1L
    while (hop <= maxHops && !frontier.isEmpty) {
      val next = e
        .join(frontier.withColumnRenamed("id", "_src"), Seq("_src"))
        .select(col("_dst").as("id")).distinct()
        .join(dist.select("id"), Seq("id"), "left_anti")
        .localCheckpoint(true)
      dist = dist.unionByName(next.withColumn("dist", lit(hop)))
      frontier = next
      hop += 1
    }
    dist
  }

  /** Triangle count over the UNDIRECTED simple graph induced by the
    * edge list (direction, duplicate edges, and self-loops ignored).
    * The scale-defining trick is the DEGREE-ORDERED orientation: each
    * undirected edge points from its lower-(degree, id) endpoint to the
    * higher one, so every node's out-degree is O(√E) however skewed the
    * raw degree distribution — the wedge join (out-neighbor pairs per
    * center) is bounded by Σ outdeg² = O(E^{3/2}) instead of the hub's
    * raw degree² . Each triangle is counted exactly once: its
    * order-minimal vertex is the unique wedge center, and the closing
    * edge's orientation is determined by the same total order. Three
    * equi-joins, no driver state.
    */
  def triangleCount(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("_deg"))
    val keyed = und
      .join(deg.select(col("v").as("a"), col("_deg").as("_da")), "a")
      .join(deg.select(col("v").as("b"), col("_deg").as("_db")), "b")
    // orient low-(deg, id) → high-(deg, id); carry the target's key for
    // the wedge-pair ordering
    // r18: `oriented` is referenced three times (both wedge legs + the
    // closing semi-join) and its lineage is two joins over the degree
    // aggregate — cut it once (guide §1.2; edge-sized, the same rows the
    // wedge join shuffles anyway; recovery trade as at pageRank)
    val oriented = keyed.select(
      when(col("_da") < col("_db") ||
          (col("_da") === col("_db") && col("a") < col("b")),
        struct(col("a").as("x"), col("b").as("y"), col("_db").as("dy")))
      .otherwise(
        struct(col("b").as("x"), col("a").as("y"), col("_da").as("dy")))
      .as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"), col("e.dy").as("dy"))
      .localCheckpoint()
    val e1 = oriented.alias("e1")
    val e2 = oriented.alias("e2")
    val wedges = e1.join(e2,
        col("e1.x") === col("e2.x") &&
          (col("e1.dy") < col("e2.dy") ||
            (col("e1.dy") === col("e2.dy") && col("e1.y") < col("e2.y"))))
      .select(col("e1.y").as("x"), col("e2.y").as("y"))
    wedges
      .join(oriented.select("x", "y"), Seq("x", "y"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** HITS hubs & authorities (Kleinberg): `iters` rounds of
    * `auth(v) = Σ_{u→v} hub(u)` then `hub(u) = Σ_{u→v} auth(v)`, each
    * L1-normalized — the directional complement of PageRank (a good hub
    * POINTS AT authorities; a good authority IS POINTED AT by hubs;
    * link-list pages vs content pages). Deterministic closed form: each
    * propagation rounds its inputs to 12 dp and sums DECIMALS (the KL
    * convention — partial-aggregation order cannot perturb the sums,
    * which matters here because fan-in is unbounded), the L1
    * normalizers are the same exact decimal sums, and only the final
    * per-node division runs in double. Two shuffles per iteration (one
    * per direction), rank state one row per node, the node count the
    * only driver scalar.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, nodeCol: String, iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"iters must be in [1, 20], got $iters")
    val ids = nodes.select(col(nodeCol).as("id"))
    val n = ids.count().toDouble // bounded driver scalar
    require(n > 0, "hits needs at least one node")
    // r18 (guide §1.2): every propagate output was referenced TWICE (the
    // next propagation's join + the final select) and `raw` twice within
    // one propagate (the L1 normalizer + the join) — with 2 iterations
    // the first edge join re-executed up to 12×, exponential in iters.
    // Cutting the edge list once and each node-sized intermediate makes
    // every propagation run its join + aggregate exactly once. Recovery
    // trade documented at pageRank's checkpoint.
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .localCheckpoint()
    def propagate(rank: DataFrame, valCol: String, fromCol: String,
        toCol: String): DataFrame = {
      val raw = e
        .join(rank.select(col("id").as(fromCol), col(valCol).as("_v")),
          Seq(fromCol))
        .groupBy(col(toCol).as("id"))
        .agg(sum(round(col("_v"), 12).cast("decimal(26,12)")).as("_r"))
        .localCheckpoint()
      val total = raw.agg(sum("_r").as("_t"))
      ids.join(raw, Seq("id"), "left").crossJoin(broadcast(total))
        .select(col("id"),
          coalesce(col("_r").cast("double") / col("_t").cast("double"),
            lit(0.0)).as(valCol))
        .localCheckpoint()
    }
    var hub = ids.withColumn("hub", lit(1.0) / lit(n))
    var auth = ids.withColumn("auth", lit(0.0))
    for (_ <- 1 to iters) {
      auth = propagate(hub, "hub", "_src", "_dst")
        .withColumnRenamed("hub", "auth")
      hub = propagate(auth, "auth", "_dst", "_src")
        .withColumnRenamed("auth", "hub")
    }
    ids.join(auth, "id").join(hub, "id").select("id", "auth", "hub")
  }

  /** Deterministic random walks — the graph-sampling primitive behind
    * node2vec/DeepWalk corpus generation, made REPRODUCIBLE: at step
    * `t` a walk started at `s` standing on node `v` moves to
    * out-neighbor number `md5_56(s:t) mod outdeg(v)` (neighbors ranked
    * by destination id). The md5-56 keep-set convention
    * ([[Corpus.sampleHash]]) means any engine can replay the exact
    * walks — the property that makes a sampled graph corpus auditable,
    * where a seeded RNG is engine- and partitioning-dependent.
    *
    * Scale shape: the ranked edge list (one window partitioned by
    * source) is built once; each step is one equi-join of the frontier
    * against it with the hash-index filter — work per step is
    * Σ outdeg over frontier nodes, walks never serialize through the
    * driver. Dead ends (no out-edges) terminate their walk. Returns
    * `(start, step, node)` including step 0.
    */
  def deterministicWalks(edges: DataFrame, srcCol: String, dstCol: String,
      starts: DataFrame, startCol: String, steps: Int): DataFrame = {
    require(steps >= 1 && steps <= 20,
      s"steps must be in [1, 20], got $steps")
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_src").orderBy("_dst")
    // r18 (guide §1.2): the ranked edge list was re-built (scan + window)
    // once per step per downstream reference, and each step's frontier is
    // referenced twice (next step's join + the output union) — cut both.
    // Recovery trade documented at pageRank's checkpoint.
    val ranked = e
      .withColumn("_rk", row_number().over(w).cast("long") - 1)
      .withColumn("_deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("_src")))
      .localCheckpoint()
    var cur = starts.select(col(startCol).as("start")).distinct()
      .withColumn("node", col("start"))
      .localCheckpoint()
    var acc = cur.withColumn("step", lit(0))
    for (t <- 1 to steps) {
      cur = cur
        .join(ranked.withColumnRenamed("_src", "node"), Seq("node"))
        .filter(col("_rk") === pmod(
          Corpus.sampleHash(concat(col("start").cast("string"),
            lit(s":$t"))), col("_deg")))
        .select(col("start"), col("_dst").as("node"))
        .localCheckpoint()
      acc = acc.unionByName(cur.withColumn("step", lit(t)))
    }
    acc
  }

  /** Degree distribution: how many nodes have each in/out-degree —
    * the first diagnostic run on any link graph (hub detection, skew
    * sizing for the joins above). Nodes with no edges count at degree
    * 0. Two hash aggregates (node-sized, then degree-sized).
    */
  def degreeDistribution(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, nodeCol: String,
      direction: String = "in"): DataFrame = {
    require(direction == "in" || direction == "out",
      s"direction must be 'in' or 'out', got $direction")
    val endpoint = if (direction == "in") dstCol else srcCol
    val perNode = edges.select(col(endpoint).as("id"))
      .groupBy("id").agg(count(lit(1)).as("_deg"))
    nodes.select(col(nodeCol).as("id"))
      .join(perNode, Seq("id"), "left")
      .select(coalesce(col("_deg"), lit(0L)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
      .orderBy("degree")
  }
}

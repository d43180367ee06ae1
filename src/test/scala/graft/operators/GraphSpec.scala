package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: uniform on a ring, mass conserved, hubs rank higher") {
    // ring: i → (i+1) mod 10. Uniform in-degree keeps the 1/n fixed
    // point through every iteration.
    val nodes = spark.range(10).select(col("id"))
    val ring = nodes.select(col("id").as("src"),
      pmod(col("id") + 1, lit(10)).as("dst"))
    val r = Graph.pageRank(ring, "src", "dst", nodes, "id", iters = 5)
      .as[(Long, Double)].collect().toMap
    r.values.foreach(v => assert(math.abs(v - 0.1) < 1e-12, r.toString))
    // no dangling nodes → total mass stays exactly 1 (up to fp noise)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)

    // star: 1..9 → 0, 0 → 1. The hub collects the mass; its sole
    // out-neighbor inherits most of it; the other leaves only ever get
    // the teleport floor (1-d)/n.
    val star = nodes.filter(col("id") > 0)
      .select(col("id").as("src"), lit(0L).as("dst"))
      .unionByName(Seq((0L, 1L)).toDF("src", "dst"))
    val sr = Graph.pageRank(star, "src", "dst", nodes, "id", iters = 5)
      .as[(Long, Double)].collect().toMap
    assert(sr(0L) > sr(1L) && sr(1L) > sr(2L), sr.toString)
    assert(sr(2L) == sr(9L), sr.toString) // symmetric leaves tie exactly
    assert(math.abs(sr.values.sum - 1.0) < 1e-9)

    // isolated node: appears in the output at the teleport floor
    val wide = spark.range(11).select(col("id"))
    val wr = Graph.pageRank(star, "src", "dst", wide, "id", iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(wr(10L) == (1.0 - 0.85) / 11.0, wr.toString)

    intercept[IllegalArgumentException] {
      Graph.pageRank(ring, "src", "dst", nodes, "id", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(ring, "src", "dst", nodes, "id", damping = 1.0)
    }
  }

  test("personalizedPageRank: mass stays on the topic's reachable set") {
    // two disconnected 2-cycles {0,1} and {2,3}; topic = {0}
    val nodes = spark.range(4).select(col("id"))
    val edges = Seq((0L, 1L), (1L, 0L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val r = Graph.personalizedPageRank(edges, "src", "dst", nodes, "id",
        col("id") === 0, iters = 6)
      .as[(Long, Double)].collect().toMap
    // the unreachable component holds EXACTLY zero mass
    assert(r(2L) == 0.0 && r(3L) == 0.0, r.toString)
    // no dangling nodes → total mass conserved at 1
    assert(math.abs(r.values.sum - 1.0) < 1e-9, r.toString)
    // the topic node keeps the teleport advantage over its neighbor
    assert(r(0L) > r(1L) && r(1L) > 0.0, r.toString)
    // uniform topic ≡ plain pageRank (the teleport vectors coincide)
    val ring = nodes.select(col("id").as("src"),
      pmod(col("id") + 1, lit(4)).as("dst"))
    val ppr = Graph.personalizedPageRank(ring, "src", "dst", nodes, "id",
        lit(true), iters = 4)
      .as[(Long, Double)].collect().toMap
    val pr = Graph.pageRank(ring, "src", "dst", nodes, "id", iters = 4)
      .as[(Long, Double)].collect().toMap
    assert(ppr == pr, s"$ppr vs $pr")
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, "src", "dst", nodes, "id",
        lit(false))
    }
  }

  test("shortestPaths: BFS settles first reach, bounded hops") {
    // chain 1→2→3→4→5 plus a shortcut 1→4
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
      .toDF("src", "dst")
    val src1 = Seq(1L).toDF("id")
    val d = Graph.shortestPaths(edges, "src", "dst", src1, "id", 10)
      .as[(Long, Long)].collect().toMap
    // the shortcut wins: 4 settles at hop 1, 5 at hop 2
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L))
    // hop bound truncates: node 5 unreached at maxHops=1
    val d1 = Graph.shortestPaths(edges, "src", "dst", src1, "id", 1)
      .as[(Long, Long)].collect().toMap
    assert(d1 == Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
    // multi-source: dist is the min over sources
    val d2 = Graph.shortestPaths(edges, "src", "dst",
        Seq(1L, 3L).toDF("id"), "id", 10)
      .as[(Long, Long)].collect().toMap
    assert(d2(4L) == 1L && d2(5L) == 2L && d2(3L) == 0L)
    intercept[IllegalArgumentException] {
      Graph.shortestPaths(edges, "src", "dst", src1, "id", 0)
    }
  }

  test("triangleCount: undirected simple semantics, skew-safe orientation") {
    // one triangle {1,2,3} + a pendant; duplicates, reversed direction
    // and a self-loop must not change the count
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (2L, 1L), (1L, 2L), (4L, 4L)).toDF("src", "dst")
    assert(Graph.triangleCount(edges, "src", "dst")
      .as[Long].collect().head == 1L)
    // hub star closes no triangles; adding one rim edge makes exactly 1
    val star = (1L to 8L).map(i => (0L, i)).toDF("src", "dst")
    assert(Graph.triangleCount(star, "src", "dst")
      .as[Long].collect().head == 0L)
    val starPlus = star.unionByName(Seq((3L, 7L)).toDF("src", "dst"))
    assert(Graph.triangleCount(starPlus, "src", "dst")
      .as[Long].collect().head == 1L)
    // K4 has 4 triangles
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("src", "dst")
    assert(Graph.triangleCount(k4, "src", "dst")
      .as[Long].collect().head == 4L)
  }

  test("hits: mutual reinforcement, L1 norms, pure roles stay pure") {
    // hubs {1,2,3} point at authorities {10,11}; 1 also covers 11
    val nodes = Seq(1L, 2L, 3L, 10L, 11L).toDF("id")
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L))
      .toDF("src", "dst")
    val r = Graph.hits(edges, "src", "dst", nodes, "id", iters = 1)
      .as[(Long, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    // auth: raw (3, 1)/4 → (0.75, 0.25); hubs have zero auth
    assert(math.abs(r(10L)._1 - 0.75) < 1e-9 &&
      math.abs(r(11L)._1 - 0.25) < 1e-9, r.toString)
    assert(r(1L)._1 == 0.0 && r(2L)._1 == 0.0)
    // hub: raw (1.0, 0.75, 0.75)/2.5 → (0.4, 0.3, 0.3); authorities 0
    assert(math.abs(r(1L)._2 - 0.4) < 1e-9 &&
      math.abs(r(2L)._2 - 0.3) < 1e-9 &&
      math.abs(r(3L)._2 - 0.3) < 1e-9, r.toString)
    assert(r(10L)._2 == 0.0 && r(11L)._2 == 0.0)
    // both L1 norms are 1
    assert(math.abs(r.values.map(_._1).sum - 1.0) < 1e-9)
    assert(math.abs(r.values.map(_._2).sum - 1.0) < 1e-9)
    intercept[IllegalArgumentException] {
      Graph.hits(edges, "src", "dst", nodes, "id", iters = 0)
    }
  }

  test("deterministicWalks: replayable trajectories, dead ends stop") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val starts = Seq(1L).toDF("id")
    def run() = Graph.deterministicWalks(edges, "src", "dst",
      starts, "id", 5).select("start", "step", "node")
      .as[(Long, Int, Long)].collect().toSet
    val w1 = run()
    assert(w1 == run(), "walks must replay identically")
    // step 0 is the start; at most one node per (walk, step)
    assert(w1.filter(_._2 == 0) == Set((1L, 0, 1L)))
    assert(w1.groupBy(_._2).forall(_._2.size == 1))
    // every hop follows a real edge
    val es = Set((1L, 2L), (1L, 3L), (2L, 4L), (4L, 1L))
    val path = w1.toSeq.sortBy(_._2).map(_._3)
    path.sliding(2).foreach {
      case Seq(a, b) => assert(es((a, b)), s"$a->$b not an edge")
      case _ =>
    }
    // a start with no out-edges yields only step 0
    assert(Graph.deterministicWalks(edges, "src", "dst",
        Seq(3L).toDF("id"), "id", 3).select("start", "step", "node")
      .as[(Long, Int, Long)].collect().toSet == Set((3L, 0, 3L)))
    intercept[IllegalArgumentException] {
      Graph.deterministicWalks(edges, "src", "dst", starts, "id", 0)
    }
  }

  test("degreeDistribution: zero-degree nodes counted, direction honored") {
    val nodes = spark.range(5).select(col("id"))
    val edges = Seq((0L, 1L), (2L, 1L), (3L, 1L), (0L, 2L))
      .toDF("src", "dst")
    val in = Graph.degreeDistribution(edges, "src", "dst", nodes, "id", "in")
      .as[(Long, Long)].collect().toMap
    // in-degrees: 1→3, 2→1, others 0
    assert(in == Map(0L -> 3L, 1L -> 1L, 3L -> 1L))
    val out = Graph.degreeDistribution(edges, "src", "dst", nodes, "id",
      "out").as[(Long, Long)].collect().toMap
    // out-degrees: 0→2, 2→1, 3→1, others 0
    assert(out == Map(0L -> 2L, 1L -> 2L, 2L -> 1L))
    intercept[IllegalArgumentException] {
      Graph.degreeDistribution(edges, "src", "dst", nodes, "id", "both")
    }
  }
}

package graft

import graft.operators.{ChangeLog, Graph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ranks(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iterations: Int): Map[Long, Long] = {
    val n = nodes.toDF("id")
    val e = edges.toDF("src", "dst")
    Graph.pageRank(n, col("id"), e, col("src"), col("dst"),
        iterations = iterations)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Driver-side replica of the integer recurrence. */
  private def refRanks(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iterations: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> 1000000L).toMap
    (1 to iterations).foreach { _ =>
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / deg(s) }.sum
      }
      r = nodes.map(v => v -> (150000L + 850L * in.getOrElse(v, 0L) / 1000L)).toMap
    }
    r
  }

  test("matches the integer recurrence on a 4-node cycle with a chord") {
    val nodes = Seq(0L, 1L, 2L, 3L)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L))
    (1 to 3).foreach { it =>
      assert(ranks(nodes, edges, it) == refRanks(nodes, edges, it),
        s"iteration $it")
    }
  }

  test("star graph: hub collects followers' mass, leaves get only base") {
    val nodes = (0L to 5L)
    val edges = (1L to 5L).map(i => (i, 0L))
    val out = ranks(nodes, edges, 5)
    assert(out == refRanks(nodes, edges, 5))
    // every leaf has no inbound: exactly the base rank
    (1L to 5L).foreach(l => assert(out(l) == 150000L))
    assert(out(0L) > out(1L))
  }

  test("parallel edges contribute once per edge; dangling mass leaks") {
    val nodes = Seq(0L, 1L, 2L)
    // two parallel 0→1 edges and a dangling node 2 (no out-edges)
    val edges = Seq((0L, 1L), (0L, 1L), (2L, 1L))
    val out = ranks(nodes, edges, 1)
    assert(out == refRanks(nodes, edges, 1))
    // node 1 receives both halves of 0's rank plus all of 2's
    assert(out(1L) == 150000L + 850L * (500000L + 500000L + 1000000L) / 1000L)
  }

  test("compact kernel is bit-identical to the distributed loop " +
      "(compactEdgeLimit = 0 forces the loop): weights, unknown " +
      "endpoints, dangling and isolated nodes") {
    // 9 isolated, (0,99)/(99,1) touch unknown id 99 — but (0,99) still
    // counts toward 0's outdegree in BOTH paths (degree is computed on
    // the unfiltered edge list; the contribution itself is dropped)
    val nodes = ((0L to 4L) :+ 9L).toDF("id")
    val edges = Seq((0L, 1L, 2L), (0L, 2L, 1L), (1L, 2L, 3L), (2L, 3L, 1L),
      (3L, 0L, 1L), (0L, 99L, 5L), (99L, 1L, 7L), (4L, 0L, 1L))
      .toDF("src", "dst", "w")
    (1 to 4).foreach { it =>
      def run(limit: Long): Map[Long, Long] =
        Graph.pageRankWeighted(nodes, col("id"), edges, col("src"),
            col("dst"), col("w"), iterations = it, compactEdgeLimit = limit)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(run(4000000L) == run(0L), s"iteration $it")
    }
  }

  test("invalid parameters rejected") {
    val n = Seq(1L).toDF("id")
    val e = Seq((1L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.pageRank(n, col("id"), e, col("src"), col("dst"), iterations = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(n, col("id"), e, col("src"), col("dst"),
        dampingPerMille = 1500)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(n, col("id"), e, col("src"), col("dst"), scale = 999L)
    }
  }

  test("scd2 builds adjacent intervals with one open current row per key") {
    val rows = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 15L, "x")).toDF("k", "v", "attr")
    val out = ChangeLog.scd2(rows, Seq(col("k")), Seq(col("v")))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
    val k1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(k1.map(_._3) sameElements Array(Some(20L), Some(30L), None))
    assert(k1.map(_._4) sameElements Array(false, false, true))
    val k2 = out.filter(_._1 == 2L)
    assert(k2.length == 1 && k2(0)._3.isEmpty && k2(0)._4)
  }

  test("scd2 tiebreak column makes colliding timestamps deterministic") {
    val rows = Seq((1L, 10L, 100L), (1L, 10L, 101L)).toDF("k", "v", "seq")
    val out = ChangeLog.scd2(rows, Seq(col("k")), Seq(col("v"), col("seq")))
      .orderBy(col("seq"))
      .collect()
    assert(!out(0).getBoolean(5) && out(1).getBoolean(5))
  }

  // ---- label propagation ----------------------------------------------------

  private def lpa(nodes: Seq[Long], edges: Seq[(Long, Long)], rounds: Int) =
    Graph.labelPropagation(nodes.toDF("id"), col("id"),
        edges.toDF("src", "dst"), col("src"), col("dst"), rounds)
      .as[(Long, Long)].collect().toMap

  test("labelPropagation: two cliques bridged by one edge keep two communities") {
    val cliqueA = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val cliqueB = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    val r = lpa((0L to 3L) ++ (10L to 13L), cliqueA ++ cliqueB :+ (3L, 10L), 3)
    // min label dominates each clique
    assert((0L to 3L).map(r).toSet == Set(0L))
    assert((10L to 13L).map(r).toSet == Set(10L))
  }

  test("labelPropagation: isolated nodes keep their own label; ties -> min") {
    val r = lpa(Seq(1L, 2L, 3L, 99L), Seq((1L, 2L), (2L, 3L)), 1)
    assert(r(99L) == 99L)
    // path 1-2-3 after ONE synchronous round: node 2 sees {1,3} tie ->
    // adopts 1 (later rounds legitimately oscillate on path graphs —
    // the known synchronous-LPA behavior; the fixed round count keeps
    // it deterministic either way)
    assert(r(2L) == 1L)
    assert(r(1L) == 2L && r(3L) == 2L)
  }

  test("labelPropagation compact kernel is bit-identical to the " +
      "distributed loop, unknown endpoints and isolates included") {
    val rnd = new scala.util.Random(11)
    val nodes = (0L to 40L) :+ 77L // 77 isolated
    val edges = (1 to 120).map(_ =>
      (rnd.nextInt(45).toLong, rnd.nextInt(45).toLong)) // ids 41-44 unknown
    (1 to 3).foreach { it =>
      def run(limit: Long): Map[Long, Long] =
        Graph.labelPropagation(nodes.toDF("id"), col("id"),
            edges.toDF("src", "dst"), col("src"), col("dst"), it,
            compactEdgeLimit = limit)
          .as[(Long, Long)].collect().toMap
      assert(run(4000000L) == run(0L), s"rounds $it")
    }
  }

  // ---- triangle counting ----------------------------------------------------

  private def triCounts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCount(edges.toDF("src", "dst"), col("src"), col("dst"))
      .as[(Long, Long)].collect().toMap

  test("triangleCount: K4 has 4 triangles, every vertex in 3") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val r = triCounts(k4)
    assert(r == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangleCount: paths and stars have none; self-loops/dups ignored") {
    assert(triCounts(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    assert(triCounts(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))).isEmpty)
    // duplicate edges (both directions) + a self-loop must not create
    // or multiply triangles
    val r = triCounts(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L),
      (1L, 2L)))
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCount: matches brute-force enumeration on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 300).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val adj = canon.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var brute = Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (u, v) <- canon
      w <- adj.getOrElse(v, Set.empty)
      if canon.contains((u, w))
    } {
      brute = brute.updated(u, brute(u) + 1).updated(v, brute(v) + 1)
        .updated(w, brute(w) + 1)
    }
    val r = triCounts(edges)
    assert(r == brute.filter(_._2 > 0).toMap)
    assert(r.values.sum % 3 == 0)
  }
}

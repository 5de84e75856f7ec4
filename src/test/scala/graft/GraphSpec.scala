package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val U = 1000000000000L

  test("hashLinks: exactly outDeg links per node, targets on real " +
      "nodes, gapped id space raises loudly") {
    val nodes = spark.range(0, 100).toDF("node")
    val e = Graph.hashLinks(nodes, "spec-pr", 3)
    val deg = e.groupBy("src").count().collect()
    assert(deg.length == 100 && deg.forall(_.getLong(1) == 3L))
    val bounds = e.agg(min("dst"), max("dst")).collect()(0)
    assert(bounds.getLong(0) >= 0L && bounds.getLong(1) <= 99L)
    val gapped = Seq(0L, 1L, 5L).toDF("node")
    val ex = intercept[Exception] {
      Graph.hashLinks(gapped, "spec-pr", 3).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("contiguous"))
  }

  test("pageRank: 2-cycle is uniform and conserves mass to the floor " +
      "leak; a pointed-at node outranks its pointer") {
    // 0 <-> 1: symmetric, so both ranks stay unit/2 at every round
    val cyc = Graph.pageRank(Seq(0L, 1L).toDF("node"),
      Seq((0L, 1L), (1L, 0L)).toDF("src", "dst"), iters = 10)
    val rs = cyc.orderBy("node").collect()
    assert(rs(0).getLong(2) == rs(1).getLong(2))
    assert(rs(0).getLong(2) == U / 2)
    // 0 -> 2, 1 -> 2, 2 -> 2: node 2 accumulates
    val star = Graph.pageRank(Seq(0L, 1L, 2L).toDF("node"),
      Seq((0L, 2L), (1L, 2L), (2L, 2L)).toDF("src", "dst"), iters = 10)
      .orderBy("node").collect()
    assert(star(2).getLong(2) > star(0).getLong(2))
    assert(star(0).getLong(2) == star(1).getLong(2))
    assert(star(2).getLong(1) == 3L && star(0).getLong(1) == 0L)
    // total mass stays within the documented floor leak
    // (≤ a few micro-units per node per round)
    val tot = star.map(_.getLong(2)).sum
    assert(tot <= U && tot >= U - 10L * 3L * 4L)
  }

  test("pageRank: dangling mass redistributes — a sink's rank flows " +
      "back instead of vanishing") {
    // 0 -> 1, 1 is dangling: without redistribution node 0's rank
    // collapses to (1-d)/N; with it, 1's mass returns to both nodes
    val r = Graph.pageRank(Seq(0L, 1L).toDF("node"),
        Seq((0L, 1L)).toDF("src", "dst"), iters = 40)
      .orderBy("node").collect()
    val r0 = r(0).getLong(2)
    val r1 = r(1).getLong(2)
    // fixed point with redistribution: r0 = 0.075 + 0.425·r1 and
    // r0 + r1 = 1 -> r0 = 0.5/1.425 ≈ 0.3509, r1 ≈ 0.6491 (mass
    // conserved to the floor leak); without the dangling arm r0 would
    // collapse toward 0.075
    assert(r1 > r0, "sink keeps its inflow")
    assert(math.abs(r0.toDouble / U - 0.3509) < 0.01)
    assert(math.abs(r1.toDouble / U - 0.6491) < 0.01)
  }

  test("pageRank is partitioning-invariant: integer sums mean any " +
      "layout gives the bit-identical rank frame") {
    val nodes = spark.range(0, 60).toDF("node")
    val edges = Graph.hashLinks(nodes, "spec-inv", 3).localCheckpoint()
    val a = Graph.pageRank(nodes.repartition(1), edges.repartition(1),
      iters = 5).orderBy("node").collect().toSeq
    val b = Graph.pageRank(nodes.repartition(7),
      edges.repartition(13), iters = 5).orderBy("node").collect().toSeq
    assert(a == b)
  }

  test("pageRank: knob guards raise on bad damping/iters/unit") {
    val n = Seq(0L).toDF("node")
    val e = Seq((0L, 0L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.pageRank(n, e, iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(n, e, iters = 5, dampNum = 20, dampDen = 20)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(n, e, iters = 5, unit = 100L)
    }
  }

  test("hits: pure hub and pure authority separate exactly; L1 " +
      "normalization keeps each side summing to ~unit") {
    // 0 -> 1, 0 -> 2: node 0 is the only hub, 1/2 split authority
    val r = Graph.hits(Seq(0L, 1L, 2L).toDF("node"),
        Seq((0L, 1L), (0L, 2L)).toDF("src", "dst"), iters = 5)
      .orderBy("node").collect()
    assert(r(0).getLong(1) == 0L, "pure hub has no authority")
    assert(r(0).getLong(2) == U, "the only hub takes the whole L1 mass")
    assert(r(1).getLong(1) == U / 2 && r(2).getLong(1) == U / 2)
    assert(r(1).getLong(2) == 0L && r(2).getLong(2) == 0L)
  }

  test("hits: partitioning-invariant and loud on an edgeless graph") {
    val nodes = spark.range(0, 60).toDF("node")
    val edges = Graph.hashLinks(nodes, "spec-hits", 3).localCheckpoint()
    val a = Graph.hits(nodes.repartition(1), edges.repartition(1),
      iters = 4).orderBy("node").collect().toSeq
    val b = Graph.hits(nodes.repartition(7), edges.repartition(13),
      iters = 4).orderBy("node").collect().toSeq
    assert(a == b)
    val ex = intercept[Exception] {
      Graph.hits(Seq(0L, 1L).toDF("node"),
        Seq.empty[(Long, Long)].toDF("src", "dst"), iters = 3).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("no"),
      s"edgeless graph must raise: ${ex.getMessage}")
  }

  test("personalizedPageRank: trust does not leak — nodes unreachable " +
      "from the seeds read exactly 0; empty seed set raises") {
    // 0 <-> 1 cycle, 2 -> 1 from outside; seed = {0}: node 2 has no
    // in-path from the seed, so its trust is EXACTLY zero
    val r = Graph.personalizedPageRank(
        Seq(0L, 1L, 2L).toDF("node"),
        Seq((0L, 1L), (1L, 0L), (2L, 1L)).toDF("src", "dst"),
        seed = col("node") === 0L, iters = 10)
      .orderBy("node").collect()
    assert(r(2).getLong(2) == 0L, "unreachable node must hold 0 trust")
    assert(r(0).getLong(2) > 0L && r(1).getLong(2) > 0L)
    assert(r(0).getAs[Long]("is_seed") == 1L &&
      r(2).getAs[Long]("is_seed") == 0L)
    val ex = intercept[Exception] {
      Graph.personalizedPageRank(Seq(0L, 1L).toDF("node"),
        Seq((0L, 1L)).toDF("src", "dst"),
        seed = lit(false), iters = 3).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("empty seed"))
  }

  test("personalizedPageRank: dangling mass returns to the seeds — " +
      "the hand-computed 2-node fixed point") {
    // 0 -> 1 (1 dangling), seed {0}: r0 = 0.15 + 0.85·r1,
    // r1 = 0.85·r0 -> r0 = 0.15/(1 − 0.7225) ≈ 0.5405, r1 ≈ 0.4595
    val r = Graph.personalizedPageRank(Seq(0L, 1L).toDF("node"),
        Seq((0L, 1L)).toDF("src", "dst"),
        seed = col("node") === 0L, iters = 40)
      .orderBy("node").collect()
    assert(math.abs(r(0).getLong(2).toDouble / U - 0.5405) < 0.01)
    assert(math.abs(r(1).getLong(2).toDouble / U - 0.4595) < 0.01)
  }

  test("personalizedPageRank is partitioning-invariant (integer sums)") {
    val nodes = spark.range(0, 60).toDF("node")
    val edges = Graph.hashLinks(nodes, "spec-tr", 3).localCheckpoint()
    val a = Graph.personalizedPageRank(nodes.repartition(1),
        edges.repartition(1), seed = col("node") % 5 === 0, iters = 5)
      .orderBy("node").collect().toSeq
    val b = Graph.personalizedPageRank(nodes.repartition(7),
        edges.repartition(13), seed = col("node") % 5 === 0, iters = 5)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }

  test("plan: g01's per-round in-sums map-side combine; no cartesian, " +
      "no window — the only nested loops are the declared 1-row " +
      "scalar zips") {
    val p = SparkEntry.queries("g01_pagerank")(spark, TestSpark.sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial"), "in-degree count must map-side combine")
  }
}

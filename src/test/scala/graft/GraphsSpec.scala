package graft

import graft.operators.Graphs

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference PageRank on the driver, same quantization-free math
    * shape (plain doubles; the 1e-18 decimal rounding inside the
    * operator is below the comparison tolerance here).
    */
  private def refPageRank(
      verts: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int, d: Double): Map[Long, Double] = {
    val n = verts.size
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var pr = verts.map(v => v -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = verts.filterNot(out.contains).map(pr).sum
      val inflow = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => pr(s) / out(s) }.sum).toMap
      pr = verts.map(v => v ->
        ((1.0 - d) / n + d * (inflow.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    pr
  }

  test("pageRank: star + dangling sink matches driver-side reference") {
    // 1 -> {2,3,4}; 2 -> 1; 3,4 dangling; 5 isolated
    val verts = Seq(1L, 2L, 3L, 4L, 5L)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L))
    val got = Graphs.pageRank(
      verts.toDF("id"), "id", edges.toDF("s", "d"), "s", "d",
      iters = 3, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPageRank(verts, edges, 3, 0.85)
    verts.foreach { v =>
      assert(math.abs(got(v) - want(v)) < 1e-12, s"vertex $v: ${got(v)} vs ${want(v)}")
    }
    // probability mass is conserved by the teleport correction
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("pageRank: symmetric cycle is uniform; hub outranks leaves") {
    val cycleV = Seq(1L, 2L, 3L)
    val cycleE = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val uniform = Graphs.pageRank(
      cycleV.toDF("id"), "id", cycleE.toDF("s", "d"), "s", "d", iters = 4)
      .collect().map(_.getDouble(1))
    assert(uniform.forall(p => math.abs(p - 1.0 / 3) < 1e-12))

    // leaves all point at the hub: hub must outrank every leaf
    val hubV = Seq(1L, 2L, 3L, 4L)
    val hubE = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L))
    val ranks = Graphs.pageRank(
      hubV.toDF("id"), "id", hubE.toDF("s", "d"), "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks(1L) > ranks(3L) && ranks(1L) > ranks(4L))
  }

  test("pageRank: edges referencing unknown vertices contribute nothing") {
    val got = Graphs.pageRank(
      Seq(1L, 2L).toDF("id"), "id",
      Seq((1L, 2L), (9L, 1L), (2L, 9L)).toDF("s", "d"), "s", "d", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === Set(1L, 2L))
    // vertex 9's phantom inflow never lands; both prs stay finite, positive
    assert(got.values.forall(p => p > 0 && p < 1))
  }

  test("pageRank rejects bad arguments") {
    val v = Seq(1L).toDF("id"); val e = Seq((1L, 1L)).toDF("s", "d")
    intercept[IllegalArgumentException] {
      Graphs.pageRank(v, "id", e, "s", "d", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graphs.pageRank(v, "id", e, "s", "d", damping = 1.0)
    }
  }

  test("triangleStats: clique closes, pendant doesn't; dup/reversed/self edges tolerated") {
    val verts = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    // triangle 1-2-3, pendant 4 off 3, isolated 5; plus a reversed
    // duplicate of (1,2) and a self-loop that must both be ignored
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 1L), (4L, 4L))
      .toDF("s", "d")
    val got = Graphs.triangleStats(verts, "id", edges, "s", "d")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got(1L) === ((2L, 1L, Some(1.0))))
    assert(got(2L) === ((2L, 1L, Some(1.0))))
    assert(got(3L) === ((3L, 1L, Some(1.0 / 3))))
    assert(got(4L) === ((1L, 0L, None)))
    assert(got(5L) === ((0L, 0L, None)))
  }

  test("kCore: chain peels off in cascading rounds, clique survives") {
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    // triangle 1-2-3 with a chain 3-4-5 hanging off; isolated 6.
    // round 1 peels 5 (deg 1), round 2 peels the now-light 4 —
    // cascading removal is exactly what one-shot degree filtering gets
    // wrong, so this pins the iteration.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    val got = Graphs.kCore(verts, "id", edges, "s", "d", k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got(1L) === ((2L, true)))
    assert(got(2L) === ((2L, true)))
    assert(got(3L) === ((2L, true)))
    assert(got(4L) === ((0L, false)))
    assert(got(5L) === ((0L, false)))
    assert(got(6L) === ((0L, false)))
  }

  test("snapshotDiff labels added / removed / changed / unchanged") {
    val oldDf = Seq(
      (1L, "alpha beta"), (2L, "gamma"), (3L, "delta")).toDF("doc_id", "text")
    val newDf = Seq(
      (1L, "  ALPHA   beta "), // normalizes to the same fingerprint
      (3L, "delta prime"),     // changed
      (9L, "epsilon")          // added
    ).toDF("doc_id", "text")
    val got = Graphs.snapshotDiff(oldDf, newDf, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      1L -> "unchanged", 2L -> "removed", 3L -> "changed", 9L -> "added"))
  }

  test("hits: the authority pointed to by every hub dominates, scores " +
    "are L1-normalized per side, duplicate edges collapse") {
    import spark.implicits._
    // hubs 1,2,3 all point to auth 10; only 1 points to 11
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L), (1L, 10L))
      .toDF("s", "d")
    val out = Graphs.hits(edges, "s", "d", iters = 2).collect()
    val auths = out.filter(_.getString(1) == "auth")
      .map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    val hubs = out.filter(_.getString(1) == "hub")
      .map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    assert(auths(10L) > auths(11L))
    assert(math.abs(auths.values.sum - 1.0) < 1e-8)
    assert(math.abs(hubs.values.sum - 1.0) < 1e-8)
    // hub 1 points at both auths -> strictly strongest hub
    assert(hubs(1L) > hubs(2L) && math.abs(hubs(2L) - hubs(3L)) < 1e-12)
  }

  test("louvainOneLevel: two bridged triangles resolve to the triangle " +
    "communities and beat flood-seeded label propagation on modularity") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // triangles {1,2,3} and {4,5,6}, bridge 3-4
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("id_a", "id_b")
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id") // 7 isolated
    val louvain = Graphs.louvainOneLevel(verts, "id", edges, rounds = 4)
    val comm = louvain.collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("community")).toMap
    assert(Set(comm(1L), comm(2L), comm(3L)).size === 1)
    assert(Set(comm(4L), comm(5L), comm(6L)).size === 1)
    assert(comm(1L) !== comm(4L))
    assert(comm(7L) === 7L) // isolated vertex keeps its singleton

    // label propagation with a single seed floods one label over the
    // whole connected component -> Q = 0; Louvain's triangles score > 0
    val lp = Graphs.labelPropagation(
      verts.withColumn("seed", when(col("id") === 1L, lit("a"))),
      "id", "seed", edges, "id_a", "id_b", rounds = 4)
    def q(assign: org.apache.spark.sql.DataFrame, c: String): Double =
      Graphs.modularity(assign, "id", c, edges)
        .head.getAs[Double]("q_modularity")
    val qLouvain = q(louvain, "community")
    val qLp = q(lp, "label")
    assert(qLouvain > qLp)
    assert(qLouvain > 0.0)
  }

  test("louvainOneLevelWeighted: unit weights reproduce the unweighted " +
    "pass; a heavy edge wins the move") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("id_a", "id_b")
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    def comm(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getAs[Long]("community")).toMap
    assert(comm(Graphs.louvainOneLevelWeighted(verts, "id",
        edges.withColumn("weight", lit(1L)), rounds = 4))
      === comm(Graphs.louvainOneLevel(verts, "id", edges, rounds = 4)))
    // path 1-2-3: vertex 2 (parity round 1) follows the heavy side
    val heavyLeft = Seq((1L, 2L, 10L), (2L, 3L, 1L))
      .toDF("id_a", "id_b", "weight")
    val p = Seq(1L, 2L, 3L).toDF("id")
    assert(comm(Graphs.louvainOneLevelWeighted(p, "id", heavyLeft, 1))(2L)
      === 1L)
    val heavyRight = Seq((1L, 2L, 1L), (2L, 3L, 10L))
      .toDF("id_a", "id_b", "weight")
    assert(comm(Graphs.louvainOneLevelWeighted(p, "id", heavyRight, 1))(2L)
      === 3L)
  }

  test("coarsenByCommunity: intra edges fold to self-loops, inter " +
    "edges sum to weighted super-edges") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L), (2L, 5L)).toDF("id_a", "id_b")
    val assign = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("id", "community")
    val got = Graphs.coarsenByCommunity(assign, "id", "community", edges)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("weight"))).toSet
    assert(got === Set((1L, 1L, 3L), (4L, 4L, 3L), (1L, 4L, 2L)))
  }

  test("louvainTwoLevel: the coarse pass merges stuck communities, " +
    "never loses modularity, and refines level 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Ring of 10 triangles linked by single edges — the Fortunato &
    // Barthelemy resolution-limit construction: m = 40, so with 10 >
    // sqrt(2m) cliques the modularity OPTIMUM groups ADJACENT PAIRS
    // of triangles (Q = 0.675) over single triangles (Q = 0.65), yet
    // no single vertex profits from crossing a link — a one-level
    // ascent is provably stuck at triangles. Only the coarse pass,
    // where whole triangles move as one, reaches the pairing.
    val edges = ((0 until 10).flatMap { i =>
      val (a, b, c) = (3L * i + 1, 3L * i + 2, 3L * i + 3)
      Seq((a, b), (a, c), (b, c), (c, (3L * (i + 1)) % 30 + 1))
    }).map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .toDF("id_a", "id_b")
    val verts = (1L to 30L).toDF("id")
    val l1 = Graphs.louvainOneLevel(verts, "id", edges, rounds = 4)
    val l2 = Graphs.louvainTwoLevel(verts, "id", edges,
      rounds1 = 4, rounds2 = 2)
    def q(a: org.apache.spark.sql.DataFrame): Double =
      Graphs.modularity(a, "id", "community", edges)
        .head.getAs[Double]("q_modularity")
    val (q1, q2) = (q(l1), q(l2))
    assert(q2 >= q1)
    assert(q2 > 0.0)
    // refinement invariant: every level-1 community lands WHOLLY in
    // one final community (level 2 merges, never splits)
    val joined = l1.withColumnRenamed("community", "c1")
      .join(l2.withColumnRenamed("community", "c2"), "id")
    assert(joined.groupBy("c1")
      .agg(countDistinct(col("c2")).as("k"))
      .filter(col("k") > 1).count() === 0)
    // and the coarse pass actually merged something on this fixture
    assert(l2.select("community").distinct().count()
      < l1.select("community").distinct().count())
  }

  test("louvainLevels: a 3-tier hierarchy climbs one tier per level, " +
    "levels=2 equals louvainTwoLevel, Q non-decreasing, fixpoint " +
    "stops early") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 20 "villages" in a ring; each village = 2 triangles joined by 2
    // edges; adjacent villages joined by 1 edge. m = 180. Level 1
    // finds triangles; at level 2 the village partner strictly
    // dominates (gain 4m*2 - 2*9*9 = 1278 vs 558 across the ring), so
    // villages form; at level 3 adjacent villages merge (gain
    // 4m*1 - 2*18*18 = 72 > 0); at level 4 village-pairs cannot merge
    // (4m*1 - 2*36*36 < 0) — a genuine three-tier hierarchy.
    val V = 20
    val edges = (0 until V).flatMap { v =>
      val b = 6L * v
      Seq((b + 1, b + 2), (b + 1, b + 3), (b + 2, b + 3),
        (b + 4, b + 5), (b + 4, b + 6), (b + 5, b + 6),
        (b + 1, b + 4), (b + 2, b + 5),
        (b + 6, 6L * ((v + 1) % V) + 3))
    }.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .toDF("id_a", "id_b")
    val verts = (1L to 6L * V).toDF("id")

    def comm(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def q(a: org.apache.spark.sql.DataFrame): Double =
      Graphs.modularity(a, "id", "community", edges)
        .head.getAs[Double]("q_modularity")
    def nComm(m: Map[Long, Long]): Int = m.values.toSet.size

    // rounds2 = 1 so each LEVEL climbs exactly one tier (merge rounds
    // re-aggregate labels, so extra rounds inside one level can climb
    // tiers too — the level split buys the same climb on a coarsened,
    // community-sized graph instead)
    val two = Graphs.louvainTwoLevel(verts, "id", edges,
      rounds1 = 4, rounds2 = 1)
    val lv2 = Graphs.louvainLevels(verts, "id", edges,
      rounds1 = 4, rounds2 = 1, levels = 2)
    assert(comm(lv2) === comm(two)) // levels=2 IS the two-level op

    val lv3 = Graphs.louvainLevels(verts, "id", edges,
      rounds1 = 4, rounds2 = 1, levels = 3)
    assert(q(lv3) > q(lv2)) // the third tier is a real climb
    assert(nComm(comm(lv3)) < nComm(comm(lv2)))
    // refinement: level-2 communities land WHOLLY inside level-3 ones
    val joined = lv2.withColumnRenamed("community", "c2")
      .join(lv3.withColumnRenamed("community", "c3"), "id")
    assert(joined.groupBy("c2")
      .agg(countDistinct(col("c3")).as("k"))
      .filter(col("k") > 1).count() === 0)
    // the fourth level only rises (mutual merges are positive-gain)
    val lv4 = Graphs.louvainLevels(verts, "id", edges,
      rounds1 = 4, rounds2 = 1, levels = 4)
    assert(q(lv4) >= q(lv3))

    // fixpoint early stop: two triangles over one bridge — merging
    // them LOSES modularity (4m*1 - 2*7*7 < 0 at m = 7), so level 2
    // merges nothing and every deeper level is provably identical
    val tiny = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("id_a", "id_b")
    val tinyV = (1L to 6L).toDF("id")
    val t2 = comm(Graphs.louvainLevels(tinyV, "id", tiny, 4, 1, 2))
    val t4 = comm(Graphs.louvainLevels(tinyV, "id", tiny, 4, 1, 4))
    assert(t4 === t2)
    assert(t2.values.toSet.size === 2) // the two triangles survive

    intercept[IllegalArgumentException] {
      Graphs.louvainLevels(verts, "id", edges, 4, 2, levels = 5)
    }
  }

  test("coarsenWeightedByCommunity: weights SUM through the mapping " +
    "and intra edges fold to self-loops") {
    import spark.implicits._
    val weighted = Seq((1L, 2L, 5L), (1L, 3L, 2L), (2L, 3L, 1L),
      (3L, 4L, 7L)).toDF("id_a", "id_b", "weight")
    val assign = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L))
      .toDF("sv", "community")
    val got = Graphs.coarsenWeightedByCommunity(
      assign, "sv", "community", weighted)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("weight"))).toSet
    assert(got === Set((1L, 1L, 5L), (1L, 3L, 3L), (3L, 3L, 7L)))
  }

  test("modularityWeighted: unit weights reproduce modularity, and " +
    "coarsening is Q-lossless for the same partition") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("id_a", "id_b")
    val assign = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("id", "community")
    val plain = Graphs.modularity(assign, "id", "community", edges)
      .collect().head
    val unit = Graphs.modularityWeighted(assign, "id", "community",
        edges.withColumn("weight", lit(1L)))
      .collect().head
    assert(unit.getAs[Long]("m_weight") === plain.getAs[Long]("m_edges"))
    assert(unit.getAs[Long]("intra_weight")
      === plain.getAs[Long]("intra_edges"))
    assert(unit.getAs[Double]("q_modularity")
      === plain.getAs[Double]("q_modularity"))
    // Q-lossless coarsening: score the SAME partition on the coarse
    // graph (self-loops carry intra mass) — identical Q
    val coarse = Graphs.coarsenByCommunity(assign, "id", "community", edges)
    val ident = Seq((1L, 1L), (4L, 4L)).toDF("sv", "community")
    val onCoarse = Graphs.modularityWeighted(ident, "sv", "community",
      coarse).collect().head
    assert(onCoarse.getAs[Double]("q_modularity")
      === plain.getAs[Double]("q_modularity"))
    assert(onCoarse.getAs[Long]("m_weight")
      === plain.getAs[Long]("m_edges"))
    // and for a MERGED partition of the coarse graph vs the expanded
    // partition on the original graph
    val mergedCoarse = Seq((1L, 1L), (4L, 1L)).toDF("sv", "community")
    val expanded = assign.withColumn("community", lit(1L))
    assert(Graphs.modularityWeighted(mergedCoarse, "sv", "community",
        coarse).collect().head.getAs[Double]("q_modularity")
      === Graphs.modularity(expanded, "id", "community", edges)
        .collect().head.getAs[Double]("q_modularity"))
  }

  test("personalizedPageRank: mass stays near the seeds, unreachable gets 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // s -> a -> b chain, plus an isolated island x -> y
    val edges = Seq(("s", "a"), ("a", "b"), ("x", "y")).toDF("src", "dst")
    val verts = Seq("s", "a", "b", "x", "y").toDF("id")
    val seeds = Seq("s").toDF("id")
    val ppr = Graphs.personalizedPageRank(verts, "id", seeds,
      edges, "src", "dst", iters = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the seed's component holds every unit of mass; b only receives
    // 0.85 of a's mass per round, so it trails a (no recycling enters b
    // directly — b's own mass teleports back to s as dangling mass)
    assert(ppr("s") > 0.0 && ppr("a") > 0.0 && ppr("b") > 0.0)
    assert(ppr("a") > ppr("b"))
    assert(ppr("x") === 0.0 && ppr("y") === 0.0) // never teleported to
    // all mass sums to ~1 (teleport + dangling both conserve)
    assert(math.abs(ppr.values.sum - 1.0) < 1e-9)
  }

  test("hashWalks: valid edges only, fixed shape, dead ends truncate") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("b", "a"), ("c", "d"))
      .toDF("src", "dst") // d is a dead end
    val tape = Graphs.hashWalks(edges, "src", "dst",
      walksPerNode = 2, steps = 3).collect()
    val byWalk = tape.groupBy(r => (r.getString(0), r.getLong(1)))
    // every walk starts at its start node on step 0
    byWalk.foreach { case ((start, _), rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.head.getLong(2) === 0L)
      assert(sorted.head.getString(3) === start)
      // steps are consecutive (a dead end truncates, never gaps)
      assert(sorted.map(_.getLong(2)).toSeq === (0L until sorted.length).toSeq)
      // every hop is a real edge
      val edgeSet = Set(("a", "b"), ("b", "c"), ("b", "a"), ("c", "d"))
      sorted.sliding(2).foreach {
        case Array(u, v) =>
          assert(edgeSet.contains((u.getString(3), v.getString(3))))
        case _ =>
      }
    }
    // walks from d emit only step 0; all 4 nodes x 2 walks present
    assert(byWalk.keys.map(_._1).toSet === Set("a", "b", "c", "d"))
    assert(byWalk.count { case ((s, _), rows) => s == "d" && rows.length == 1 } === 2)
    // deterministic: same call gives the identical tape
    val again = Graphs.hashWalks(edges, "src", "dst",
      walksPerNode = 2, steps = 3).collect()
    assert(tape.map(_.toSeq).toSet === again.map(_.toSeq).toSet)
  }

  test("hyperAnf: estimates track exact reachable pairs on a path graph") {
    import spark.implicits._
    // path 1-2-3-4-5-6 plus isolated 7, undirected
    val verts = (1L to 7L).toDF("id")
    val und = (1L to 5L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val got = Graphs.hyperAnf(verts, "id", und.toDF("s", "d"), "s", "d",
      maxT = 4, coverage = 0.9)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getBoolean(3))).sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(0, 1, 2, 3, 4))
    // exact neighborhood function of the fixture: sum over v of |B(v,t)|
    def ballSum(t: Int): Double = (1 to 6).map(v =>
      (1 to 6).count(u => math.abs(u - v) <= t)).sum.toDouble + 1.0 // +isolated 7
    got.foreach { case (t, nf, _, _) =>
      val exact = ballSum(t)
      assert(math.abs(nf - exact) / exact < 0.15,
        s"t=$t: est $nf vs exact $exact")
    }
    // curve is monotone non-decreasing and ratio(maxT) == 1 exactly
    got.sliding(2).foreach { case Array(a, b) => assert(a._2 <= b._2); case _ => }
    assert(got.last._3 === 1.0)
    // exactly one effective-diameter flag, at the first t with ratio >= 0.9
    assert(got.count(_._4) === 1)
    val wantEff = got.filter(_._3 >= 0.9).map(_._1).min
    assert(got.find(_._4).get._1 === wantEff)
    // determinism: hash registers, not rand()
    val again = Graphs.hyperAnf(verts, "id", und.toDF("s", "d"), "s", "d",
      maxT = 4, coverage = 0.9).collect().map(_.toSeq).toSet
    assert(again === got.map(g => Seq(g._1, g._2, g._3, g._4)).toSet)
  }

  test("hyperAnfCentrality: tracks exact harmonic centrality on a path") {
    import spark.implicits._
    // path 1-2-3-4-5-6 plus isolated 7
    val verts = (1L to 7L).toDF("id")
    val und = (1L to 5L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val maxT = 3
    val got = Graphs.hyperAnfCentrality(
      verts, "id", und.toDF("s", "d"), "s", "d", maxT)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def exactHc(v: Long): Double = (1L to 6L)
      .filter(u => u != v && math.abs(u - v) <= maxT)
      .map(u => 1.0 / math.abs(u - v)).sum
    (1L to 6L).foreach { v =>
      val want = exactHc(v)
      assert(math.abs(got(v) - want) / want < 0.2,
        s"vertex $v: est ${got(v)} vs exact $want")
    }
    // the isolated vertex's ball never grows: exactly zero
    assert(got(7L) === 0.0)
    // path interior outranks the endpoints
    assert(got(3L) > got(1L) && assertNonNeg(got))
  }

  private def assertNonNeg(hc: Map[Long, Double]): Boolean =
    hc.values.forall(_ >= 0.0)

  test("incrementalLouvain: batch endpoints move by full-graph gain, " +
    "untouched vertices never move, new vertices enter as singletons") {
    // frozen: two triangles {1,2,3} -> community 1, {4,5,6} -> 4
    val assign = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("id", "community")
    val oldE = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("id_a", "id_b")
    // batch: new vertex 7 attaches to the {4,5,6} triangle; new pair
    // (8, 9) arrives disconnected from everything
    val newE = Seq((7L, 4L), (7L, 5L), (8L, 9L)).toDF("id_a", "id_b")
    val got = Graphs.incrementalLouvain(assign, "id", oldE, newE,
      rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 7 joins community 4 (odd id: moves in round 2); 4 and 5 are
    // movable but their best community is still their own; 1,2,3,6
    // are untouched and keep labels; 8 (even: round 1) merges into
    // 9's singleton
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 4L, 8L -> 9L, 9L -> 9L))

    // restriction pinned: an untouched vertex stays even when the
    // batch makes a move attractive for its neighbors — bridge the
    // triangles with (3, 4): 3 and 4 may move, 1/2/5/6 may not
    val bridge = Seq((3L, 4L)).toDF("id_a", "id_b")
    val g2 = Graphs.incrementalLouvain(assign, "id", oldE, bridge,
      rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g2(1L) === 1L && g2(2L) === 1L)
    assert(g2(5L) === 4L && g2(6L) === 4L)
    assert(Set(1L, 4L).contains(g2(3L)) && Set(1L, 4L).contains(g2(4L)))
  }
}

package graft

import graft.operators.{Components, TextDedup}

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: chain, clique, isolated vertex") {
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    // path 1-2-3-4 (diameter 3, needs multiple rounds), clique 5-6, 7 alone
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Components.connectedComponents(vertices, edges, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("connectedComponents: long path converges within maxIter") {
    val n = 17
    val vertices = (1 to n).map(_.toLong).toDF("id")
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val got = Components.connectedComponents(vertices, edges, "id")
      .collect().map(_.getLong(1)).distinct
    assert(got.toSeq === Seq(1L))
  }

  test("connectedComponents: all-isolated vertices (no edges) label themselves") {
    val vertices = Seq(3L, 9L, 27L).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = Components.connectedComponents(vertices, edges, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(3L -> 3L, 9L -> 9L, 27L -> 27L))
  }

  test("Materialize.cut reliable mode requires a checkpoint dir") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    spark.conf.set(Materialize.ReliableKey, "true")
    try {
      val ex = intercept[IllegalArgumentException] {
        Materialize.cut(Seq(1L).toDF("id"))
      }
      assert(ex.getMessage.contains("setCheckpointDir"))
    } finally spark.conf.unset(Materialize.ReliableKey)
  }

  test("reliable checkpoint path: CC correct and checkpoint files written") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Materialize.ReliableKey, "true")
    try {
      val vertices = Seq(1L, 2L, 3L, 4L).toDF("id")
      val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
      val got = Components.connectedComponents(vertices, edges, "id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
      // the reliable path must actually have gone through checkpoint()
      // files, not executor blocks
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, "no checkpoint files written under the reliable path")
    } finally spark.conf.unset(Materialize.ReliableKey)
  }

  test("incremental dedup finds cross-batch pairs only") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different text with many unique words in this row"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "nothing like anything stored so far by any measure at all"))
      .toDF("doc_id", "text")
    val pairs = TextDedup.minhashNearDupPairsAgainst(
      corpus, incoming, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 100L)))
  }

  test("dedupClusters groups transitive near-dups under the min id") {
    val base = "one two three four five six seven eight nine ten " * 4
    val docs = Seq(
      (10L, base), (11L, base + "tail"), (12L, base),
      (20L, "entirely unrelated content goes here with distinct words " * 4))
      .toDF("doc_id", "text")
    val got = TextDedup.dedupClusters(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(10L) === 10L && got(11L) === 10L && got(12L) === 10L)
    assert(got(20L) === 20L)
  }

  test("incrementalComponents equals from-scratch CC on random edge splits") {
    val rnd = new scala.util.Random(43)
    (1 to 4).foreach { _ =>
      val n = 8 + rnd.nextInt(8)
      val all = (for {
        a <- 1L to n.toLong; b <- 1L to n.toLong
        if a < b && rnd.nextInt(5) == 0
      } yield (a, b)).toSeq
      // old world: edges among the first half's vertices; the rest arrive
      val half = n / 2
      val oldE = all.filter { case (a, b) => a <= half && b <= half }
      val newE = all.filterNot { case (a, b) => a <= half && b <= half }
      val oldVerts = (1L to half.toLong).toDF("id")
      val base = Components.connectedComponents(
        oldVerts, oldE.toDF("id_a", "id_b"), "id")
      val inc =
        if (newE.isEmpty) base
        else Components.incrementalComponents(
          base, newE.toDF("id_a", "id_b"), "id")
      // from-scratch over everything the incremental world has seen
      val seen = (1L to half.toLong) ++
        newE.flatMap(e => Seq(e._1, e._2))
      val full = Components.connectedComponents(
        seen.distinct.toDF("id"), all.toDF("id_a", "id_b"), "id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = inc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === full, s"n=$n old=${oldE.size} new=${newE.size}")
    }
  }

  test("incrementalComponents: a new vertex bridges two frozen components") {
    val base = Components.connectedComponents(
      Seq(1L, 2L, 3L, 4L).toDF("id"),
      Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b"), "id")
    val got = Components.incrementalComponents(
      base, Seq((2L, 9L), (9L, 3L)).toDF("id_a", "id_b"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // everything merges under the global min id, including the bridge
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 1L))
  }
}

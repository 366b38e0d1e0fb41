package graft

import graft.operators.TextDedup
import graft.pipeline.DocPipeline
import graft.sources.Tables

class DocPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("end-to-end corpus prep on real docs: audit monotone, output deduped") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val res = DocPipeline.run(docs, "text", "doc_id")
    val stages = res.audit.map(_._1)
    assert(stages === Seq("input", "quality", "language", "exact_dedup",
      "near_dedup", "chunks"))
    // doc counts never increase through the filter/dedup stages
    val docCounts = res.audit.take(5).map(_._2)
    assert(docCounts.zip(docCounts.tail).forall { case (a, b) => b <= a })
    assert(res.audit.last._2 > 0, "no chunks produced")
    // kept docs have no remaining near-dup pairs among themselves
    val residual = TextDedup.minhashNearDupPairs(
      res.keptDocs, "text", "doc_id").count()
    assert(residual === 0, s"$residual near-dup pairs survived dedup")
  }

  test("planted clones and junk are removed; clean doc chunks survive") {
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the quiet forest before the sun sets tonight"
    val df = Seq(
      (1L, good), (2L, good),                // exact dup of 1
      (3L, good + " extra trailing words"),  // near dup of 1
      (4L, "!!! ??? ... !!!"),               // junk: punctuation-heavy
      (5L, "der die das und ist nicht ein mit den zu wort"))  // German
      .toDF("doc_id", "text")
    val res = DocPipeline.run(df, "text", "doc_id")
    val keptIds = res.keptDocs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds === Set(1L))
    assert(res.chunks.count() > 0)
  }
}

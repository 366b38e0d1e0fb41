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

  test("runV2: yield shrinks monotonically; report totals match the corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val res = DocPipeline.runV2(docs, "text", "doc_id", "source",
      DocPipeline.DocPipelineV2Config(
        weights = Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2,
          "src3" -> 0.1)))
    assert(res.audit.map(_._1) === Seq("input", "quality", "repetition",
      "near_dedup_best", "mixture"))
    val counts = res.audit.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"audit not monotone: ${res.audit}")
    assert(counts.last > 0, "pipeline produced an empty corpus")
    // the report is exactly the final corpus re-aggregated
    val fromCorpus = res.corpus.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fromReport = res.report.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromReport === fromCorpus)
    // only weighted domains survive the mixture
    assert(fromReport.keySet.subsetOf(Set("src0", "src1", "src2", "src3")))
  }

  test("doc pipeline configs load from yaml; absent keys keep defaults") {
    val yaml = java.nio.file.Files.createTempFile("graft_doc", ".yaml")
    java.nio.file.Files.writeString(yaml,
      """v1:
        |  min_quality: 0.7
        |  langs: [en, de]
        |  chunk_size: 128
        |v2:
        |  max_top_token_frac: 0.2
        |  seed: 7
        |  weights:
        |    src0: 0.5
        |    src1: 0.5
        |v3:
        |  target_source: src2
        |  n_select: 40
        |  span_k: 4
        |""".stripMargin)
    val v1 = graft.sources.DocConfig.v1FromYaml(yaml.toString)
    assert(v1.minQuality === 0.7 && v1.langs === Set("en", "de") &&
      v1.chunkSize === 128)
    assert(v1.overlap === DocPipeline.DocPipelineConfig().overlap) // default kept
    val v2 = graft.sources.DocConfig.v2FromYaml(yaml.toString)
    assert(v2.maxTopTokenFrac === 0.2 && v2.seed === 7L &&
      v2.weights === Map("src0" -> 0.5, "src1" -> 0.5))
    assert(v2.minQuality === DocPipeline.DocPipelineV2Config().minQuality)
    val v3 = graft.sources.DocConfig.v3FromYaml(yaml.toString)
    assert(v3.targetSource === "src2" && v3.nSelect === 40 && v3.spanK === 4)
    assert(v3.minQuality === DocPipeline.DocPipelineV3Config().minQuality)
    // missing weights / target_source is an error, not a silent default
    val bare = java.nio.file.Files.createTempFile("graft_doc", ".yaml")
    java.nio.file.Files.writeString(bare, "v2:\n  seed: 1\nv3:\n  seed: 1\n")
    intercept[IllegalArgumentException] {
      graft.sources.DocConfig.v2FromYaml(bare.toString)
    }
    intercept[IllegalArgumentException] {
      graft.sources.DocConfig.v3FromYaml(bare.toString)
    }
    // the parsed config drives the real pipeline
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(100).localCheckpoint(true)
    val res = DocPipeline.runV2(docs, "text", "doc_id", "source", v2)
    assert(res.audit.head._1 === "input" && res.audit.head._2 === 100L)
  }

  test("runV3: scrub precedes quality, selection bounded by n, report matches corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .localCheckpoint(true)
    val res = DocPipeline.runV3(docs, "text", "doc_id", "source",
      DocPipeline.DocPipelineV3Config(nSelect = 60))
    val audit = res.audit.toMap
    assert(audit("scrubbed") === audit("input")) // scrub transforms, never drops
    assert(audit("quality") <= audit("scrubbed"))
    assert(audit("near_dedup_best") <= audit("quality"))
    assert(audit("selected") === math.min(60L, audit("near_dedup_best")))
    // report rows re-aggregate exactly to the selected corpus
    val fromCorpus = res.corpus.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fromReport = res.report.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromReport === fromCorpus)
    // selection is deterministic: same config, same membership
    val again = DocPipeline.runV3(docs, "text", "doc_id", "source",
      DocPipeline.DocPipelineV3Config(nSelect = 60))
    val a = res.corpus.select($"doc_id").collect().map(_.getLong(0)).toSet
    val b = again.corpus.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("incrementalScore: unchanged rows CARRY old scores (never recomputed), delta is fresh") {
    import graft.operators.TextAnalysis
    val oldDocs = Seq(
      (1L, "same text here ok"), (2L, "will change soon"),
      (3L, "gone away entirely")).toDF("doc_id", "text")
    val newDocs = Seq(
      (1L, "same text here ok"),        // unchanged
      (2L, "changed now really truly"), // changed
      (4L, "a fresh doc appended")      // added
    ).toDF("doc_id", "text")
    // sentinel old scores: if the operator recomputed an unchanged doc,
    // the 99.0 would be replaced by a real quality value
    val oldScores = Seq((1L, 99.0), (2L, 88.0), (3L, 77.0))
      .toDF("doc_id", "quality_score")
    val out = DocPipeline.incrementalScore(
      oldDocs, oldScores, newDocs, "doc_id", "text")(d =>
      TextAnalysis.qualityScore(d, "text")
        .select($"doc_id", $"quality_score"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(out.keySet === Set(1L, 2L, 4L)) // removed id 3 dropped
    assert(out(1L) === ((99.0, "unchanged"))) // carried sentinel, zero recompute
    assert(out(2L)._2 === "changed" && out(2L)._1 <= 1.0)
    assert(out(4L)._2 === "added" && out(4L)._1 <= 1.0)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Similarity}
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of known vectors") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 1.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val got = df.select(Similarity.cosine($"a", $"b")).collect().map(_.getDouble(0))
    assert(got(0) === 0.0)
    assert(got(1) === 1.0)
    assert(math.abs(got(2) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("cosineTopK: exact ordering on literal vectors") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = corpus.filter($"vec_id" === 1L)
    val got = Similarity.cosineTopK(corpus, q, "vec_id", "embedding", k = 3)
      .orderBy($"rank").collect().map(_.getLong(2))
    assert(got.toSeq === Seq(2L, 3L, 4L))
  }

  test("quantizeFixed: floor codes, clamped at the int8 edges") {
    val df = Seq(Array(0.5f, -0.5f, 0.9999f, -1.5f, 2.0f, 0.0f)).toDF("v")
    val got = df.select(Similarity.quantizeFixed($"v")).head.getSeq[Long](0)
    // 0.5*128=64; -0.5*128=-64; 0.9999*128=127.98->127; -1.5*128=-192->-128
    // (clamp); 2*128=256->127 (clamp); 0->0
    assert(got === Seq(64L, -64L, 127L, -128L, 127L, 0L))
  }

  test("QuantizedDotExpr agrees with the lambda fold; ragged and null-element cases") {
    import graft.functions.QuantizedDotExpr
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_quantized_dot",
      exprs => QuantizedDotExpr(exprs(0), exprs(1)), "scala_udf")
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](4L, 5L, 6L)),
      (Seq[java.lang.Long](-7L, 127L), Seq[java.lang.Long](3L, -128L)),
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](10L, 20L)), // ragged: shared prefix
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](5L, 7L, 11L)) // null elem -> 0
    ).toDF("a", "b")
    val got = df.select(call_function("graft_quantized_dot", $"a", $"b"))
      .collect().map(_.getLong(0))
    assert(got.toSeq === Seq(32L, -16277L, 50L, 38L))
    // fold reference on the dense rows
    val fold = df.limit(2).select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), (acc, v) => acc + v))
      .collect().map(_.getLong(0))
    assert(fold.toSeq === Seq(32L, -16277L))
  }

  test("quantizedTopK: integer dots rank like cosine on separated vectors") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = corpus.filter($"vec_id" === 1L)
    val got = Similarity.quantizedTopK(corpus, q, "vec_id", "embedding", k = 3)
      .orderBy($"rank").collect()
    assert(got.map(_.getLong(2)).toSeq === Seq(2L, 3L, 4L))
    // dot(q1, c2) with codes: 1.0->127 (clamped from 128), 0.9*128=115.2->115,
    // 0.1*128=12.8->12, so 127*115 + 0*12 = 14605 — exact integer scores
    assert(got(0).getLong(3) === 14605L)
  }

  test("LSH ANN recall vs brute force >= 0.6 on real embeddings") {
    val em = Tables.embeddings(spark, "/root/testdata/sf0.001").cache()
    val q = em.filter($"vec_id" < 10)
    val exact = Similarity.cosineTopK(em, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.lshCosineTopK(em, q, "vec_id", "embedding", 5,
      numBits = 8, bands = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("IVF ANN recall vs brute force >= 0.6 on real embeddings") {
    val em = Tables.embeddings(spark, "/root/testdata/sf0.001").cache()
    val q = em.filter($"vec_id" < 10)
    val exact = Similarity.cosineTopK(em, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfCosineTopK(em, q, "vec_id", "embedding", 5,
      nlist = 8, nprobe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("pqEncode/pqSearchTopK: per-sub argmin, ADC equals true dot on codebook-exact vectors") {
    // dim 4, subDim 2; entry 0 = (1,0,0,1), entry 1 = (0,1,1,0)
    val codebooks = Seq(
      (0, 0, Array(1.0f, 0.0f)), (1, 0, Array(0.0f, 1.0f)),
      (0, 1, Array(0.0f, 1.0f)), (1, 1, Array(1.0f, 0.0f)))
      .toDF("sub", "code", "cvec")
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
      (11L, Array(0.0f, 1.0f, 1.0f, 0.0f)),
      (12L, Array(1.0f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val codes = Similarity.pqEncode(corpus, "vec_id", "id", "embedding",
      codebooks, subDim = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // codebook-exact rows encode to their own entry; the mixed row picks
    // the nearest entry per sub independently
    assert(codes === Set((10L, 0, 0), (10L, 1, 0), (11L, 0, 1), (11L, 1, 1),
      (12L, 0, 0), (12L, 1, 1)))
    val queries = Seq((99L, Array(1.0f, 0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.pqSearchTopK(corpus, queries, "vec_id", "embedding",
      k = 3, codebooks = codebooks, subDim = 2)
      .orderBy($"rank").collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    // ADC score = dot(query, reconstruction); reconstructions here are the
    // exact vectors, so scores are the true dots: 2, 1, 0
    assert(got.toSeq === Seq((10L, 2.0), (12L, 1.0), (11L, 0.0)))
  }

  test("saveIndex/loadIndex: parquet round trip is exact and the " +
    "loaded index reproduces the built-index search bit-for-bit") {
    val em = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = em.filter($"vec_id" >= 8 && $"vec_id" < 16)
      .select(($"vec_id" - 8).cast("int").as("cell"),
        $"embedding".as("cvec"))
    val codebooks = em.filter($"vec_id" < 8)
      .select($"vec_id".cast("int").as("code"),
        explode(sequence(lit(0), lit(7))).as("sub"), $"embedding")
      .select($"sub", $"code",
        slice($"embedding", $"sub" * lit(8) + lit(1), lit(8)).as("cvec"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_ann_index").toString
    Similarity.saveIndex(centroids, codebooks, path)
    val (c2, cb2) = Similarity.loadIndex(spark, path)
    // content round trip: names/types and every row identical
    // (parquet widens non-null flags to nullable; values are what the
    // search consumes)
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(c2) === shape(centroids))
    assert(shape(cb2) === shape(codebooks))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map {
        case a: Seq[_] => a.toList
        case x => x
      }).toSet
    assert(rows(c2) === rows(centroids))
    assert(rows(cb2) === rows(codebooks))
    // search equivalence: loaded index == built index, rank for rank
    def search(c: org.apache.spark.sql.DataFrame,
        cb: org.apache.spark.sql.DataFrame) =
      Similarity.ivfPqSearchTopK(em, em.filter($"vec_id" < 6), "vec_id",
        "embedding", k = 3, centroids = c, nprobe = 2,
        codebooks = cb, subDim = 8)
        .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
    assert(search(c2, cb2) === search(centroids, codebooks))
  }

  test("PQ ANN on real embeddings: full code table, bounded codes, recall floor") {
    val em = Tables.embeddings(spark, "/root/testdata/sf0.001").cache()
    val codebooks = em.filter($"vec_id" < 8)
      .select($"vec_id".cast("int").as("code"),
        explode(sequence(lit(0), lit(7))).as("sub"), $"embedding")
      .select($"sub", $"code",
        slice($"embedding", $"sub" * lit(8) + lit(1), lit(8)).as("cvec"))
    val n = em.count()
    val codes = Similarity.pqEncode(em, "vec_id", "id", "embedding",
      codebooks, subDim = 8)
    assert(codes.count() === n * 8) // exactly one code per (id, sub)
    assert(codes.filter($"code" < 0 || $"code" >= 8).isEmpty)
    val q = em.filter($"vec_id" < 10)
    val exact = Similarity.cosineTopK(em, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqSearchTopK(em, q, "vec_id", "embedding", 5,
      codebooks, subDim = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    // 8 shared codes is a deliberately coarse codebook (it must replay in
    // the q117 oracle) — the floor is correspondingly loose
    assert(recall >= 0.2, s"recall $recall")
  }

  test("ivfPqSearchTopK: equals flat PQ when every cell is probed; restricts to probed cells otherwise") {
    val em = Tables.embeddings(spark, "/root/testdata/sf0.001").cache()
    val centroids = em.filter($"vec_id" >= 8 && $"vec_id" < 16)
      .select(($"vec_id" - 8).cast("int").as("cell"), $"embedding".as("cvec"))
    val codebooks = em.filter($"vec_id" < 8)
      .select($"vec_id".cast("int").as("code"),
        explode(sequence(lit(0), lit(7))).as("sub"), $"embedding")
      .select($"sub", $"code",
        slice($"embedding", $"sub" * lit(8) + lit(1), lit(8)).as("cvec"))
    val q = em.filter($"vec_id" < 5)
    // nprobe = nlist: every inverted list is scanned, so IVF-PQ must
    // reproduce flat PQ exactly (same ADC scores, same tie-breaks)
    val flat = Similarity.pqSearchTopK(em, q, "vec_id", "embedding", 5,
      codebooks, subDim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val all = Similarity.ivfPqSearchTopK(em, q, "vec_id", "embedding", 5,
      centroids, nprobe = 8, codebooks = codebooks, subDim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(all === flat)
    // nprobe = 2: neighbors must come only from the query's probed cells
    val narrowed = Similarity.ivfPqSearchTopK(em, q, "vec_id", "embedding", 5,
      centroids, nprobe = 2, codebooks = codebooks, subDim = 8)
    assert(narrowed.count() > 0)
    val ivf = Similarity.ivfSearchTopK(em, q, "vec_id", "embedding",
      k = Int.MaxValue, centroids = centroids, nprobe = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = narrowed.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(ivf),
      s"IVF-PQ returned neighbors outside the probed cells: ${got -- ivf}")
  }

  test("labelDisagreement: neighborhood vote with null-safe label compare") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f), Some(0)),
      (2L, Array(1.0f, 0.1f), Some(0)),
      (3L, Array(0.0f, 1.0f), Some(1)),
      (4L, Array(1.0f, 0.05f), Some(1)),
      (5L, Array(0.9f, 0.1f), Option.empty[Int]))
      .toDF("vec_id", "embedding", "label")
    val q = corpus.filter($"vec_id" === 1L)
    val r = Similarity.labelDisagreement(
      corpus, q, "vec_id", "embedding", "label", k = 4).collect()(0)
    // neighbors of v1: v2 (L0), v4 (L1), v5 (null), v3 (L1)
    // vs query L0 -> 3 of 4 disagree (null counts as different)
    assert(r.getAs[Long]("query_id") === 1L)
    assert(r.getAs[Int]("label") === 0)
    assert(r.getAs[Long]("n_neighbors") === 4L)
    assert(r.getAs[Long]("n_diff") === 3L)
    assert(math.abs(r.getAs[Double]("disagreement") - 0.75) < 1e-12)
  }

  test("lshKnnGraph equals lshCosineTopK with corpus as queries") {
    val em = Tables.embeddings(spark, "/root/testdata/sf0.001").cache()
    val graph = Similarity.lshKnnGraph(em, "vec_id", "embedding",
      k = 3, numBits = 24, bands = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.rint(r.getDouble(3) * 1e10))).toSet
    // the broadcast-query path must produce the identical graph: same
    // candidates, same decimal-exact cosines, same tie-breaks
    val viaTopK = Similarity.lshCosineTopK(em, em, "vec_id", "embedding",
      k = 3, numBits = 24, bands = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.rint(r.getDouble(3) * 1e10))).toSet
    assert(graph === viaTopK)
    assert(graph.nonEmpty)
    // directed top-k: at most k edges per source
    val perSrc = graph.groupBy(_._1).values.map(_.size)
    assert(perSrc.forall(_ <= 3))
  }

  test("projectRandom: hyperplane dots exact, distances roughly preserved") {
    val em = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter($"vec_id" < 40).cache()
    val proj = Similarity.projectRandom(em, "vec_id", "embedding",
      outDim = 16)
    val rows = proj.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(rows.map(_._1).distinct.length === 40)
    assert(rows.groupBy(_._1).forall(_._2.length === 16))
    // coordinate 0 of vec 0 equals the driver-side dot with plane 0
    val v0 = em.filter($"vec_id" === 0L).collect()(0)
      .getAs[scala.collection.Seq[Float]]("embedding")
    // the plane derivation, independently restated: md5("<seed>_<h>_<d>")
    // first 15 hex chars -> uniform in [-0.5, 0.5)
    def planeVal(h: Int, d: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"42_${h}_$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 1000000L) / 1000000.0 - 0.5
    }
    val plane0 = Array.tabulate(64)(d => planeVal(0, d))
    val want = v0.zip(plane0).map { case (x, p) => x.toDouble * p }.sum
    val got = rows.find(r => r._1 == 0L && r._2 == 0).get._3
    assert(math.abs(got - want) < 1e-9)
    // JL sanity: projected cosine of a vector with itself is 1; the
    // projection is linear, so scaled inputs scale outputs
    val scaled = Similarity.projectRandom(
      em.withColumn("embedding",
        org.apache.spark.sql.functions.transform($"embedding", x => x * 2f)),
      "vec_id", "embedding", outDim = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // (keyed comparison) every coordinate doubles
    val base = rows.map(r => (r._1, r._2) -> r._3).toMap
    base.foreach { case (k, v) =>
      assert(math.abs(scaled(k) - 2 * v) < 1e-9)
    }
  }

  test("multimodal: real PNG decodes to true dimensions, bands, luma histogram") {
    // 8x4 RGB PNG generated in-memory: left half black, right half white
    val img = new java.awt.image.BufferedImage(
      8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq((7L, bos.toByteArray, "image/png", 8, 4))
      .toDF("media_id", "media", "media_type", "declared_width", "declared_height")
      .as[Multimodal.MediaRow]
    val f = Multimodal.decodeFeatures(media).head()
    assert(f.decoded_width === 8)
    assert(f.decoded_height === 4)
    assert(f.channels === 3)
    assert(f.feature(0) === 0.5)  // the black half
    assert(f.feature(15) === 0.5) // the white half
    assert(math.abs(f.feature.sum - 1.0) < 1e-12)
    // non-image payloads keep the byte-stat fallback with sentinel dims
    val t = Multimodal.decodeFeatures(Multimodal.mediaFromText(
      Seq((1L, "ab")).toDF("id", "text"), "id", "text")).head()
    assert(t.decoded_width === -1 && t.decoded_height === -1 && t.channels === 0)
  }

  test("multimodal: stub decode byte stats + resize + frame sampling") {
    val media = Multimodal.mediaFromText(
      Seq((1L, "abcd")).toDF("id", "text"), "id", "text")
    val f = Multimodal.decodeFeatures(media).head()
    assert(f.n_bytes === 4L)
    assert(f.mean_byte === (97 + 98 + 99 + 100) / 4.0)
    assert(f.feature.length === 16)
    assert(math.abs(f.byte_entropy - 2.0) < 1e-12) // 4 distinct bytes, uniform
    val resized = Multimodal.resizeStub(media, 2).head()
    assert(resized.media.toSeq === Seq('a'.toByte, 'c'.toByte))
    assert(resized.declared_width === 32)
    val frames = Multimodal.frameSample(media, frameBytes = 1, stride = 2)
      .collect().map(_.frame_idx).sorted
    assert(frames.toSeq === Seq(0, 2))
  }

  test("semanticDedup: near-dups pruned to the most prototypical, one kept per cluster") {
    // two cells along the axes; ids 1,2,3 are near-identical in cell
    // 0's direction (2 is closest to the centroid), 4 is alone near
    // cell 1, 5 is in cell 0 but orthogonal-ish to the 1/2/3 bundle
    val corpus = Seq(
      (1L, Array(0.98f, 0.17f)), (2L, Array(1.0f, 0.05f)),
      (3L, Array(0.96f, 0.20f)), (4L, Array(0.1f, 1.0f)),
      (5L, Array(0.75f, -0.66f))).toDF("vec_id", "embedding")
    val centroids = Seq(
      (0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f))).toDF("cell", "cvec")
    val got = Similarity.semanticDedup(
      corpus, "vec_id", "embedding", centroids, threshold = 0.99, dim = 2)
      .orderBy($"vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(4)))
    // 1,2,3 chain into one cluster (min id 1); only 2 (max centroid
    // cosine) survives; 4 and 5 are singletons and kept
    assert(got.toSeq === Seq(
      (1L, 0, 1L, false), (2L, 0, 1L, true), (3L, 0, 1L, false),
      (4L, 1, 4L, true), (5L, 0, 5L, true)))
    // exactly one kept row per cluster, always
    val perCluster = Similarity.semanticDedup(
      corpus, "vec_id", "embedding", centroids, threshold = 0.99, dim = 2)
      .groupBy($"cluster_id")
      .agg(sum(when($"kept", 1).otherwise(0)).as("n_kept"))
      .collect().map(_.getLong(1))
    assert(perCluster.forall(_ == 1L))
  }

  test("semanticDedupAgainst: batch vectors matched to same-cell corpus near-dups only") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val incoming = Seq(
      (10L, Array(0.999f, 0.05f)), // near-dup of corpus 1 (same cell)
      (11L, Array(0.7f, -0.71f)),  // cell 0, but far from corpus 1
      (12L, Array(0.05f, 1.0f))    // near-dup of corpus 2
    ).toDF("vec_id", "embedding")
    val centroids = Seq(
      (0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f))).toDF("cell", "cvec")
    val got = Similarity.semanticDedupAgainst(
      corpus, incoming, "vec_id", "embedding", centroids,
      threshold = 0.99, dim = 2)
      .orderBy($"vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(got.toSeq === Seq((10L, true, 1L), (11L, false, -1L),
      (12L, true, 2L)))
  }

  test("hardNegatives: nearest same-label vector is skipped, null labels count as different") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f), "A"), (2L, Array(0.99f, 0.1f), "A"),
      (3L, Array(0.9f, 0.3f), "B"), (4L, Array(0.0f, 1.0f), "B"),
      (5L, Array(0.95f, 0.2f), null.asInstanceOf[String]))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(
      corpus, corpus.filter($"vec_id" === 1L), "vec_id", "embedding",
      "label", k = 3)
      .orderBy($"rank").collect().map(_.getLong(2))
    // 2 is the nearest overall but shares label A -> excluded; the
    // null-label 5 is "different from A" and ranks by cosine
    assert(got.toSeq === Seq(5L, 3L, 4L))
  }

  test("lshRecallAtK matches a hand-joined exact-vs-LSH comparison") {
    val em = (0L until 60L).map { i =>
      (i, Array.tabulate(64)(d => (math.sin(i * 31 + d) * 0.5).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = em.filter($"vec_id" < 6)
    val audited = Similarity.lshRecallAtK(
      em, queries, "vec_id", "embedding", k = 4, numBits = 8, bands = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val exact = Similarity.cosineTopK(em, queries, "vec_id", "embedding", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val approx = Similarity.lshCosineTopK(
      em, queries, "vec_id", "embedding", k = 4, numBits = 8, bands = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(audited.keySet === exact.keySet)
    audited.foreach { case (q, (nExact, nHit, recall)) =>
      val want = exact(q).intersect(approx.getOrElse(q, Set.empty)).size
      assert(nExact === exact(q).size.toLong)
      assert(nHit === want.toLong, s"query $q")
      assert(math.abs(recall - want.toDouble / exact(q).size) < 1e-15)
    }
    // denominators come from the exact side: recall is n_hit/n_exact
    // even when fewer than k exact neighbors exist
    assert(audited.values.forall { case (ne, nh, _) => nh <= ne && ne <= 4L })
  }

  private def pngBytes(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("multimodal: aHash pairs near-identical PNGs, separates different ones") {
    // base: left-dark / right-bright gradient; near: same with one
    // corner pixel flipped; far: inverted gradient
    val base = pngBytes(16, 16, (x, _) => if (x < 8) 0x101010 else 0xF0F0F0)
    val near = pngBytes(16, 16, (x, y) =>
      if (x == 0 && y == 0) 0x202020
      else if (x < 8) 0x101010 else 0xF0F0F0)
    val far = pngBytes(16, 16, (x, _) => if (x < 8) 0xF0F0F0 else 0x101010)
    val media = Seq(
      (1L, base, "image/png", 16, 16),
      (2L, near, "image/png", 16, 16),
      (3L, far, "image/png", 16, 16))
      .toDF("media_id", "media", "media_type", "declared_width", "declared_height")
      .as[Multimodal.MediaRow]
    val hashes = Multimodal.perceptualHash(media)
      .collect().map(m => m.media_id -> m).toMap
    assert(hashes.values.forall(_.decoded))
    // base vs near: at most a couple of bits differ; base vs far: ~all 64
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashes(1L).phash, hashes(2L).phash) <= 3)
    assert(ham(hashes(1L).phash, hashes(3L).phash) >= 32)
    val pairs = Multimodal.perceptualNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("multimodal: perceptual clusters group byte-identical stub payloads") {
    val media = Multimodal.mediaFromText(
      Seq((1L, "aaaa bbbb"), (2L, "aaaa bbbb"), (3L, "zzzz ffff qqqq"))
        .toDF("id", "text"), "id", "text")
    val clusters = Multimodal.perceptualClusters(media)
      .orderBy($"representative")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // docs 1,2 share a histogram signature; doc 3 stands alone
    assert(clusters.toSeq === Seq((2L, 1L), (1L, 3L)))
  }

  test("nearestCentroid: well-separated clusters classify perfectly; an " +
    "outlier lands with the nearer centroid") {
    import spark.implicits._
    // label 0 along +x, label 1 along +y; vec 99 is mislabeled 1 but
    // points along +x, so it confuses into pred 0
    val rows = Seq(
      (1L, Array(1.0f, 0.1f), 0), (2L, Array(0.9f, 0.0f), 0),
      (3L, Array(1.1f, 0.05f), 0),
      (4L, Array(0.1f, 1.0f), 1), (5L, Array(0.0f, 0.9f), 1),
      (99L, Array(1.0f, 0.0f), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val conf = Similarity.nearestCentroid(df, "vec_id", "embedding", "label")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Long]("n")).toMap
    assert(conf((0, 0)) === 3L)
    assert(conf((1, 1)) === 2L)
    assert(conf((1, 0)) === 1L) // the planted confusion
    assert(!conf.contains((0, 1)))
  }

  test("bitextMarginMine: matches a driver-side reference, 1-1 matching") {
    val left = Seq(
      (1L, Array(1.0f, 0.1f, 0f)), (2L, Array(0.1f, 1.0f, 0f)),
      (3L, Array(0.6f, 0.6f, 0.2f)), (4L, Array(0f, 0.2f, 1.0f)))
    val right = Seq(
      (11L, Array(0.9f, 0.2f, 0f)), (12L, Array(0.2f, 0.9f, 0.1f)),
      (13L, Array(0.55f, 0.65f, 0.15f)), (14L, Array(0.1f, 0.1f, 0.9f)),
      (15L, Array(0.5f, 0.5f, 0.5f))) // hub: close to everything
    val k = 2
    val threshold = 1.0

    // driver-side reference of the whole pipeline
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
    }
    val allCos = for ((li, lv) <- left; (ri, rv) <- right)
      yield (li, ri, cos(lv, rv))
    val fwd = left.flatMap { case (li, _) =>
      allCos.filter(_._1 == li).sortBy(t => (-t._3, t._2)).take(k) }
    val bwd = right.flatMap { case (ri, _) =>
      allCos.filter(_._2 == ri).sortBy(t => (-t._3, t._1)).take(k) }
    val avgL = fwd.groupBy(_._1).view.mapValues(v => v.map(_._3).sum / v.size).toMap
    val avgR = bwd.groupBy(_._2).view.mapValues(v => v.map(_._3).sum / v.size).toMap
    val cand = (fwd ++ bwd).distinct
    val scoredRef = cand.map { case (li, ri, c) =>
      (li, ri, c, c / ((avgL(li) + avgR(ri)) / 2.0)) }
    val bestL = scoredRef.groupBy(_._1).view.mapValues(
      _.maxBy(t => (t._4, -t._2))._2).toMap
    val bestR = scoredRef.groupBy(_._2).view.mapValues(
      _.maxBy(t => (t._4, -t._1))._1).toMap
    val wantPairs = scoredRef.filter { case (li, ri, _, m) =>
      bestL(li) == ri && bestR(ri) == li && m >= threshold }
    assert(wantPairs.nonEmpty) // fixture actually exercises the path

    val got = Similarity.bitextMarginMine(
      left.toDF("id", "vec"), right.toDF("id", "vec"),
      "id", "vec", k, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.map(p => (p._1, p._2)).toSet ===
      wantPairs.map(p => (p._1, p._2)).toSet)
    got.foreach { case (li, ri, c, m) =>
      val w = wantPairs.find(p => p._1 == li && p._2 == ri).get
      assert(math.abs(c - w._3) < 1e-9, s"cosine $li-$ri")
      assert(math.abs(m - w._4) < 1e-9, s"margin $li-$ri")
      assert(m >= threshold)
    }
    // mutual-best is a partial 1-1 matching: no id repeats on either side
    assert(got.map(_._1).distinct.length === got.length)
    assert(got.map(_._2).distinct.length === got.length)
  }

  test("bitextMarginMine: complete candidate table equals brute; " +
    "equal cross-corpus ids are legitimate pairs; dups dedup") {
    // DISTINCT corpora that SHARE an id space (both keyed 1..n) — the
    // common case the old self-pair filter silently broke: left 1 and
    // right 1 are near-identical vectors, so (1, 1) must be minable.
    val left = Seq(
      (1L, Array(1.0f, 0.1f, 0f)), (2L, Array(0.1f, 1.0f, 0f)),
      (3L, Array(0f, 0.2f, 1.0f)))
    val right = Seq(
      (1L, Array(0.95f, 0.12f, 0f)), (2L, Array(0.15f, 0.9f, 0.1f)),
      (3L, Array(0.1f, 0.1f, 0.9f)), (4L, Array(0.5f, 0.5f, 0.5f)))
    val l = left.toDF("id", "vec")
    val r = right.toDF("id", "vec")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => (x.getLong(0), x.getLong(1),
        math.round(x.getDouble(2) * 1e9), math.round(x.getDouble(3) * 1e9)))
        .toSet

    val brute = Similarity.bitextMarginMine(l, r, "id", "vec", 2, 1.0)
    // the id-equal pair survives (ADVICE fix: no self-pair exclusion
    // across corpora)
    assert(brute.collect().exists(x =>
      x.getLong(0) === 1L && x.getLong(1) === 1L))

    val allPairs = l.select(col("id").as("left_id"))
      .crossJoin(r.select(col("id").as("right_id")))
    val viaCand = Similarity.bitextMarginMine(
      l, r, "id", "vec", 2, 1.0, allPairs)
    assert(rows(viaCand) === rows(brute))
    // duplicated candidate rows change nothing
    val viaDup = Similarity.bitextMarginMine(
      l, r, "id", "vec", 2, 1.0, allPairs.unionAll(allPairs))
    assert(rows(viaDup) === rows(brute))

    // a candidate table that omits right id 4 entirely equals brute
    // mining against the corpus without that row — truncation is
    // exactly restriction
    val minus4 = Similarity.bitextMarginMine(
      l, r, "id", "vec", 2, 1.0,
      allPairs.filter(col("right_id") =!= 4L))
    val bruteMinus4 = Similarity.bitextMarginMine(
      l, r.filter(col("id") =!= 4L), "id", "vec", 2, 1.0)
    assert(rows(minus4) === rows(bruteMinus4))
  }

  test("ivfAppendBatch: folding a batch onto a persisted index equals " +
    "the from-scratch assignment; ivfDriftTrigger flags only drifted " +
    "cells") {
    val centroids = Seq(
      (0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f)))
      .toDF("cell", "cvec")
    val codebooks = Seq((0, 0, Array(0.0f))).toDF("sub", "code", "cvec")
    val initial = Seq(
      (1L, Array(0.9f, 0.1f)), (2L, Array(0.1f, 0.8f)),
      (3L, Array(0.7f, 0.2f))).toDF("id", "vec")
    val batch = Seq(
      (10L, Array(0.95f, 0.05f)), (11L, Array(0.2f, 0.9f)))
      .toDF("id", "vec")
    val path = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_spec_ivf_incr").getAbsolutePath
    Similarity.saveIndex(centroids, codebooks, path)
    val (loaded, _) = Similarity.loadIndex(spark, path)
    Similarity.saveAssignments(
      Similarity.ivfAssign(initial, "id", "vec", loaded), "id", path)
    Similarity.ivfAppendBatch(spark, path, batch, "id", "vec")

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val grown = pairs(Similarity.loadAssignments(spark, path))
    val scratch = pairs(Similarity.ivfAssign(
      initial.unionByName(batch), "id", "vec", centroids))
    assert(grown === scratch)
    assert(grown.keySet === Set(1L, 2L, 3L, 10L, 11L))

    // drift: a batch sitting on a centroid does not trigger; a batch
    // landing far from its centroid does
    val near = Seq((20L, Array(1.0f, 0.0f)), (21L, Array(0.9f, 0.1f)))
      .toDF("id", "vec")
    val dNear = Similarity.ivfDriftTrigger(near, "id", "vec",
      centroids, threshold = 0.5).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(dNear(0).getAs[Long]("n_new") === 2L)
    assert(dNear(0).getAs[Double]("drift_l2") < 0.2)
    assert(!dNear(0).getAs[Boolean]("needs_recentroid"))

    val far = Seq((30L, Array(0.7f, 0.72f))).toDF("id", "vec")
    val dFar = Similarity.ivfDriftTrigger(far, "id", "vec",
      centroids, threshold = 0.5).collect()
      .map(r => r.getInt(0) -> r).toMap
    // assigned to cell 1 (cosine 0.72-side wins), mean (0.7, 0.72):
    // L2 to (0, 1) = sqrt(0.49 + 0.0784) > 0.5 -> re-centroid
    assert(dFar.keySet === Set(1))
    assert(dFar(1).getAs[Boolean]("needs_recentroid"))
  }

  test("ivfRecentroid: flagged cells move to their member mean, " +
    "unflagged keep the frozen coordinates verbatim") {
    val centroids = Seq(
      (0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f)))
      .toDF("cell", "cvec")
    val vecs = Seq(
      (1L, Array(0.9f, 0.1f)), (2L, Array(0.7f, 0.3f)),
      (3L, Array(0.1f, 0.8f))).toDF("id", "vec")
    val assign = Similarity.ivfAssign(vecs, "id", "vec", centroids)
    val flagged = Seq(Tuple1(0)).toDF("cell")
    val got = Similarity.ivfRecentroid(vecs, "id", "vec",
      assign, centroids, flagged)
      .collect().map(r => r.getAs[Int]("cell") ->
        r.getAs[Seq[Double]]("cvec")).toMap
    // cell 0 re-centroids from members {1, 2}: exact 12 dp means
    assert(got(0).head === ((0.9f.toDouble + 0.7f.toDouble) / 2 * 1e12)
      .round / 1e12)
    assert(got(0)(1) === ((0.1f.toDouble + 0.3f.toDouble) / 2 * 1e12)
      .round / 1e12)
    // cell 1 frozen: the float coordinates cast to double, unchanged
    assert(got(1) === Seq(0.0f.toDouble, 1.0f.toDouble))
  }

  test("lshCandidatePairs: band collisions only, no self-exclusion, " +
    "subset of the cross product") {
    val l = Seq((1L, Array.fill(64)(1.0f)), (2L, Array.fill(64)(-1.0f)))
      .toDF("id", "vec")
    val r = Seq((1L, Array.fill(64)(0.9f)), (9L, Array.fill(64)(-0.8f)))
      .toDF("id", "vec")
    val got = Similarity.lshCandidatePairs(l, r, "id", "vec",
      numBits = 8, bands = 4, dim = 64)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // identical-direction vectors share every band; opposite-direction
    // vectors share none (all 8 hyperplane signs flip)
    assert(got.contains((1L, 1L)) && got.contains((2L, 9L)))
    assert(!got.contains((1L, 9L)) && !got.contains((2L, 1L)))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  *
  *   - [[cosineTopK]]: brute-force exact top-k — broadcast the (small)
  *     query set against the corpus; correctness baseline and the right
  *     plan whenever |queries| is bounded;
  *   - [[lshCosineTopK]]: random-hyperplane LSH — sign-bit sketches,
  *     multi-band bucketing, exact re-rank within buckets. The scale
  *     path: corpus is bucketed by equi-join keys, so each query only
  *     scores its colliding candidates;
  *   - [[cosineNearDupPairs]]: all corpus pairs above a cosine threshold
  *     via the same banding (embedding near-dedup).
  *
  * Dot products are pure column expressions (`zip_with` + decimal-exact
  * `aggregate`) — no UDFs, no driver-side math. Hyperplanes are
  * generated deterministically from a seed via md5-derived uniforms, so
  * results are reproducible without a Math.random dependency.
  */
object Similarity {

  /** Exact dot product with decimal accumulation (order-independent,
    * cross-engine reproducible).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double"))
        .cast("decimal(20,18)")),
      lit(java.math.BigDecimal.ZERO).cast("decimal(37,18)"),
      // (37,18) + (20,18) -> (38,18): enough precision headroom that the
      // add never rounds; the cast back to (37,18) keeps the accumulator
      // type fixed without touching the scale (values are << 10^19)
      (acc, v) => (acc + v).cast("decimal(37,18)"))
      .cast("double")

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force exact cosine top-k: for each row of `queries`, the k
    * nearest corpus rows (excluding identical ids). Query side is
    * broadcast — the corpus never shuffles.
    */
  def cosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val scored = corpus
      .join(q, col(idCol) =!= col("query_id"))
      .withColumn("cosine", cosine(col("__qv"), col(vecCol)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col(idCol).as("neighbor_id"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplanes, computed ONCE on the
    * driver (md5-derived uniforms in [-0.5, 0.5), seeded) and shipped as
    * literal arrays — the per-row cost is just the dot product, no
    * per-row hashing.
    */
  private[operators] def hyperplaneValues(h: Int, dim: Int, seed: Long): Array[Double] =
    Array.tabulate(dim) { d =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${seed}_${h}_$d".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % 1000000L).toDouble / 1000000.0 - 0.5
    }

  /** Sign-bit sketch: bit h = sign(v . hyperplane_h), packed big-endian
    * into a long.
    */
  def signSketch(vec: Column, numBits: Int, dim: Int, seed: Long): Column =
    (0 until numBits).map { h =>
      val hp = typedLit(hyperplaneValues(h, dim, seed))
      val dotP = aggregate(
        zip_with(vec, hp, (x, p) => x.cast("double") * p),
        lit(0.0), (acc, v) => acc + v)
      when(dotP > 0, lit(1L << (numBits - 1 - h))).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH ANN top-k: bucket corpus + queries by band keys of the sign
    * sketch, exact cosine re-rank within collisions. Recall < 1 by
    * construction; tune bits/bands for the recall target.
    */
  def lshCosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numBits: Int = 16,
      bands: Int = 4,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    require(numBits % bands == 0)
    val r = numBits / bands
    def banded(df: DataFrame, id: String, vec: String): DataFrame = {
      val sk = signSketch(col(vecCol), numBits, dim, seed)
      val bandKeys = (0 until bands).map(bi =>
        concat_ws("_", lit(bi),
          shiftright(sk, bi * r).bitwiseAND(lit((1L << r) - 1))))
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        posexplode(array(bandKeys: _*)))
        .withColumnRenamed("col", "band_key").drop("pos")
    }
    val c = banded(corpus, "neighbor_id", "__cv")
    val q = banded(queries, "query_id", "__qv")
    val cand = c.join(q, Seq("band_key"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("__qv"), col("__cv"))
      .distinct()
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
  }

  /** Embedding near-dup: corpus pairs with cosine >= threshold, found
    * via sketch-band candidates, verified exactly.
    */
  def cosineNearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numBits: Int = 16,
      bands: Int = 8,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    require(numBits % bands == 0)
    val r = numBits / bands
    val sk = corpus.select(col(idCol), col(vecCol).as("__v"),
      signSketch(col(vecCol), numBits, dim, seed).as("__sk"))
    val bandKeys = (0 until bands).map(bi =>
      concat_ws("_", lit(bi),
        shiftright(col("__sk"), bi * r).bitwiseAND(lit((1L << r) - 1))))
    val banded = sk.select(col(idCol), col("__v"),
      posexplode(array(bandKeys: _*)))
      .withColumnRenamed("col", "band_key").drop("pos")
    val a = banded.select(col(idCol).as("id_a"), col("__v").as("__va"), col("band_key"))
    val b = banded.select(col(idCol).as("id_b"), col("__v").as("__vb"), col("band_key"))
    a.join(b, Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__va"), col("__vb"))
      .distinct()
      .withColumn("cosine", cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}

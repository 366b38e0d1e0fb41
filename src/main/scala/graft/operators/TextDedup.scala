package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document deduplication family for training-data pipelines:
  *
  *   - [[exactDedup]]: hash-groupBy on a canonical fingerprint — one
  *     shuffle on a 128-bit key, no text comparison;
  *   - [[minhashNearDupPairs]]: MinHash + LSH banding — shingle ->
  *     signature -> band buckets -> equi-join on (band, band-hash) ->
  *     exact Jaccard verification of candidates only. The join is a hash
  *     equi-join on bucket keys, so shuffle volume is O(candidates), not
  *     O(n²);
  *   - [[simhashNearDupPairs]]: 64-bit SimHash, candidates = exact
  *     signature match on rotated bands (cheap), verified by Hamming
  *     distance;
  *   - embedding-cosine near-dup lives in [[Similarity]].
  *
  * At 100 TB: every stage is a map or an equi-join/groupBy on a hash
  * key; banding keys distribute uniformly by construction, so no skew
  * salting is needed except adversarial inputs (boilerplate shingles) —
  * for those, drop top-frequency shingles before signatures
  * ([[dropBoilerplateShingles]]).
  */
object TextDedup {

  /** Exact dedup: keep the lowest-id row per canonical fingerprint. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    df.withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** Shingle-set table: (id, shingles) with optional boilerplate-shingle
    * removal (shingles appearing in more than `maxDocFrac` of docs).
    */
  def shingleSets(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.select(col(idCol), TextFunctions.shingles(col(textCol), n).as("shingles"))

  def dropBoilerplateShingles(
      sets: DataFrame, idCol: String, maxDocFrac: Double): DataFrame = {
    val nDocs = sets.count()
    val hot = sets
      .select(explode(col("shingles")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > lit(maxDocFrac * nDocs))
      .select(collect_list(col("s")).as("hot"))
    sets.crossJoin(broadcast(hot))
      .withColumn("shingles", array_except(col("shingles"), col("hot")))
      .drop("hot")
  }

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * @param bands     number of LSH bands; rows-per-band =
    *                  numHashes / bands. P(candidate | j) =
    *                  1 - (1 - j^r)^b — tune for the target threshold.
    * @param threshold final exact-Jaccard cut applied to candidates.
    */
  def minhashNearDupPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      numHashes: Int = 16,
      bands: Int = 8,
      threshold: Double = 0.8,
      hashFn: Column => Column = TextFunctions.md5Hash60): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sets = shingleSets(df, textCol, idCol, n)
      .filter(size(col("shingles")) > 0)
    val sigs = sets.withColumn("sig",
      TextFunctions.minhashSignature(col("shingles"), numHashes, hashFn))
    // band key = md5 of the band's slice of the signature (bands unrolled
    // statically — shift/slice offsets are compile-time ints)
    val bandKeys = (0 until bands).map(bi =>
      md5(concat_ws("_", slice(col("sig"), bi * r + 1, r))))
    val banded = sigs.select(
      col(idCol), col("shingles"),
      posexplode(array(bandKeys: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
    val a = banded.select(col(idCol).as("id_a"), col("shingles").as("sh_a"),
      col("band"), col("band_key"))
    val b = banded.select(col(idCol).as("id_b"), col("shingles").as("sh_b"),
      col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("jaccard", TextFunctions.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Near-dedup: drop all but the lowest-id member of each near-dup
    * pair cluster (single-link, one hop — the standard greedy pass).
    */
  def minhashDedup(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, numHashes: Int = 16, bands: Int = 8,
      threshold: Double = 0.8): DataFrame = {
    val losers = minhashNearDupPairs(df, textCol, idCol, n, numHashes, bands, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** SimHash near-dup candidate pairs: equal signature in >=1 of four
    * 16-bit bands -> verify by Hamming distance <= maxHamming.
    */
  def simhashNearDupPairs(
      df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol),
      TextFunctions.simhash64(TextFunctions.tokens(col(textCol))).as("sig"))
    val bandKeys = (0 until 4).map(bi =>
      shiftright(col("sig"), bi * 16).bitwiseAND(lit(0xFFFFL)))
    val banded = sigs.select(col(idCol), col("sig"),
      posexplode(array(bandKeys: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val a = banded.select(col(idCol).as("id_a"), col("sig").as("sig_a"),
      col("band"), col("band_key"))
    val b = banded.select(col(idCol).as("id_b"), col("sig").as("sig_b"),
      col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("hamming",
        TextFunctions.hammingDistance(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}

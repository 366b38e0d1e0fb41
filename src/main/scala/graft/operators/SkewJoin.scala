package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join: the manual skew-mitigation pattern for joins whose
  * key distribution is too skewed for one reducer but whose small side
  * is too large to broadcast.
  *
  * A plain shuffle join routes every row of a hot key to ONE task; at
  * 100 TB a bot user / null-ish sentinel key becomes a single straggler
  * task holding the stage open for hours. Salting splits each hot key's
  * rows across `salts` tasks: the fact side gets a deterministic salt in
  * [0, salts), the dimension side is replicated once per salt value, and
  * the join runs on (key, salt) — per-key parallelism becomes `salts`
  * at the cost of a `salts`× blow-up of the (small) dimension side.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`)
  * handles the sort-merge case at runtime and should be preferred when
  * it applies; this operator is for the shapes AQE doesn't cover —
  * aggregation-under-join pipelines, hash joins already planned before
  * skew is visible, or engines running with AQE off.
  *
  * The salt must be DETERMINISTIC per fact row (`saltBy`, hashed) — a
  * `rand()` salt would make retried tasks re-deal rows and break
  * exactly-once row identity under speculative execution / stage retry.
  * Join semantics are exactly `left.join(right, keys, joinType)` for
  * inner and left-outer: every (key, salt) pair exists on the replicated
  * side, so no left row can lose its match to salting.
  */
object SkewJoin {

  /** `left ⋈ right` on `keys`, with the left side salted by
    * `hash(saltBy) % salts` and the right side replicated to all salts.
    *
    * @param saltBy   deterministic per-row column on `left` (an id or a
    *                 content hash) — NOT a key column (a key-derived salt
    *                 would put a whole hot key back in one bucket).
    * @param joinType "inner" or "left" (semi/anti/right would change
    *                 multiplicity under replication and are rejected).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltBy: Column,
      salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(Seq("inner", "left", "left_outer", "leftouter").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    val saltCol = "__graft_salt"
    val l = left.withColumn(saltCol, pmod(xxhash64(saltBy), lit(salts.toLong)))
    val r = right.withColumn(saltCol,
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    l.join(r, keys :+ saltCol, joinType).drop(saltCol)
  }

  /** Bloom-pruned inner equi-join: build a Bloom filter over the small
    * side's distinct join keys, push a codegen'd
    * [[graft.functions.BloomMightContainExpr]] probe into the BIG side
    * as a map-side pre-shuffle filter, then run the ordinary join on
    * the survivors. False positives pass the filter and die in the
    * real join, false negatives are impossible — so for ANY fpp the
    * result is EXACTLY `big.join(small, key)`; the filter only cuts
    * shuffle volume. At 100 TB this is the difference between
    * shuffling the whole fact table and shuffling roughly its matching
    * fraction. (Spark's own runtime row-level filtering does this
    * best-effort behind conf thresholds; this operator makes the
    * contract explicit, deterministic, and testable.)
    *
    * Keys probe as their canonical string form on both sides, so any
    * key type works against `DataFrameStatFunctions.bloomFilter`'s
    * UTF-8 string encoding.
    */
  /** `expectedItems`: pass the small side's (approximate) distinct key
    * count to size the filter without the extra `count()` job this
    * method otherwise runs; any positive value works — it only tunes
    * the filter's bit budget, never its correctness.
    */
  def bloomPrunedJoin(
      big: DataFrame,
      small: DataFrame,
      keyCol: String,
      fpp: Double = 0.01,
      expectedItems: Long = -1L): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val keys = small.select(col(keyCol).cast("string").as("__k"))
      .where(col("__k").isNotNull).distinct()
    val expected =
      if (expectedItems > 0) expectedItems else math.max(keys.count(), 1L)
    val bloom = keys.stat.bloomFilter("__k", expected, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    // unique per-call registry name — same race rationale as
    // TextDedup.decontaminateBloom
    val fnName = "graft_bloom_might_contain_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val registry = big.sparkSession.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(fnName,
      exprs => graft.functions.BloomMightContainExpr(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(bytes),
        exprs.head),
      "scala_udf")
    try {
      // Dataset construction analyzes eagerly, so the probe expression
      // is already substituted into the analyzed plan by the time this
      // returns — the temp function can be dropped immediately instead
      // of accumulating one UUID-named entry per call
      big
        .filter(col(keyCol).isNotNull &&
          call_function(fnName, col(keyCol).cast("string")))
        .join(small, Seq(keyCol))
    } finally {
      registry.dropFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(fnName))
    }
  }
}

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
}

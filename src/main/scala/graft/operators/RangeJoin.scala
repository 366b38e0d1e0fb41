package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range / as-of join family (reference `src/preprocessing/transform_data.py:25-47`:
  * `pd.merge_asof(..., direction='backward')` + the post-filter that voids a
  * match when `ip_int > upper_bound`).
  *
  * The reference realizes this as a sorted merge scan over two pre-sorted
  * pandas frames. Spark-first realization: declare the predicate and let
  * Catalyst pick the physical join; three strategies by data shape:
  *
  *   1. [[rangeJoin]] — `left JOIN right ON v BETWEEN lb AND ub`. With a
  *      small right side we `broadcast()` it: BroadcastNestedLoopJoin where
  *      each left row scans the broadcast ranges — no shuffle of the big
  *      side at all. Equivalent to merge_asof+post-filter when ranges are
  *      disjoint (≤1 match per row, misses stay null).
  *   2. [[asOfJoinBackward]] — exact merge_asof parity under *overlapping*
  *      ranges: keep only the match with the greatest lb via row_number.
  *   3. [[bucketedRangeJoin]] — the 100 TB path. A non-equi join has no
  *      hash strategy, so we mint one: bucket = value >> shiftBits as an
  *      equi-key; each range row is exploded to every bucket it spans.
  *      Catalyst then plans a plain (broadcast/sort-merge) HASH join on the
  *      bucket key with the BETWEEN as a cheap residual filter — shuffle
  *      is O(data), never O(left × right).
  */
object RangeJoin {

  /** Left range join: attach `right`'s columns where
    * `left(valueCol) BETWEEN right(lbCol) AND right(ubCol)`.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      valueCol: String,
      lbCol: String,
      ubCol: String,
      joinType: String = "left",
      broadcastRight: Boolean = true): DataFrame = {
    val r = if (broadcastRight) broadcast(right) else right
    val cond = left(valueCol) >= r(lbCol) && left(valueCol) <= r(ubCol)
    left.join(r, cond, joinType)
  }

  /** Backward as-of join: for each left row, the right row with the
    * greatest `rightOn <= leftOn` (left outer; unmatched -> nulls).
    * Exact `pd.merge_asof(direction='backward')` semantics, including
    * overlapping / non-disjoint right intervals.
    *
    * `leftKey` must uniquely identify left rows (used to pick the single
    * best match). Right side is broadcast by default — the as-of side is
    * a dimension table in every use here.
    */
  def asOfJoinBackward(
      left: DataFrame,
      right: DataFrame,
      leftOn: String,
      rightOn: String,
      leftKey: String,
      broadcastRight: Boolean = true,
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val r = if (broadcastRight) broadcast(right) else right
    val joined = left.join(r, left(leftOn) >= r(rightOn), "left")
    // duplicate rightOn values would make the winner nondeterministic —
    // callers with non-unique as-of keys must pass a tie-break column
    val order = r(rightOn).desc_nulls_last +:
      rightTieBreak.map(c => r(c).asc_nulls_last)
    val w = Window.partitionBy(left(leftKey)).orderBy(order: _*)
    joined
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn")
  }

  /** KEYED backward as-of join — the point-in-time-correct feature
    * lookup (the feature-store join): for each left row, the latest
    * right row OF THE SAME ENTITY with `rightOn <= leftOn`. Unlike
    * [[asOfJoinBackward]] (global as-of against a small broadcast
    * dimension), both sides here can be large: the equi-key condition
    * makes Catalyst plan a keyed join (sort-merge / shuffled-hash on
    * the entity key) with the time bound as a join filter — the
    * scalable shape — and the winner is picked per LEFT ROW by a
    * window over `leftRowId` (bounded by that row's match count).
    * Rows with no qualifying right match keep nulls (left outer),
    * which is what "the feature did not exist yet" must mean in
    * training data — silently imputing here is label leakage's
    * favorite disguise.
    */
  def asOfJoinKeyed(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftOn: String,
      rightOn: String,
      leftRowId: String,
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val joined = left.join(right,
      left(leftKey) === right(rightKey) && left(leftOn) >= right(rightOn),
      "left")
    val order = right(rightOn).desc_nulls_last +:
      rightTieBreak.map(c => right(c).asc_nulls_last)
    val w = Window.partitionBy(left(leftRowId)).orderBy(order: _*)
    joined
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn")
  }

  /** General as-of join: the full `pd.merge_asof` direction/tolerance
    * surface ([[asOfJoinBackward]] is the reference's case, kept as the
    * explicit entry point the pipeline calls).
    *
    *   - `backward`: greatest `rightOn <= leftOn`
    *   - `forward` : smallest `rightOn >= leftOn`
    *   - `nearest` : smallest `|leftOn - rightOn|`; an exact tie
    *     (equidistant backward and forward candidates) resolves to the
    *     backward one, matching pandas
    *   - `tolerance`: only matches with `|leftOn - rightOn| <= tolerance`
    *     qualify; rows with no qualifying match keep nulls (left outer)
    *
    * Plan shape is the same single broadcast join + per-left-key
    * row_number as backward: the right side is the small as-of dimension,
    * so even `nearest`'s full-candidate scan never shuffles the big side.
    * For large-large as-of, pre-bucket with [[bucketedRangeJoin]].
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      leftOn: String,
      rightOn: String,
      leftKey: String,
      direction: String = "backward",
      tolerance: Option[Long] = None,
      broadcastRight: Boolean = true,
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val r = if (broadcastRight) broadcast(right) else right
    val dist = abs(left(leftOn) - r(rightOn))
    val dirCond = direction match {
      case "backward" => left(leftOn) >= r(rightOn)
      case "forward"  => left(leftOn) <= r(rightOn)
      // isNotNull, not lit(true): backward/forward's comparisons are
      // null-rejecting, so a null leftOn gets the no-match null row —
      // an unconditional true would hand it an ARBITRARY right row
      case "nearest"  => left(leftOn).isNotNull
      case other => throw new IllegalArgumentException(
        s"direction must be backward|forward|nearest, got $other")
    }
    val cond = tolerance match {
      case Some(t) => dirCond && dist <= lit(t)
      case None    => dirCond
    }
    val order: Seq[Column] = direction match {
      case "backward" => r(rightOn).desc_nulls_last +:
        rightTieBreak.map(c => r(c).asc_nulls_last)
      case "forward" => r(rightOn).asc_nulls_last +:
        rightTieBreak.map(c => r(c).asc_nulls_last)
      case "nearest" => dist.asc_nulls_last +:
        when(r(rightOn) <= left(leftOn), 0).otherwise(1).asc_nulls_last +:
        rightTieBreak.map(c => r(c).asc_nulls_last)
    }
    val w = Window.partitionBy(left(leftKey)).orderBy(order: _*)
    left.join(r, cond, "left")
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn")
  }

  /** Scale-out range join: prefix-bucket rewrite. Explodes each right
    * range over the `value >> shiftBits` buckets it spans, then equi-joins
    * on the bucket with the BETWEEN predicate as residual. Pick
    * `shiftBits` so that ranges span few buckets (e.g. 16 for /16-sized
    * IP blocks). Right side may be large — Catalyst is free to choose
    * sort-merge on the bucket key.
    */
  def bucketedRangeJoin(
      left: DataFrame,
      right: DataFrame,
      valueCol: String,
      lbCol: String,
      ubCol: String,
      shiftBits: Int,
      joinType: String = "left"): DataFrame = {
    val bucketed = right.withColumn(
      "__bucket",
      explode(sequence(
        shiftright(col(lbCol), shiftBits),
        shiftright(col(ubCol), shiftBits))))
    val l = left.withColumn("__bucket", shiftright(col(valueCol), shiftBits))
    val cond = l("__bucket") === bucketed("__bucket") &&
      l(valueCol) >= bucketed(lbCol) && l(valueCol) <= bucketed(ubCol)
    l.join(bucketed, cond, joinType)
      .drop(bucketed("__bucket")).drop(l("__bucket"))
  }

  /** The reference's geolocation flow (`transform_data.py:25-47`): as-of
    * match transactions to IP ranges, then void out-of-range matches to
    * the `'Unknown'` sentinel (`transform_data.py:38-43`). Disjoint
    * ranges make the broadcast range join equivalent — and cheaper.
    */
  def geolocate(
      tx: DataFrame,
      ipRanges: DataFrame,
      ipCol: String = "ip_address_int",
      lbCol: String = "lower_bound_ip_address_int",
      ubCol: String = "upper_bound_ip_address_int",
      countryCol: String = "country"): DataFrame = {
    val ranges = ipRanges.select(col(lbCol), col(ubCol), col(countryCol))
    rangeJoin(tx, ranges, ipCol, lbCol, ubCol)
      .withColumn(countryCol, coalesce(col(countryCol), lit("Unknown")))
      .drop(lbCol, ubCol)
  }

  /** Interval-overlap join: pairs of (left, right) rows whose closed
    * intervals [startL, endL] and [startR, endR] intersect, optionally
    * under equi-keys — the temporal-join primitive behind "which
    * sessions overlapped which incidents".
    *
    * Scale shape: both sides explode their interval over fixed-width
    * buckets (`value div bucketWidth` — width chosen near the typical
    * interval length so the fan-out stays ~1-2 rows) and equi-join on
    * (keys..., bucket) with the overlap test as residual. A pair that
    * shares several buckets would duplicate, so the join keeps only
    * the CANONICAL bucket — the one containing max(startL, startR) —
    * which every overlapping pair shares exactly once: no distinct, no
    * post-join dedup shuffle.
    *
    * Left/right columns must not collide (caller aliases); both end
    * columns must be >= their starts (malformed intervals match
    * nothing: empty bucket sequence).
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      startL: String, endL: String,
      startR: String, endR: String,
      keys: Seq[String],
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def bucketed(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(e) >= col(s)) // malformed intervals match nothing
        .withColumn("__bkt", explode(sequence(
          col(s) - pmod(col(s), lit(bucketWidth)),
          col(e) - pmod(col(e), lit(bucketWidth)),
          lit(bucketWidth))))
    val joinKeys = keys :+ "__bkt"
    bucketed(left, startL, endL)
      .join(bucketed(right, startR, endR), joinKeys)
      .filter(col(startL) <= col(endR) && col(startR) <= col(endL))
      // canonical bucket: the one holding the later of the two starts
      .filter(col("__bkt") === {
        val ms = greatest(col(startL), col(startR))
        ms - pmod(ms, lit(bucketWidth))
      })
      .drop("__bkt")
  }
}

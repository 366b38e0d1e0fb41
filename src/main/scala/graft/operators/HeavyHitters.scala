package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Materialize

/** Frequent-item detection at stream scale — the Misra–Gries
  * candidate-then-verify pattern: a full `groupBy(item).count()` over a
  * 100 TB token stream shuffles every distinct item (vocabulary-sized —
  * billions of keys, mostly singletons); the heavy hitters the caller
  * actually wants are a few hundred rows. Per-partition Misra–Gries
  * summaries (k counters, one sequential pass, O(k) memory) yield a
  * candidate set that PROVABLY contains every item with global
  * frequency > n/k — if an item is no partition's local heavy hitter
  * (freq_p <= n_p/k everywhere), summing gives freq <= n/k — and the
  * exact pass then counts ONLY candidates: the broadcast semi-join
  * filters map-side, so the shuffle carries heavy candidates instead
  * of the vocabulary tail.
  *
  * The output is therefore EXACT (the sketch only proposes; the count
  * decides) and partition-layout-proof: more partitions, different
  * splits, same final rows — which is why a plain SQL frequency filter
  * can oracle it.
  */
object HeavyHitters {

  /** One partition's Misra–Gries summary keys. Classic k-counter
    * update: hits increment; a miss with a full table decrements every
    * counter (dropping zeros) — each miss-decrement retires k+1
    * stream items, so any item seen more than n_p/(k+1) times
    * survives. Called from mapPartitions — must stay serializable.
    */
  private[graft] def mgCandidates(k: Int)(
      it: Iterator[String]): Iterator[String] = {
    val counters = mutable.HashMap.empty[String, Long]
    while (it.hasNext) {
      val x = it.next()
      val cur = counters.getOrElse(x, -1L)
      if (cur >= 0L) counters.update(x, cur + 1L)
      else if (counters.size < k) counters.update(x, 1L)
      else {
        val dead = mutable.ArrayBuffer.empty[String]
        counters.keysIterator.foreach { key =>
          val c = counters(key) - 1L
          if (c == 0L) dead += key else counters.update(key, c)
        }
        dead.foreach(counters.remove)
      }
    }
    counters.keysIterator
  }

  /** Items whose exact global frequency strictly exceeds
    * `minFraction` of the stream, with exact counts — found in two
    * passes (sketch + verify) instead of a vocabulary-wide shuffle.
    * `sketchSize` defaults to ceil(2/minFraction) — any value >=
    * ceil(1/minFraction) preserves the no-false-negative guarantee;
    * the factor 2 just shrinks the candidate spill-over.
    *
    * Output: (item, cnt, freq), freq rounded at 12, heaviest first.
    */
  def heavyHitters(
      df: DataFrame,
      itemCol: String,
      minFraction: Double,
      sketchSize: Int = 0): DataFrame = {
    require(minFraction > 0 && minFraction < 1,
      s"minFraction must be in (0,1), got $minFraction")
    val k =
      if (sketchSize > 0) sketchSize else math.ceil(2.0 / minFraction).toInt
    require(k >= math.ceil(1.0 / minFraction).toInt,
      s"sketchSize $k loses the guarantee for minFraction $minFraction")
    val spark = df.sparkSession
    val items = df
      .select(col(itemCol).cast("string").as("__item"))
      .where(col("__item").isNotNull)
    val candidates = items
      .select(col("__item"))
      .as(Encoders.STRING)
      .mapPartitions(mgCandidates(k))(Encoders.STRING)
      .distinct()
      .toDF("__item")
    val total = items.agg(count(lit(1)).as("__n"))
    items
      .join(broadcast(candidates), Seq("__item"), "left_semi")
      .groupBy(col("__item"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .where(col("cnt").cast("double") > lit(minFraction) * col("__n"))
      .select(col("__item").as(itemCol), col("cnt"),
        round(col("cnt").cast("double") / col("__n").cast("double"), 12)
          .as("freq"))
      .orderBy(col("cnt").desc, col(itemCol))
  }

  /** Count–Min sketch (Cormode & Muthukrishnan 2005) built as pure
    * dataflow, plus a per-key accuracy audit against the exact counts.
    * The sketch is `depth` hash rows × `width` counters — O(d·w) cells
    * REGARDLESS of key cardinality, mergeable by cell-wise addition
    * (each cell is a plain sum, so partial aggregation and cross-batch
    * union both work for free). Estimate = min over rows of the key's
    * cell; always >= the true count (collisions only add).
    *
    * Hashing is the engine-independent md5-derived 60-bit value
    * ([[graft.functions.TextFunctions.md5Hash60]]) salted with the row
    * index, so an oracle can rebuild the identical sketch — the point
    * of this operator is that the ESTIMATES are deterministic, not just
    * the errors.
    *
    * Shape: one explode(depth) + hash aggregate for the sketch (cells
    * ≤ d·w rows — broadcast), one aggregate for the exact side, one
    * broadcast join to score. At 100 TB the exact side is the expensive
    * pass; a production caller drops it and keeps only the sketch —
    * it's emitted here because the audit IS the query.
    */
  def cmsAudit(
      df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch dims: $depth x $width")
    // one implementation of the sketch: build + probe delegate to
    // [[graft.operators.Sketches.countMinBuild]]/[[graft.operators
    // .Sketches.countMinEstimate]] (identical "row:key" md5 cell hash);
    // this audit is the every-key-probed accuracy view over them
    val keyed = df.select(col(keyCol).cast("string").as("__key"))
      .where(col("__key").isNotNull)
    val sketch = Sketches.countMinBuild(keyed, "__key", depth, width)
    val exact = keyed.groupBy(col("__key")).agg(count(lit(1)).as("exact"))
    Sketches.countMinEstimate(sketch, exact, "__key", depth, width)
      .join(exact, Seq("__key"))
      .select(col("__key").as(keyCol), col("exact"),
        col("cms_est").as("cms_estimate"),
        (col("cms_est") - col("exact")).as("overestimate"))
  }

  /** KMV (k-minimum-values) distinct-count estimate per group, audited
    * against the exact count (Bar-Yossef et al. 2002). The sketch is
    * the k smallest hash values of the group's distinct items —
    * bounded state, mergeable by keep-smallest-k union, and with the
    * md5-derived hash DETERMINISTIC: the estimate itself replays in
    * any engine, like [[cmsAudit]]'s. Estimate = (k−1)/u_(k) with
    * u_(k) the k-th smallest hash normalized to (0,1); groups with
    * fewer than k distinct items report their exact count (the sketch
    * is exact below k by construction).
    *
    * Shape: distinct → per-group rank window over hashes → one-row-
    * per-group aggregate. The rank window processes DISTINCT items of
    * the group — the k-smallest selection a production impl would do
    * with a per-partition heap + merge; the window form keeps it
    * oracle-replayable.
    */
  def kmvDistinctAudit(
      df: DataFrame, groupCol: String, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val d = df.where(col(itemCol).isNotNull)
      .select(col(groupCol), col(itemCol).cast("string").as("__item"))
      .distinct()
      .withColumn("__h", graft.functions.TextFunctions.md5Hash60(
        col("__item")))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__h"), col("__item")) // item tie-break: 60-bit
    // collisions are improbable but a tie at rank k must not flip the
    // estimate between runs or engines
    val ranked = d.withColumn("__rn", row_number().over(w))
    val agg = ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("exact_distinct"),
        max(when(col("__rn") === k, col("__h"))).as("__hk"))
    agg.select(col(groupCol), col("exact_distinct"),
      when(col("__hk").isNotNull,
        round(lit((k - 1).toDouble)
          / (col("__hk").cast("double") / lit(1.152921504606846976e18)), 4))
        .otherwise(col("exact_distinct").cast("double"))
        .as("kmv_estimate"))
  }

  /** Theta-style SET OPERATIONS from two KMV sketches — the "how much
    * does snapshot B overlap snapshot A" question a recrawl audit asks
    * at 100 TB, answered from two k-row sketches instead of an exact
    * corpus-x-corpus distinct join. Each side keeps the k smallest
    * md5 hashes of its distinct items (`orderBy().limit(k)` — Spark
    * executes this as a distributed take-ordered, never a global
    * single-partition sort); θ is the k-th smallest of the sketch
    * UNION (which provably equals the union's own KMV sketch), and
    * every distinct item lands below θ with probability θ, so with
    * `c` = items in BOTH sketches below θ: \|A∪B\| ≈ (k−1)/θ,
    * \|A∩B\| ≈ c/θ, Jaccard ≈ c/k. When the union sketch holds fewer
    * than k entries the sketches ARE the full sets and the exact
    * counts are reported instead. The md5 hash is deterministic, so
    * every estimate replays bit-for-bit in SQL; the exact
    * intersection/union ride along for the audit (cheap at sf, the
    * thing the sketch replaces at scale).
    *
    * Output one row: (exact_union, exact_intersection, sketch_k,
    * union_sketch_size, matches_below_theta, est_union,
    * est_intersection, est_jaccard).
    */
  def kmvSetOps(
      a: DataFrame, b: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    def items(df: DataFrame) = df.where(col(itemCol).isNotNull)
      .select(col(itemCol).cast("string").as("__item")).distinct()
    def sketch(df: DataFrame) = Materialize.cut(items(df)
      .withColumn("__h",
        graft.functions.TextFunctions.md5Hash60(col("__item")))
      .orderBy(col("__h"), col("__item")).limit(k))
    val ka = sketch(a)
    val kb = sketch(b)
    val ku = Materialize.cut(ka.unionByName(kb).distinct()
      .orderBy(col("__h"), col("__item")).limit(k))
    val theta = ku.agg(max(col("__h")).as("__theta"),
      count(lit(1)).as("union_sketch_size"))
    val c = ka.join(kb, Seq("__item", "__h"))
      .crossJoin(broadcast(theta.select(col("__theta"))))
      .filter(col("__h") <= col("__theta"))
      .agg(count(lit(1)).as("matches_below_theta"))
    val ia = items(a)
    val ib = items(b)
    val exact = ia.unionByName(ib).distinct()
      .agg(count(lit(1)).as("exact_union"))
      .crossJoin(broadcast(
        ia.join(ib, Seq("__item"), "leftsemi")
          .agg(count(lit(1)).as("exact_intersection"))))
    val thetaNorm = col("__theta").cast("double") /
      lit(1.152921504606846976e18)
    exact
      .crossJoin(broadcast(theta))
      .crossJoin(broadcast(c))
      .select(col("exact_union"), col("exact_intersection"),
        lit(k).as("sketch_k"), col("union_sketch_size"),
        col("matches_below_theta"),
        when(col("union_sketch_size") < k,
            col("union_sketch_size").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) / thetaNorm, 4))
          .as("est_union"),
        when(col("union_sketch_size") < k,
            col("matches_below_theta").cast("double"))
          .otherwise(round(col("matches_below_theta").cast("double")
            / thetaNorm, 4))
          .as("est_intersection"),
        when(col("union_sketch_size") < k,
            round(col("matches_below_theta").cast("double")
              / col("union_sketch_size"), 4))
          .otherwise(round(col("matches_below_theta").cast("double")
            / lit(k.toDouble), 4))
          .as("est_jaccard"))
  }
}

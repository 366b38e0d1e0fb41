package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** HyperLogLog distinct-count sketching as pure dataflow — the
  * mergeable cardinality estimator for 100 TB streams where a
  * `count(distinct item)` would shuffle every distinct key. The
  * sketch state per group is m = 64 registers (one byte each); the
  * shuffle carries at most 64 rows per group regardless of input
  * size, and register tables from disjoint shards — or adjacent
  * window panes — merge by `max`, the property
  * `approx_count_distinct` exploits internally, exposed here as an
  * inspectable table so estimates can be audited against exact
  * counts (reference behavior: pandas `nunique`,
  * `/root/reference/src/eda/analyze_data.py:24` — this is its
  * at-scale replacement with an error contract).
  *
  * Determinism: the item hash is the engine-portable 60-bit md5
  * ([[TextFunctions.md5Hash60]]); bucket = low 6 bits, and the rank
  * rho = leading-zero count of the remaining 54 bits + 1, computed
  * from the length of the binary string (`bin`) rather than
  * floating log2 (exact at power-of-two boundaries). The harmonic
  * sum accumulates as the INTEGER sum of 2^(54 - M_j) — exact and
  * order-independent — and only the final estimate touches doubles,
  * in one fixed expression both engines fold identically.
  */
object Sketches {

  // Shared with [[Graphs.hyperAnf]], which keeps one HLL register set
  // per VERTEX (same hash, bucket, rho, and estimate math — and the
  // same SQL replay the q312/q324 oracles already pin).
  private[operators] val M = 64 // registers (p = 6)
  private[operators] val WidthBits = 54 // 60-bit hash minus 6 bucket bits
  private val Alpha = 0.709 // HLL bias constant for m = 64
  private val PowWidth = 18014398509481984.0 // 2^54

  /** Raw register table: one row per (group, bucket) with the max
    * rank. The mergeable sketch state — shards/panes combine with a
    * further per-bucket `max`.
    */
  private def registerTable(
      df: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    val h = TextFunctions.md5Hash60(col(itemCol).cast("string"))
    val hashed = df
      .filter(col(itemCol).isNotNull)
      .select(col(groupCol).as("g"), h.as("__h"))
      .select(col("g"),
        pmod(col("__h"), lit(M.toLong)).as("__b"),
        expr(s"__h div ${M.toLong}").as("__w"))
    // rho is clamped to WidthBits (54): the true rank for w == 0 is 55,
    // but the harmonic-sum term 2^(54-m) would then be shiftleft(1,-1),
    // which Spark (shift count mod 64) evaluates to 1<<63 = Long.MIN_VALUE
    // — corrupting the register sum. The bias from the clamp is one
    // half-unit in 2^54, i.e. unobservable; the q312/q324 oracles carry
    // the identical clamp.
    val rho = when(col("__w") === 0L, lit(WidthBits))
      .otherwise(lit(WidthBits + 1) - length(bin(col("__w"))))
    hashed
      .groupBy(col("g"), col("__b"))
      .agg(max(rho).cast("int").as("__m"))
  }

  /** Estimate columns from a per-group register aggregate holding
    * `used_registers` and the integer harmonic sum `__sum`; adds
    * (zero_registers, __est) with the small-range linear-counting
    * correction applied.
    */
  private[operators] def withEstimate(agg: DataFrame): DataFrame =
    agg
      .withColumn("zero_registers", lit(M) - col("used_registers"))
      .withColumn("__s",
        col("__sum") + col("zero_registers").cast("long") * lit(PowWidth.toLong))
      .withColumn("__raw",
        lit(Alpha * M * M * PowWidth) / col("__s").cast("double"))
      .withColumn("__est",
        when(col("__raw") <= lit(2.5 * M) && col("zero_registers") > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / col("zero_registers").cast("double")))
          .otherwise(col("__raw")))

  /** Per-group HLL estimate with its exact check. Output per group:
    * (groupCol, used_registers, zero_registers, est, exact, rel_err);
    * `est` applies the standard small-range linear-counting
    * correction (E <= 2.5 m with empty registers). `est`/`rel_err`
    * floor-snapped at 1e6 so the double division is hash-stable.
    */
  def hllDistinct(df: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    val perGroup = withEstimate(registerTable(df, groupCol, itemCol)
      .groupBy(col("g"))
      .agg(
        count(lit(1)).cast("int").as("used_registers"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $WidthBits - __m)"))
          .as("__sum")))
    val exact = df
      .filter(col(itemCol).isNotNull)
      .groupBy(col(groupCol).as("g"))
      .agg(countDistinct(col(itemCol)).as("exact"))
    perGroup.join(exact, Seq("g"))
      .select(col("g").as(groupCol),
        col("used_registers"), col("zero_registers"),
        (floor(col("__est") * 1e6) / 1e6).as("est"),
        col("exact"),
        (floor(abs(col("__est") - col("exact").cast("double"))
          / col("exact").cast("double") * 1e6) / 1e6).as("rel_err"))
  }

  /** Trailing-window distinct estimate via PANE MERGE — the streaming
    * distinct-count shape: one register table per (day, bucket), then
    * each day's trailing `windowDays` estimate is a register-wise
    * `max` over its panes. The data-sized work happens ONCE per pane
    * (not once per window); the merge runs over days × 64 rows. The
    * exact trailing distinct (audit column) is re-counted per window
    * — at production scale you would ship only the sketch columns and
    * drop that check.
    *
    * Output per day: (day, used_registers, est, exact, rel_err),
    * est/rel_err floor-snapped at 1e6.
    */
  def hllSlidingDistinct(
      df: DataFrame, tsCol: String, itemCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val micros = 86400L * 1000000L
    def dayOf(c: Column): Column =
      ((unix_micros(c) - pmod(unix_micros(c), lit(micros))) / lit(micros))
        .cast("long")
    val spark = df.sparkSession
    val byDay = df.select(dayOf(col(tsCol)).as("g"), col(itemCol).as("item"))
    val regs = registerTable(byDay, "g", "item")
      .select(col("g").as("day"), col("__b"), col("__m"))
    // dense (day x bucket) grid so absent panes still participate in
    // the range window (a missing bucket must not shrink the frame)
    val days = byDay.select(col("g").as("day")).distinct()
    val grid = days.crossJoin(
      broadcast(spark.range(M.toLong).select(col("id").as("__b"))))
    val merged = grid.join(regs, Seq("day", "__b"), "left")
      .withColumn("__mm", max(col("__m")).over(
        Window.partitionBy(col("__b")).orderBy(col("day"))
          .rangeBetween(-(windowDays - 1).toLong, 0L)))
    val perDay = withEstimate(merged
      .filter(col("__mm").isNotNull)
      .groupBy(col("day"))
      .agg(
        count(lit(1)).cast("int").as("used_registers"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $WidthBits - __mm)"))
          .as("__sum")))
    // exact trailing distinct (the audit side): each per-day distinct
    // item expands to the `windowDays` window-end days it is visible
    // in — an equi-shuffle on day, not a theta join — then distinct
    // per window end; days outside the observed set drop via semi-join
    val dayItems = byDay.select(col("g").as("__d"), col("item")).distinct()
    val exact = dayItems
      .select(col("item"), explode(sequence(col("__d"),
        col("__d") + (windowDays - 1))).as("day"))
      .join(days, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(countDistinct(col("item")).as("exact"))
    perDay.join(exact, Seq("day"))
      .select(col("day"), col("used_registers"),
        (floor(col("__est") * 1e6) / 1e6).as("est"),
        col("exact"),
        (floor(abs(col("__est") - col("exact").cast("double"))
          / col("exact").cast("double") * 1e6) / 1e6).as("rel_err"))
  }

  /** Count-Min sketch build (Cormode & Muthukrishnan 2005): `d`
    * independent hash rows x `w` buckets; cell (r, b) sums the counts
    * of every item whose row-r hash lands in bucket b. The frequency
    * complement to [[hllDistinct]]: sketch state is at most d*w rows
    * per build regardless of input size, shards/panes merge by
    * cell-wise SUM (a linear sketch), and a point query is an upper
    * bound on the true count with error <= e*N/w at probability
    * >= 1 - e^-d. Hash r of item x is the engine-portable
    * pmod(md5("r:x"), w), so build and probe replay exactly in SQL.
    */
  def countMinBuild(
      df: DataFrame, itemCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2; got d=$d w=$w")
    df.select(col(itemCol).cast("string").as("__item"))
      .select(col("__item"),
        explode(sequence(lit(0), lit(d - 1))).as("row"))
      .select(col("row").cast("long").as("row"),
        pmod(TextFunctions.md5Hash60(
          concat_ws(":", col("row"), col("__item"))), lit(w.toLong))
          .as("bucket"))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Mergeable equi-width histogram quantiles: per group, `bins`
    * fixed-width bins over [min, max] (two cheap aggregates for the
    * range, one for the bin counts — the per-group state is `bins`
    * integers, mergeable by cell-wise sum, CONSTANT in group size),
    * and each requested quantile is estimated by linear interpolation
    * inside the bin where the cumulative count crosses rank
    * ceil(q*n) — the one-pass, bounded-state alternative to sorting
    * the group (what `approx_percentile` trades exactness for, made
    * deterministic). The exact rank statistic rides alongside as the
    * audit (`exact`, percentile-disc semantics), so the estimate's
    * error is visible per group and quantile. Degenerate groups
    * (min = max) estimate exactly.
    *
    * Every arithmetic step is a fixed double expression over exact
    * integer counts and the group's min/max, so estimates replay
    * bit-for-bit in any engine.
    */
  def histogramQuantiles(
      df: DataFrame, groupCol: String, valCol: String,
      bins: Int, qs: Seq[Double]): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0,1], got $qs")
    val v = col(valCol).cast("double")
    val base = df.where(v.isNotNull)
      .select(col(groupCol).as("g"), v.as("__v"))
    val stats = base.groupBy(col("g"))
      .agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"),
        count(lit(1)).as("n"))
    val width = (col("__mx") - col("__mn")) / lit(bins.toDouble)
    val binned = base.join(broadcast(stats), Seq("g"))
      .withColumn("__b",
        when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(least(floor((col("__v") - col("__mn")) / width),
            lit(bins.toLong - 1L)).cast("long")))
    val cells = binned.groupBy(col("g"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy(col("g")).orderBy(col("__b"))))
    val ranked = base.withColumn("__rk", row_number().over(
      Window.partitionBy(col("g")).orderBy(col("__v"))))
    val out = qs.map { q =>
      val targets = stats.select(col("g"), col("__mn"), col("__mx"),
        col("n"), ceil(lit(q) * col("n").cast("double")).as("__k"))
      val hit = cells.join(targets, Seq("g"))
        .filter(col("__cum") >= col("__k"))
        .withColumn("__r", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("__b"))))
        .filter(col("__r") === 1)
      val est = hit.select(col("g"), col("n"),
        when(col("__mx") === col("__mn"), col("__mn"))
          .otherwise(col("__mn")
            + (col("__mx") - col("__mn")) / lit(bins.toDouble)
            * (col("__b").cast("double")
              + (col("__k") - (col("__cum") - col("__c"))).cast("double")
                / col("__c").cast("double"))).as("__est"),
        col("__k"))
      est.join(ranked.select(col("g").as("__rg"), col("__v"), col("__rk")),
          est("__k") === col("__rk") && est("g") === col("__rg"))
        .select(est("g").as(groupCol), lit(q).as("q"), col("n"),
          round(col("__est"), 12).as("est"),
          col("__v").as("exact"),
          round(abs(col("__est") - col("__v")), 12).as("abs_err"))
    }
    out.reduce(_.unionByName(_))
  }

  /** Point estimates from a [[countMinBuild]] sketch for each probe
    * item: est = min over rows of the item's cell — always >= the true
    * count. The sketch is d*w rows, so the probe join broadcasts.
    */
  /** Sliding-window Count-Min: per-day pane sketches merged by
    * cell-wise SUM over a trailing `windowDays` range frame (the linear-
    * sketch property in its windowed form — the [[hllSlidingDistinct]]
    * companion for FREQUENCY instead of cardinality), probed at the
    * `topProbes` globally most frequent items with the exact trailing
    * count alongside. State per pane is d*w cells; the dense
    * (day x cell) grid keeps absent panes from shrinking the frame,
    * and the exact audit expands per-day item counts to their
    * window-end days (an equi-shuffle, not a theta join).
    */
  def countMinSlidingCounts(
      df: DataFrame, tsCol: String, itemCol: String,
      windowDays: Int = 7, d: Int = 4, w: Int = 64,
      topProbes: Int = 3): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2; got d=$d w=$w")
    val spark = df.sparkSession
    val micros = 86400L * 1000000L
    def dayOf(c: Column): Column =
      ((unix_micros(c) - pmod(unix_micros(c), lit(micros))) / lit(micros))
        .cast("long")
    def bucketOf(row: Column, item: Column): Column =
      pmod(TextFunctions.md5Hash60(concat_ws(":", row, item)), lit(w.toLong))
    val byDay = df.select(dayOf(col(tsCol)).as("day"),
      col(itemCol).cast("string").as("item"))
    val cells = byDay
      .select(col("day"), col("item"),
        explode(sequence(lit(0), lit(d - 1))).as("row"))
      .select(col("day"), col("row").cast("long").as("row"),
        bucketOf(col("row"), col("item")).as("bucket"))
      .groupBy(col("day"), col("row"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val days = byDay.select(col("day")).distinct()
    val grid = days.crossJoin(broadcast(
      spark.range(d.toLong).select(col("id").as("row"))
        .crossJoin(spark.range(w.toLong).select(col("id").as("bucket")))))
    val merged = grid.join(cells, Seq("day", "row", "bucket"), "left")
      .withColumn("__mc", coalesce(sum(col("c")).over(
        Window.partitionBy(col("row"), col("bucket")).orderBy(col("day"))
          .rangeBetween(-(windowDays - 1).toLong, 0L)), lit(0L)))
    val probes = byDay.groupBy(col("item")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("item")).limit(topProbes)
      .select(col("item"))
    val pcells = probes
      .select(col("item"), explode(sequence(lit(0), lit(d - 1))).as("row"))
      .select(col("item"), col("row").cast("long").as("row"),
        bucketOf(col("row"), col("item")).as("bucket"))
    val est = merged.join(broadcast(pcells), Seq("row", "bucket"))
      .groupBy(col("day"), col("item"))
      .agg(min(col("__mc")).as("cms_est"))
    val perDay = byDay.groupBy(col("day"), col("item"))
      .agg(count(lit(1)).as("n"))
    val exact = perDay.join(broadcast(probes), Seq("item"))
      .select(col("item"), col("n"),
        explode(sequence(col("day"), col("day") + (windowDays - 1))).as("day"))
      .join(days, Seq("day"), "left_semi")
      .groupBy(col("day"), col("item"))
      .agg(sum(col("n")).as("exact"))
    est.join(exact, Seq("day", "item"), "left")
      .select(col("day"), col("item"), col("cms_est"),
        coalesce(col("exact"), lit(0L)).as("exact"),
        (col("cms_est") - coalesce(col("exact"), lit(0L))).as("overcount"))
  }

  def countMinEstimate(
      sketch: DataFrame, probes: DataFrame, itemCol: String,
      d: Int, w: Int): DataFrame = {
    val cells = probes
      .select(col(itemCol), col(itemCol).cast("string").as("__item"))
      .select(col(itemCol),
        explode(sequence(lit(0), lit(d - 1))).as("row"), col("__item"))
      .select(col(itemCol), col("row").cast("long").as("row"),
        pmod(TextFunctions.md5Hash60(
          concat_ws(":", col("row"), col("__item"))), lit(w.toLong))
          .as("bucket"))
    cells.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
  }
}

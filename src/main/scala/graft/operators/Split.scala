package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T1: stratified train/test split (reference `transform_data.py:121-123`,
  * sklearn `train_test_split(test_size, random_state, stratify=y)`).
  *
  * Exact per-class fractions, deterministic under seed: rank rows within
  * each class by a seeded content hash of the caller-supplied tie-break
  * columns (`xxhash64(tieBreak..., seed)`), send the first
  * `ceil(n * testFrac)` to test — sklearn also sizes the test split with
  * ceil. The hash order is a pure function of row CONTENT, never of
  * partitioning: a recomputed lineage (executor loss, unpersisted
  * upstream, AQE re-plan) reproduces the identical membership, where a
  * `rand(seed)` order silently depends on partition layout and row
  * arrival order — on a real cluster that is a train/test-overlap bug
  * waiting for the first retried stage. `rand(seed)` is only used when
  * no tie-break columns are given (no content to hash). Row-identical
  * parity with sklearn is impossible (different PRNG streams); parity is
  * distributional: disjoint, exhaustive, per-class sizes exact.
  *
  * Scale: one shuffle on the class column; the per-class window is the
  * only ordering — no global sort. Class cardinality is tiny, so AQE
  * coalesces fine; for a pathological single-class skew use more salt in
  * `tieBreak` and a two-level rank.
  */
object Split {

  final case class SplitResult(train: DataFrame, test: DataFrame)

  def stratified(
      df: DataFrame,
      labelCol: String,
      testFrac: Double,
      seed: Long,
      tieBreak: Seq[Column] = Nil): SplitResult = {
    val order: Seq[Column] = tieBreak match {
      case Nil => Seq(rand(seed))
      case tb  => xxhash64(tb :+ lit(seed): _*) +: tb
    }
    val wRank = Window.partitionBy(col(labelCol)).orderBy(order: _*)
    val wAll = Window.partitionBy(col(labelCol))
    val tagged = df
      .withColumn("__rn", row_number().over(wRank))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__is_test", col("__rn") <= ceil(col("__n") * lit(testFrac)))
    SplitResult(
      train = tagged.filter(!col("__is_test")).drop("__rn", "__n", "__is_test"),
      test = tagged.filter(col("__is_test")).drop("__rn", "__n", "__is_test"))
  }

  /** Split-size audit: per-class train/test row counts. The counts (not
    * the membership) are fully determined by n and testFrac — oracle-able.
    */
  def summary(df: DataFrame, labelCol: String, testFrac: Double, seed: Long): DataFrame = {
    val SplitResult(train, test) = stratified(df, labelCol, testFrac, seed)
    val t = train.groupBy(col(labelCol)).agg(count(lit(1)).as("n_train"))
    val s = test.groupBy(col(labelCol)).agg(count(lit(1)).as("n_test"))
    // full outer + coalesce: a class whose train (or test) half is empty
    // must still appear with a zero count, not vanish from the audit
    t.join(s, Seq(labelCol), "full_outer")
      .select(col(labelCol),
        coalesce(col("n_train"), lit(0L)).as("n_train"),
        coalesce(col("n_test"), lit(0L)).as("n_test"))
      .orderBy(col(labelCol))
  }
}

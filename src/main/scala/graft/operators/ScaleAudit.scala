package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-flight audits for running a plan at scale: join-key skew
  * profiling (the number that decides whether a join needs salting)
  * and reshape helpers live in [[Reshape]].
  */
object ScaleAudit {

  /** Join-key skew profile for one key column: distinct keys, total
    * rows, the heaviest key's share, and the skew ratio
    * max_freq / mean_freq — the number to check BEFORE keying a join
    * or aggregation on the column (ratio ≫ 1 ⇒ one reducer drags the
    * stage; see [[SkewJoin.saltedJoin]] for the fix). Emits one row
    * per audited column so a whole schema profiles in one pass each.
    *
    * Shape: per-key hash count, then a one-row summary — the classic
    * two-level aggregate; nothing global except the final single-row
    * reduce.
    */
  def keySkewProfile(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    keyCols.map { k =>
      df.groupBy(col(k).as("__key")).agg(count(lit(1)).as("__n"))
        .agg(
          count(lit(1)).as("n_keys"),
          sum(col("__n")).as("n_rows"),
          max(col("__n")).as("max_freq"))
        .select(
          lit(k).as("key_col"),
          col("n_keys"), col("n_rows"), col("max_freq"),
          (col("max_freq").cast("double")
            / (col("n_rows").cast("double") / col("n_keys").cast("double")))
            .as("skew_ratio"),
          (col("max_freq").cast("double") / col("n_rows").cast("double"))
            .as("top_key_share"))
    }.reduce(_ unionAll _)
  }
}

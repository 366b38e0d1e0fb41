package graft.streaming

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{RangeJoin, TimeFeatures}

/** Real-time scoring of the fraud feature pipeline (BASELINE
  * `spark_approach: "MLlib + Structured Streaming"`): the batch EP1
  * transform chain applied to a `readStream` of transactions.
  *
  * Composition rules the plan relies on:
  *   - geolocation is a STREAM-STATIC broadcast range join — the IP
  *     dimension is batch, so each micro-batch joins against the same
  *     broadcast table, no streaming state;
  *   - stateless features (hour/weekday/elapsed) are narrow maps;
  *   - the fitted `PipelineModel.transform` is also per-row stateless
  *     (indexers/encoders/scalers carry their statistics), so it
  *     composes with streaming DataFrames directly;
  *   - the stateful velocity feature comes from
  *     [[StreamingOps.velocityWithState]] upstream, or a sliding-window
  *     approximation via [[StreamingOps.slidingVelocity]].
  */
object StreamingScoring {

  /** Enrich a (possibly streaming) transaction frame with country +
    * temporal features — everything except the stateful velocity, which
    * has its own streaming operator.
    */
  def enrich(
      tx: DataFrame,
      ipRanges: DataFrame,
      ipCol: String = "ip_address_int",
      purchaseTs: String = "purchase_time",
      signupTs: String = "signup_time"): DataFrame = {
    val geo = RangeJoin.geolocate(tx, ipRanges, ipCol = ipCol)
    geo
      .withColumn("hour_of_day", TimeFeatures.hourOfDay(col(purchaseTs)))
      .withColumn("day_of_week", TimeFeatures.dayOfWeekMon0(col(purchaseTs)))
      .withColumn("time_since_signup_seconds",
        TimeFeatures.secondsBetween(col(signupTs), col(purchaseTs)))
      .withColumn("time_since_signup_hours",
        TimeFeatures.hoursBetween(col(signupTs), col(purchaseTs)))
  }

  /** Score an enriched stream with a batch-fitted model. */
  def score(enriched: DataFrame, model: PipelineModel): DataFrame =
    model.transform(enriched)
}

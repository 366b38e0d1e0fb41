package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wide↔long reshape: `melt` (unpivot) turns N metric columns into
  * (metric, value) rows — the long format every plotting/aggregation
  * layer downstream of an EDA wants, and the inverse of the pivot in
  * EdaQueries. Implemented with Catalyst's `stack` generator so the
  * reshape stays inside whole-stage codegen (zero shuffles: melt is a
  * pure flatMap).
  */
object Reshape {

  /** Unpivot `valueCols` (all cast to double) into (`metric`,
    * `value`) rows, carrying `idCols` through. Row order within a
    * source row follows `valueCols` order.
    */
  def melt(
      df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
      metricName: String = "metric", valueName: String = "value")
      : DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column")
    val stackArgs = valueCols
      .map(c => s"'$c', cast(`$c` as double)").mkString(", ")
    df.selectExpr(
      idCols.map(c => s"`$c`") :+
        s"stack(${valueCols.size}, $stackArgs) as (`$metricName`, `$valueName`)": _*)
  }
}

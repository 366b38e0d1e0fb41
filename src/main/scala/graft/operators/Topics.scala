package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Topic-mixture estimation as pure dataflow: one multinomial-EM step of
  * an LDA-style topic model (uniform Dirichlet priors folded out), the
  * corpus-curation primitive behind topic balancing — estimate what each
  * document is about, then re-weight the mixture per topic the way
  * [[Mixture.sampleMixture]] re-weights per source.
  *
  * Everything is joins + aggregations over (doc, word, count) triples:
  *   - init: hash-seeded theta0(d,t) and phi0(t,w), each normalized;
  *   - E:    r(d,w,t) = theta0(d,t)*phi0(t,w) / sum_t' ...;
  *   - M:    theta1(d,t) = sum_w n*r / n_d,
  *           phi1(t,w)   = sum_d n*r / sum_{d,w} n*r.
  * The topic axis is a `k`-row explode (k is a model constant, not
  * data), so the widest relation is postings x k — the EM step costs k
  * scans of the inverted index, never |docs| x |vocab|.
  *
  * Cross-engine determinism: every responsibility is floor-snapped to a
  * decimal grid BEFORE the order-sensitive aggregation (floor of an
  * identical IEEE double is identical everywhere — no round()-tie or
  * cast-tie exposure, see ARCHITECTURE's half-boundary note), and every
  * sum accumulates in decimal with unscaled values held far below 2^53.
  */
object Topics {

  private def hashU(prefix: String, a: Column, b: Column): Column =
    TextFunctions.md5Hash60(concat(lit(prefix), a.cast("string"),
      lit("_"), b.cast("string"))).cast("double") /
      lit(1152921504606846976.0 /* 2^60 */)

  /** floor-snap to the 1e-14 grid: the double stays bit-identical in
    * any IEEE engine and its decimal(30,14) image is exact (unscaled
    * < 1e14 << 2^53 for values below 1).
    */
  private def snap14(c: Column): Column = floor(c * 1e14) / 1e14

  private def snap12(c: Column): Column = floor(c * 1e12) / 1e12

  /** E step shared by both M-side views: (idCol, w, topic, n, __nr)
    * where __nr = n * r(d,w,t), snapped to the 1e-12 grid.
    */
  private def eStep(
      df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val topics = explode(sequence(lit(0), lit(k - 1))).as("topic")
    val tc = df.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("n"))
    val vocab = tc.select(col("w")).distinct()
    val phiRaw = vocab.select(col("w"), topics)
      .withColumn("__raw", lit(0.5) + hashU("phi_", col("topic"), col("w")))
    val phiDen = phiRaw.groupBy(col("topic"))
      .agg(sum(col("__raw").cast("decimal(30,12)")).cast("double")
        .as("__pden"))
    val phi0 = phiRaw.join(phiDen, Seq("topic"))
      .select(col("topic"), col("w"), (col("__raw") / col("__pden")).as("phi"))
    val thetaRaw = df.select(col(idCol)).distinct().select(col(idCol), topics)
      .withColumn("__raw", lit(0.5) + hashU("theta_", col(idCol), col("topic")))
    val thetaDen = thetaRaw.groupBy(col(idCol))
      .agg(sum(col("__raw").cast("decimal(30,12)")).cast("double")
        .as("__tden"))
    val theta0 = thetaRaw.join(thetaDen, Seq(idCol))
      .select(col(idCol), col("topic"),
        (col("__raw") / col("__tden")).as("theta"))
    val joint = tc
      .join(phi0, Seq("w"))
      .join(theta0, Seq(idCol, "topic"))
      .withColumn("__j", snap14(col("theta") * col("phi")))
    val den = joint.groupBy(col(idCol), col("w"))
      .agg(sum(col("__j").cast("decimal(30,14)")).cast("double").as("__den"))
    joint.join(den, Seq(idCol, "w"))
      .withColumn("__nr", snap12(col("n") * (col("__j") / col("__den"))))
      .select(col(idCol), col("w"), col("topic"), col("n"), col("__nr"))
  }

  /** One EM step; returns per-document topic weights
    * (idCol, topic, theta) — k rows per document.
    */
  def ldaEmStep(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 4): DataFrame = {
    val resp = eStep(df, textCol, idCol, k)
    val nd = resp.filter(col("topic") === 0)
      .groupBy(col(idCol)).agg(sum(col("n")).as("__nd"))
    resp
      .groupBy(col(idCol), col("topic"))
      .agg(sum(col("__nr").cast("decimal(30,12)")).as("__num"))
      .join(nd, Seq(idCol))
      .select(col(idCol), col("topic"),
        (col("__num").cast("double") / col("__nd").cast("double"))
          .as("theta"))
  }

  /** The phi side of the same M step: re-estimated topic-word weights,
    * top `top` words per topic — the human-readable summary of what
    * each topic collects. Ties break by word.
    */
  def ldaTopWords(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 4,
      top: Int = 10): DataFrame = {
    val resp = eStep(df, textCol, idCol, k)
    val num = resp.groupBy(col("topic"), col("w"))
      .agg(sum(col("__nr").cast("decimal(30,12)")).as("__num"))
    val tden = num.groupBy(col("topic"))
      .agg(sum(col("__num")).cast("double").as("__td"))
    val ranked = num.join(tden, Seq("topic"))
      .select(col("topic"), col("w"),
        (col("__num").cast("double") / col("__td")).as("phi"))
    val w = Window.partitionBy(col("topic"))
      .orderBy(col("phi").desc, col("w"))
    ranked.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= top)
  }
}

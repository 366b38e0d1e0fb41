package graft.sources

import java.io.FileInputStream

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** S2: YAML pipeline/feature config (reference `src/config_loader.py:3-5`
  * + `configs/pipeline_config.yaml` / `configs/fraud_feature_config.yaml`).
  * snakeyaml ships with Spark's classpath — no extra dependency.
  */
final case class PipelineConfig(
    dataPaths: Map[String, String],
    testSize: Double,
    randomState: Long,
    missingValueStrategy: String,
    imbalanceStrategy: String,
    numericalFeatures: Seq[String],
    categoricalFeatures: Seq[String])

object PipelineConfig {

  val Default: PipelineConfig = PipelineConfig(
    dataPaths = Map.empty,
    testSize = 0.2,
    randomState = 42L,
    missingValueStrategy = "drop",
    imbalanceStrategy = "smote",
    numericalFeatures = Seq(
      "purchase_value", "age", "time_since_signup_seconds",
      "time_since_signup_hours", "user_id_transactions_24h",
      "device_id_transactions_24h", "ip_address_transactions_24h"),
    categoricalFeatures = Seq(
      "source", "browser", "sex", "hour_of_day", "day_of_week", "country"))

  /** Parse the pipeline yaml; feature lists fall back to the reference's
    * fraud_feature_config.yaml contents when absent.
    */
  def fromYaml(path: String): PipelineConfig = {
    val in = new FileInputStream(path)
    try {
      val root = new Yaml().load[java.util.Map[String, Object]](in).asScala
      def str(k: String, d: String): String =
        root.get(k).map(_.toString).getOrElse(d)
      val paths = root.get("data_paths") match {
        case Some(m: java.util.Map[_, _]) =>
          m.asScala.map { case (k, v) => k.toString -> v.toString }.toMap
        case _ => Map.empty[String, String]
      }
      def strs(k: String, d: Seq[String]): Seq[String] = root.get(k) match {
        case Some(l: java.util.List[_]) => l.asScala.map(_.toString).toSeq
        case _ => d
      }
      Default.copy(
        dataPaths = paths,
        testSize = str("test_size", "0.2").toDouble,
        randomState = str("random_state", "42").toLong,
        missingValueStrategy = str("missing_value_strategy", "drop"),
        imbalanceStrategy = str("imbalance_strategy", "smote"),
        numericalFeatures = strs("numerical_features", Default.numericalFeatures),
        categoricalFeatures = strs("categorical_features", Default.categoricalFeatures))
    } finally in.close()
  }
}

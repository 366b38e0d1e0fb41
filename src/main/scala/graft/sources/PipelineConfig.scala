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
      "time_since_signup_hours", "user_transactions_24h",
      "device_transactions_24h", "ip_transactions_24h"),
    categoricalFeatures = Seq(
      "source", "browser", "sex", "hour_of_day", "day_of_week", "country"))

  private def loadYaml(path: String): scala.collection.Map[String, Object] = {
    val in = new FileInputStream(path)
    // SnakeYAML returns null for an empty / comments-only document —
    // a valid "all defaults" config, not an NPE (DocConfig's guard)
    try Option(new Yaml().load[java.util.Map[String, Object]](in))
      .map(_.asScala).getOrElse(scala.collection.Map.empty)
    finally in.close()
  }

  /** Parse the pipeline yaml (reference `configs/pipeline_config.yaml`
    * layout). A `feature_config_path` entry is followed and its
    * `numerical:` / `categorical:` lists loaded (the reference's
    * two-file layout); inline `numerical_features:` /
    * `categorical_features:` keys also work for single-file configs.
    */
  def fromYaml(path: String): PipelineConfig = {
    val root = loadYaml(path)
    def str(k: String, d: String): String =
      root.get(k).map(_.toString).getOrElse(d)
    val paths = root.get("data_paths") match {
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.map { case (k, v) => k.toString -> v.toString }.toMap
      case _ => Map.empty[String, String]
    }
    def strsFrom(m: scala.collection.Map[String, Object], keys: Seq[String],
        d: Seq[String]): Seq[String] =
      keys.iterator.map(m.get).collectFirst {
        case Some(l: java.util.List[_]) => l.asScala.map(_.toString).toSeq
      }.getOrElse(d)
    // two-file layout: follow feature_config_path — as given, else the
    // FULL relative path resolved against the pipeline config's
    // directory (getName would drop intermediate dirs and miss
    // configs/features.yaml). A named-but-missing file FAILS FAST: the
    // silent fallback to hardcoded default feature lists would train on
    // the wrong features with no error (CsvSource's fail-fast rule).
    val featureCfg: scala.collection.Map[String, Object] =
      root.get("feature_config_path").map(_.toString) match {
        case Some(p) =>
          val direct = new java.io.File(p)
          val resolved =
            if (direct.exists()) direct
            else new java.io.File(new java.io.File(path).getParentFile, p)
          if (!resolved.exists())
            throw new IllegalArgumentException(
              s"feature_config_path '$p' (from $path) does not exist " +
                s"(tried '$direct' and '$resolved')")
          loadYaml(resolved.getPath)
        case None => root
      }
    Default.copy(
      dataPaths = paths,
      testSize = str("test_size", "0.2").toDouble,
      randomState = str("random_state", "42").toLong,
      missingValueStrategy = str("missing_value_strategy", "drop"),
      imbalanceStrategy = str("imbalance_strategy", "smote"),
      numericalFeatures = strsFrom(featureCfg,
        Seq("numerical", "numerical_features"), Default.numericalFeatures),
      categoricalFeatures = strsFrom(featureCfg,
        Seq("categorical", "categorical_features"), Default.categoricalFeatures))
  }
}

package graft.sources

import java.io.FileInputStream

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

import graft.pipeline.DocPipeline.{DocPipelineConfig, DocPipelineV2Config, DocPipelineV3Config}

/** YAML surface for the corpus-prep pipelines — the same config-driven
  * design the reference uses for its fraud pipeline
  * (`config_loader.py` + `pipeline_config.yaml`), extended to the LLM
  * side: a data engineer retunes quality floors, dedup thresholds, and
  * mixture weights per corpus release without touching code.
  *
  * Absent keys keep the code defaults, so a config names only what it
  * overrides. Unknown keys are ignored (forward compatibility between
  * config and engine versions).
  */
object DocConfig {

  private def loadYaml(path: String): scala.collection.Map[String, Object] = {
    val in = new FileInputStream(path)
    // SnakeYAML returns null for an empty / comments-only document —
    // that's a valid "all defaults" config, not an NPE
    try Option(new Yaml().load[java.util.Map[String, Object]](in))
      .map(_.asScala).getOrElse(scala.collection.Map.empty)
    finally in.close()
  }

  private def dbl(m: scala.collection.Map[String, Object], k: String, d: Double) =
    m.get(k).map(_.toString.toDouble).getOrElse(d)
  private def int(m: scala.collection.Map[String, Object], k: String, d: Int) =
    m.get(k).map(_.toString.toInt).getOrElse(d)

  /** `v1:` section → [[DocPipelineConfig]] (scrub→quality→lang→dedup→
    * chunk). Keys: min_quality, langs, near_dup_threshold, chunk_size,
    * overlap, num_hashes, bands.
    */
  def v1FromYaml(path: String): DocPipelineConfig = {
    val m = section(path, "v1")
    val d = DocPipelineConfig()
    DocPipelineConfig(
      minQuality = dbl(m, "min_quality", d.minQuality),
      langs = m.get("langs") match {
        case Some(l: java.util.List[_]) => l.asScala.map(_.toString).toSet
        case _ => d.langs
      },
      nearDupThreshold = dbl(m, "near_dup_threshold", d.nearDupThreshold),
      chunkSize = int(m, "chunk_size", d.chunkSize),
      overlap = int(m, "overlap", d.overlap),
      numHashes = int(m, "num_hashes", d.numHashes),
      bands = int(m, "bands", d.bands))
  }

  /** `v2:` section → [[DocPipelineV2Config]] (quality→repetition→
    * keep-best→mixture). Keys: min_quality, max_top_token_frac,
    * near_dup_threshold, weights (domain→weight map), seed, num_hashes,
    * bands. `weights` is required — a mixture without targets is
    * meaningless, and defaulting it would silently sample nothing.
    */
  def v2FromYaml(path: String): DocPipelineV2Config = {
    val m = section(path, "v2")
    val d = DocPipelineV2Config()
    val weights = m.get("weights") match {
      case Some(w: java.util.Map[_, _]) =>
        w.asScala.map { case (k, v) => k.toString -> v.toString.toDouble }.toMap
      case _ => throw new IllegalArgumentException(
        s"doc config $path: v2.weights (domain -> weight map) is required")
    }
    DocPipelineV2Config(
      minQuality = dbl(m, "min_quality", d.minQuality),
      maxTopTokenFrac = dbl(m, "max_top_token_frac", d.maxTopTokenFrac),
      nearDupThreshold = dbl(m, "near_dup_threshold", d.nearDupThreshold),
      weights = weights,
      seed = m.get("seed").map(_.toString.toLong).getOrElse(d.seed),
      numHashes = int(m, "num_hashes", d.numHashes),
      bands = int(m, "bands", d.bands))
  }

  /** `v3:` section → [[DocPipelineV3Config]] (NFC→scrub→quality→
    * keep-best→DSIR). Keys: min_quality, span_k, near_dup_threshold,
    * target_source, n_select, num_buckets, seed, num_hashes, bands.
    * `target_source` is required — DSIR selection without a target
    * distribution is meaningless, and defaulting it would silently
    * skew the corpus toward an arbitrary slice.
    */
  def v3FromYaml(path: String): DocPipelineV3Config = {
    val m = section(path, "v3")
    val d = DocPipelineV3Config()
    val target = m.get("target_source") match {
      case Some(t) => t.toString
      case None => throw new IllegalArgumentException(
        s"doc config $path: v3.target_source is required")
    }
    DocPipelineV3Config(
      minQuality = dbl(m, "min_quality", d.minQuality),
      spanK = int(m, "span_k", d.spanK),
      nearDupThreshold = dbl(m, "near_dup_threshold", d.nearDupThreshold),
      targetSource = target,
      nSelect = int(m, "n_select", d.nSelect),
      numBuckets = int(m, "num_buckets", d.numBuckets),
      seed = m.get("seed").map(_.toString.toLong).getOrElse(d.seed),
      numHashes = int(m, "num_hashes", d.numHashes),
      bands = int(m, "bands", d.bands))
  }

  private def section(path: String, name: String) =
    loadYaml(path).get(name) match {
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.map { case (k, v) => k.toString -> v.asInstanceOf[Object] }
      case _ => scala.collection.Map.empty[String, Object]
    }
}

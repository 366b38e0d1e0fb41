package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as partition-batched typed transforms
  * (`Dataset.mapPartitions` — the Scala analogue of arrow-batched UDFs:
  * one iterator per partition, vectorizable batch shape, no per-row
  * driver round-trips).
  *
  * DECODE IS A STUB: no media codecs exist in this environment, so
  * [[decodeStub]] derives deterministic fake "pixels" from the raw
  * bytes. The Spark-side contract — schema, encoders, partition
  * batching, feature shapes — is real and tested; swapping in a real
  * codec only replaces the stub body.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      media: Array[Byte],
      media_type: String,
      declared_width: Int,
      declared_height: Int)

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      mean_byte: Double,
      byte_entropy: Double,
      feature: Array[Double])

  /** STUB decode: deterministic fake decode of a media payload — byte
    * statistics + a 16-bin byte histogram as the "embedding". A real
    * implementation would decode pixels/samples here.
    */
  def decodeStub(bytes: Array[Byte]): (Double, Double, Array[Double]) = {
    if (bytes == null || bytes.isEmpty) return (0.0, 0.0, Array.fill(16)(0.0))
    val counts = new Array[Long](256)
    var sum = 0L
    bytes.foreach { b => val u = b & 0xFF; counts(u) += 1; sum += u }
    val n = bytes.length.toDouble
    val mean = sum / n
    val entropy = -counts.filter(_ > 0).map { c =>
      val p = c / n; p * math.log(p) / math.log(2)
    }.sum
    val hist = Array.tabulate(16)(i =>
      (i * 16 until (i + 1) * 16).map(counts(_)).sum / n)
    (mean, entropy, hist)
  }

  /** Feature extraction over a media Dataset — partition-batched typed
    * transform; executors never materialize more than one partition's
    * iterator.
    */
  def decodeFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { row =>
        val (mean, entropy, hist) = decodeStub(row.media)
        val n = if (row.media == null) 0L else row.media.length.toLong
        MediaFeatures(row.media_id, row.media_type, n, mean, entropy, hist)
      }
    }
  }

  /** STUB resize: deterministic downsample of the fake pixel stream by
    * striding — keeps every (factor)-th byte. Real impl: bilinear etc.
    */
  def resizeStub(ds: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    require(factor > 0)
    ds.mapPartitions(_.map { r =>
      val strided = r.media.grouped(factor).map(_.head).toArray
      r.copy(media = strided,
        declared_width = math.max(1, r.declared_width / factor),
        declared_height = math.max(1, r.declared_height / factor))
    })
  }

  /** STUB frame sampling for "video" payloads: split the byte stream
    * into fixed-size fake frames, emit every `stride`-th frame.
    * Row-generating — flatMap, still partition-batched.
    */
  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  def frameSample(ds: Dataset[MediaRow], frameBytes: Int, stride: Int): Dataset[Frame] = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      r.media.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, i) if i % stride == 0 => Frame(r.media_id, i, chunk)
      }
    }
  }

  /** Lift any DataFrame with (id, text) into a fake media table — the
    * bridge used by tests and harness queries (no real media in the
    * container).
    */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      coalesce(col(textCol), lit("")).cast("binary").as("media"),
      lit("image/fake").as("media_type"),
      lit(64).as("declared_width"),
      lit(64).as("declared_height"))
      .as[MediaRow]
  }
}

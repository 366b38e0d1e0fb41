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
  * IMAGE DECODE IS REAL for the formats the JDK ships codecs for
  * (PNG/JPEG/BMP/GIF via `javax.imageio.ImageIO` — no external
  * libraries): [[decodeImage]] yields true width/height/band-count and
  * a 16-bin luminance histogram. Payloads ImageIO cannot read (raw
  * text, audio, video, exotic containers) fall back to [[decodeStub]]'s
  * deterministic byte statistics with `decoded_width/height = -1,
  * channels = 0`, so the operator is total over arbitrary binaries.
  * Audio/video codecs still do not exist in this environment; those
  * stay byte-stat stubs by construction.
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
      decoded_width: Int,
      decoded_height: Int,
      channels: Int,
      feature: Array[Double])

  /** A really-decoded image: dimensions, band count, and a 16-bin
    * histogram of per-pixel mean band intensity (0..255 range).
    */
  final case class DecodedImage(
      width: Int, height: Int, channels: Int, lumaHist: Array[Double])

  /** Real image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF).
    * Returns None when no installed reader claims the payload — the
    * caller falls back to byte statistics. Runs inside mapPartitions on
    * executors; ImageIO is headless-safe.
    */
  def decodeImage(bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      // in-memory ImageInputStream: the default disk-backed stream cache
      // would add a temp-file write per decode on every executor
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val bands = raster.getNumBands
        val hist = new Array[Double](16)
        val px = new Array[Int](bands)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.getPixel(x, y, px)
            var s = 0; var b = 0
            while (b < bands) { s += px(b); b += 1 }
            // mean band intensity; sample models beyond 8-bit clamp to 255
            val v = math.min(255, s / bands)
            hist(v >> 4) += 1.0
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        var i = 0
        while (i < 16) { hist(i) /= n; i += 1 }
        Some(DecodedImage(w, h, bands, hist))
      }
    } catch { case _: Throwable => None }
  }

  /** Fallback decode for payloads no installed codec reads: byte
    * statistics + a 16-bin byte histogram as the "embedding".
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
    * iterator. Byte statistics (n_bytes, mean_byte, byte_entropy) are
    * computed for every payload — they are format-independent transport
    * diagnostics; decoded fields come from [[decodeImage]] when a JDK
    * codec reads the payload, else the byte-histogram fallback with
    * sentinel dimensions.
    */
  def decodeFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { row =>
        val (mean, entropy, hist) = decodeStub(row.media)
        val n = if (row.media == null) 0L else row.media.length.toLong
        decodeImage(row.media) match {
          case Some(img) =>
            MediaFeatures(row.media_id, row.media_type, n, mean, entropy,
              img.width, img.height, img.channels, img.lumaHist)
          case None =>
            MediaFeatures(row.media_id, row.media_type, n, mean, entropy,
              -1, -1, 0, hist)
        }
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

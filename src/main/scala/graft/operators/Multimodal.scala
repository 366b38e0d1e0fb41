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

  /** A really-decoded image: dimensions, band count, a 16-bin
    * histogram of per-pixel mean band intensity (0..255 range), and
    * the 64-bit average-hash over the 8×8 block-mean luma grid
    * (bit k set ⇔ block k brighter than the grid mean — the classic
    * aHash; near-identical images differ in few bits).
    */
  final case class DecodedImage(
      width: Int, height: Int, channels: Int, lumaHist: Array[Double],
      aHash: Long)

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
        // 8x8 block accumulators for the average-hash: block of (x, y)
        // = (x*8/w, y*8/h) — integer mapping, no resample pass
        val blockSum = new Array[Long](64)
        val blockN = new Array[Long](64)
        val px = new Array[Int](bands)
        var y = 0
        while (y < h) {
          val by = math.min(7, y * 8 / h)
          var x = 0
          while (x < w) {
            raster.getPixel(x, y, px)
            var s = 0; var b = 0
            while (b < bands) { s += px(b); b += 1 }
            // mean band intensity; sample models beyond 8-bit clamp to 255
            val v = math.min(255, s / bands)
            hist(v >> 4) += 1.0
            val bi = (by << 3) | math.min(7, x * 8 / w)
            blockSum(bi) += v
            blockN(bi) += 1
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        var i = 0
        while (i < 16) { hist(i) /= n; i += 1 }
        // aHash: block mean vs global mean of block means (empty blocks
        // of tiny images inherit 0 — deterministic)
        val means = Array.tabulate(64)(i =>
          if (blockN(i) > 0) blockSum(i).toDouble / blockN(i) else 0.0)
        val gm = means.sum / 64.0
        var aHash = 0L
        i = 0
        while (i < 64) { if (means(i) > gm) aHash |= (1L << i); i += 1 }
        Some(DecodedImage(w, h, bands, hist, aHash))
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

  /** Per-media perceptual hash: the decoded 64-bit aHash when a JDK
    * codec reads the payload ([[decodeImage]]), else a 16-bit
    * byte-histogram signature (bin share > histogram mean) — both
    * deterministic, both content-derived, so re-encodes of the same
    * pixels (or byte-identical transports) collide. One partition-
    * batched map; the hash travels through shuffles, never the media.
    */
  final case class MediaHash(
      media_id: Long, phash: Long, decoded: Boolean)

  def perceptualHash(ds: Dataset[MediaRow]): Dataset[MediaHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { row =>
      decodeImage(row.media) match {
        case Some(img) => MediaHash(row.media_id, img.aHash, decoded = true)
        case None =>
          // integer formulation of "bin share > mean share": every
          // byte lands in exactly one of 16 bins, so mean share is
          // 1/16 and share_i > mean ⇔ 16·count_i > n — exact, no
          // double-summation-order hazard across engines
          val bytes = if (row.media == null) Array.empty[Byte] else row.media
          val counts = new Array[Long](16)
          bytes.foreach(b => counts((b & 0xFF) >> 4) += 1)
          val n = bytes.length.toLong
          var h = 0L
          var i = 0
          while (i < 16) { if (16L * counts(i) > n) h |= (1L << i); i += 1 }
          MediaHash(row.media_id, h, decoded = false)
      }
    })
  }

  /** Perceptual-duplicate clusters: group by exact hash, report each
    * cluster's size and lowest-id representative. Exact-hash grouping
    * is the scale-safe first cut (one shuffle on a 64-bit key);
    * near-duplicate pairs under a Hamming radius use
    * [[perceptualNearDupPairs]].
    */
  def perceptualClusters(ds: Dataset[MediaRow]): DataFrame =
    perceptualHash(ds).toDF()
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_members"),
        min(col("media_id")).as("representative"))

  /** Near-duplicate media pairs within Hamming distance `maxHamming`
    * of the perceptual hash: band the hash into `bands` exact-match
    * keys (pigeonhole: a pair within radius < bands shares ≥ 1 band —
    * guaranteed recall for maxHamming ≤ bands−1), equi-join on
    * (band, band-bits), verify with bit_count(xor). The SimHash
    * banding shape applied to media.
    */
  def perceptualNearDupPairs(
      ds: Dataset[MediaRow], maxHamming: Int, bands: Int = 4,
      hashBits: Int = 64): DataFrame = {
    require(bands >= 1 && hashBits % bands == 0)
    require(maxHamming >= 0 && maxHamming < bands,
      s"banding guarantees recall only for maxHamming < bands")
    val width = hashBits / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val hashes = perceptualHash(ds).toDF()
    val banded = hashes.select(col("media_id"), col("phash"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          (shiftright(col("phash"), b * width).bitwiseAND(lit(mask)))
            .as("bits"))): _*)).as("bk"))
      .select(col("media_id"), col("phash"),
        col("bk.band").as("band"), col("bk.bits").as("bits"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits")
          && col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash")))
          .cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
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

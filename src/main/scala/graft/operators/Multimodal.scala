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
  *
  * AUDIO/VIDEO HEADER METADATA IS REAL too: [[parseContainerMeta]]
  * walks WAV/RIFF chunks and MP4 (ISO BMFF) boxes with pure-JVM byte
  * parsing — duration, sample rate, channels, bit depth, codec tag —
  * no codec needed. Only audio/video PAYLOAD decode remains stubbed
  * (no codecs exist in this environment, by construction).
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
  // ---------------------------------------------------------------------
  // Container-header metadata: REAL pure-JVM byte parsing for WAV/RIFF
  // and MP4 (ISO BMFF box) headers — duration, sample rate, channels,
  // bit depth, codec tag — with the byte-stat sentinel for anything
  // else. No codecs exist in this environment, so PAYLOAD decode for
  // audio/video stays stubbed; header metadata needs none and is the
  // part a curation pipeline filters on (drop <1 s clips, mono-only,
  // non-isom brands) before ever shipping bytes to a decoder fleet.
  // ---------------------------------------------------------------------

  /** Parsed container header. Sentinels for fields a container does not
    * carry: sample_rate −1, channels/bits 0, duration −1 when unknown.
    */
  final case class ContainerMeta(
      container: String, codec: String, sample_rate: Int, channels: Int,
      bits_per_sample: Int, duration_ms: Long)

  final case class ContainerMetaRow(
      media_id: Long, container: String, codec: String, sample_rate: Int,
      channels: Int, bits_per_sample: Int, duration_ms: Long, n_bytes: Long)

  private def leShort(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def leInt(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def beInt(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
  private def beLong(b: Array[Byte], o: Int): Long =
    ((beInt(b, o) & 0xFFFFFFFFL) << 32) | (beInt(b, o + 4) & 0xFFFFFFFFL)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  private val UnknownMeta = ContainerMeta("unknown", "", -1, 0, 0, -1L)

  /** Total parser: WAV/RIFF chunks, then MP4 top-level boxes, else the
    * unknown sentinel. Defensive on truncated/lying sizes — any
    * structural violation degrades to what was parsed so far or the
    * sentinel, never throws.
    */
  def parseContainerMeta(bytes: Array[Byte]): ContainerMeta = {
    if (bytes == null || bytes.length < 12) return UnknownMeta
    try {
      if (fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "WAVE") {
        var p = 12
        var fmt = -1; var ch = 0; var sr = -1; var byteRate = 0
        var bits = 0; var dataSize = -1L
        while (p + 8 <= bytes.length) {
          val id = fourcc(bytes, p)
          val size = leInt(bytes, p + 4)
          if (size < 0) return UnknownMeta
          if (id == "fmt " && p + 8 + 16 <= bytes.length) {
            fmt = leShort(bytes, p + 8)
            ch = leShort(bytes, p + 10)
            sr = leInt(bytes, p + 12)
            byteRate = leInt(bytes, p + 16)
            bits = leShort(bytes, p + 22)
          } else if (id == "data") {
            dataSize = size.toLong
          }
          p += 8 + size + (size & 1) // RIFF chunks are word-aligned
        }
        val codec = fmt match {
          case 1 => "pcm"
          case 3 => "ieee_float"
          case -1 => ""
          case n => s"fmt_$n"
        }
        val dur = if (dataSize >= 0 && byteRate > 0)
          dataSize * 1000L / byteRate else -1L
        ContainerMeta("wav", codec, sr, ch, bits, dur)
      } else if (fourcc(bytes, 4) == "ftyp") {
        var p = 0
        var brand = ""
        var timescale = 0; var durTicks = -1L
        while (p + 8 <= bytes.length) {
          val size = beInt(bytes, p)
          val typ = fourcc(bytes, p + 4)
          if (size < 8) return UnknownMeta
          if (typ == "ftyp" && p + 12 <= bytes.length) {
            brand = fourcc(bytes, p + 8)
          } else if (typ == "moov") {
            // scan child boxes for mvhd
            var q = p + 8
            val end = math.min(bytes.length, p + size)
            while (q + 8 <= end) {
              val csize = beInt(bytes, q)
              if (csize < 8) return UnknownMeta
              if (fourcc(bytes, q + 4) == "mvhd" && q + 32 <= end) {
                // bound reads by the mvhd box's OWN declared end — a
                // truncated box must not read its sibling's bytes
                val hEnd = math.min(end, q + csize)
                val version = bytes(q + 8) & 0xFF
                if (version == 1) {
                  // a truncated v1 box keeps the unknown sentinel —
                  // reading v0 offsets from a v1 layout would yield a
                  // wrong timescale/duration, not a degraded one
                  if (q + 8 + 32 <= hEnd) {
                    timescale = beInt(bytes, q + 8 + 20)
                    durTicks = beLong(bytes, q + 8 + 24)
                  }
                } else if (version == 0 && q + 8 + 20 <= hEnd) {
                  timescale = beInt(bytes, q + 8 + 12)
                  durTicks = beInt(bytes, q + 8 + 16) & 0xFFFFFFFFL
                } // unknown versions keep the sentinel
              }
              q += csize
            }
          }
          p += size
        }
        val dur = if (durTicks >= 0 && timescale > 0)
          durTicks * 1000L / timescale else -1L
        ContainerMeta("mp4", brand, -1, 0, 0, dur)
      } else UnknownMeta
    } catch { case _: Throwable => UnknownMeta }
  }

  final case class TrackMeta(
      track_idx: Int, timescale: Int, duration_ms: Long, codec: String)

  final case class TrackMetaRow(
      media_id: Long, track_idx: Int, timescale: Int, duration_ms: Long,
      codec: String)

  /** First child box of the given fourcc in [start, end), or -1. */
  private def findBox(b: Array[Byte], start: Int, end: Int,
      typ: String): Int = {
    var p = start
    while (p + 8 <= end) {
      val size = beInt(b, p)
      if (size < 8) return -1
      if (fourcc(b, p + 4) == typ) return p
      p += size
    }
    -1
  }

  /** Per-track MP4 metadata: walks `moov/trak/mdia/mdhd` for the
    * per-track timescale/duration and `mdia/minf/stbl/stsd` for the
    * first sample entry's codec fourcc — the fields an ingest
    * pipeline actually filters on (is there an audio track? what
    * codec? how long?). One row per `trak` box in file order; missing
    * or truncated inner boxes degrade that row to sentinels
    * (timescale −1, duration −1, codec "") with the same
    * version-guard discipline as the movie-level parser: a truncated
    * v1 mdhd keeps the sentinel, never a v0 misread. Non-MP4 and
    * garbage payloads yield zero rows, never a throw.
    */
  def parseTrackMeta(bytes: Array[Byte]): Seq[TrackMeta] = {
    if (bytes == null || bytes.length < 12) return Seq.empty
    if (fourcc(bytes, 4) != "ftyp") return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[TrackMeta]
    try {
      var p = 0
      while (p + 8 <= bytes.length) {
        val size = beInt(bytes, p)
        if (size < 8) return out.toSeq
        if (fourcc(bytes, p + 4) == "moov") {
          val end = math.min(bytes.length, p + size)
          var q = p + 8
          var idx = 0
          while (q + 8 <= end) {
            val cs = beInt(bytes, q)
            if (cs < 8) return out.toSeq
            if (fourcc(bytes, q + 4) == "trak") {
              val tEnd = math.min(end, q + cs)
              var ts = -1
              var durMs = -1L
              var codec = ""
              val mdia = findBox(bytes, q + 8, tEnd, "mdia")
              if (mdia >= 0) {
                val mEnd = math.min(tEnd, mdia + beInt(bytes, mdia))
                val mdhd = findBox(bytes, mdia + 8, mEnd, "mdhd")
                if (mdhd >= 0) {
                  var rawTs = 0
                  var durTicks = -1L
                  // bound reads by the mdhd box's OWN declared end —
                  // the parent's end would let a truncated box read
                  // its sibling's bytes as field values
                  val hEnd = math.min(mEnd, mdhd + beInt(bytes, mdhd))
                  val version = bytes(mdhd + 8) & 0xFF
                  if (version == 1) {
                    if (mdhd + 8 + 32 <= hEnd) {
                      rawTs = beInt(bytes, mdhd + 8 + 20)
                      durTicks = beLong(bytes, mdhd + 8 + 24)
                    }
                  } else if (version == 0 && mdhd + 8 + 20 <= hEnd) {
                    rawTs = beInt(bytes, mdhd + 8 + 12)
                    durTicks = beInt(bytes, mdhd + 8 + 16) & 0xFFFFFFFFL
                  }
                  if (rawTs > 0) ts = rawTs
                  if (durTicks >= 0 && rawTs > 0)
                    durMs = durTicks * 1000L / rawTs
                }
                val minf = findBox(bytes, mdia + 8, mEnd, "minf")
                if (minf >= 0) {
                  val iEnd = math.min(mEnd, minf + beInt(bytes, minf))
                  val stbl = findBox(bytes, minf + 8, iEnd, "stbl")
                  if (stbl >= 0) {
                    val sEnd = math.min(iEnd, stbl + beInt(bytes, stbl))
                    val stsd = findBox(bytes, stbl + 8, sEnd, "stsd")
                    if (stsd >= 0 && stsd + 24 <= sEnd &&
                        beInt(bytes, stsd + 12) >= 1)
                      codec = fourcc(bytes, stsd + 20)
                  }
                }
              }
              out += TrackMeta(idx, ts, durMs, codec)
              idx += 1
            }
            q += cs
          }
        }
        p += size
      }
      out.toSeq
    } catch { case _: Throwable => out.toSeq }
  }

  /** Per-track metadata over a media Dataset — the track-level
    * companion to [[containerMeta]]; same partition-batched map, only
    * fixed-size rows travel onward.
    */
  def trackMeta(ds: Dataset[MediaRow]): Dataset[TrackMetaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { r =>
      parseTrackMeta(r.media).map(t =>
        TrackMetaRow(r.media_id, t.track_idx, t.timescale, t.duration_ms,
          t.codec))
    })
  }

  /** Header metadata over a media Dataset — one partition-batched map;
    * only the fixed-size metadata row travels onward, never the media.
    */
  def containerMeta(ds: Dataset[MediaRow]): Dataset[ContainerMetaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val m = parseContainerMeta(r.media)
      val n = if (r.media == null) 0L else r.media.length.toLong
      ContainerMetaRow(r.media_id, m.container, m.codec, m.sample_rate,
        m.channels, m.bits_per_sample, m.duration_ms, n)
    })
  }

  /** Deterministic PCM WAV fixture: canonical 44-byte header + silent
    * payload. Exercises the parser's real byte offsets; the oracle
    * recomputes the header arithmetic from the same parameters.
    */
  def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Int): Array[Byte] = {
    require(bitsPerSample % 8 == 0 && bitsPerSample > 0)
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nSamples * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ISO-8859-1")).putInt(36 + dataSize)
      .put("WAVE".getBytes("ISO-8859-1"))
      .put("fmt ".getBytes("ISO-8859-1")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * blockAlign)
      .putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
      .put("data".getBytes("ISO-8859-1")).putInt(dataSize)
    bb.array()
  }

  /** Deterministic MP4 fixture: 16-byte ftyp + moov{mvhd v0} (116
    * bytes) — 132 bytes total, no media payload.
    */
  def mp4Bytes(brand: String, timescale: Int, durationTicks: Long): Array[Byte] = {
    require(brand.length == 4, "brand is a fourcc")
    val bb = java.nio.ByteBuffer.allocate(16 + 116)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(16).put("ftyp".getBytes("ISO-8859-1"))
      .put(brand.getBytes("ISO-8859-1")).putInt(0)
    bb.putInt(116).put("moov".getBytes("ISO-8859-1"))
    bb.putInt(108).put("mvhd".getBytes("ISO-8859-1"))
      .putInt(0) // version 0 + flags
      .putInt(0).putInt(0) // creation, modification
      .putInt(timescale).putInt(durationTicks.toInt)
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0.toShort) // rate, volume, reserved
      .putInt(0).putInt(0) // reserved
    // identity matrix
    bb.putInt(0x00010000).putInt(0).putInt(0)
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
    (0 until 6).foreach(_ => bb.putInt(0)) // pre_defined
    bb.putInt(2) // next_track_id
    bb.array()
  }

  /** Deterministic multi-track MP4 fixture: ftyp + moov{mvhd v0,
    * trak{mdia{mdhd v0, minf{stbl{stsd{one 16-byte sample entry}}}}}
    * per track}. Exercises [[parseTrackMeta]]'s real nested-box
    * offsets; the oracle recomputes the duration arithmetic from the
    * same parameters. `tracks`: (timescale, durationTicks, codec
    * fourcc) per track, in file order.
    */
  def mp4BytesWithTracks(brand: String, timescale: Int,
      durationTicks: Long, tracks: Seq[(Int, Long, String)]): Array[Byte] = {
    require(brand.length == 4, "brand is a fourcc")
    tracks.foreach(t => require(t._3.length == 4, "codec is a fourcc"))
    val trakSize = 96 // 8 + mdia(88 = 8 + mdhd(32) + minf(48))
    val moovSize = 8 + 108 + trakSize * tracks.size
    val bb = java.nio.ByteBuffer.allocate(16 + moovSize)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(16).put("ftyp".getBytes("ISO-8859-1"))
      .put(brand.getBytes("ISO-8859-1")).putInt(0)
    bb.putInt(moovSize).put("moov".getBytes("ISO-8859-1"))
    bb.putInt(108).put("mvhd".getBytes("ISO-8859-1"))
      .putInt(0) // version 0 + flags
      .putInt(0).putInt(0) // creation, modification
      .putInt(timescale).putInt(durationTicks.toInt)
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0.toShort)
      .putInt(0).putInt(0) // reserved
    bb.putInt(0x00010000).putInt(0).putInt(0)
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000) // identity matrix
    (0 until 6).foreach(_ => bb.putInt(0)) // pre_defined
    bb.putInt(tracks.size + 1) // next_track_id
    tracks.foreach { case (ts, dur, codec) =>
      bb.putInt(96).put("trak".getBytes("ISO-8859-1"))
      bb.putInt(88).put("mdia".getBytes("ISO-8859-1"))
      bb.putInt(32).put("mdhd".getBytes("ISO-8859-1"))
        .putInt(0) // version 0 + flags
        .putInt(0).putInt(0) // creation, modification
        .putInt(ts).putInt(dur.toInt)
        .putShort(0x55C4.toShort) // language ("und")
        .putShort(0.toShort) // pre_defined
      bb.putInt(48).put("minf".getBytes("ISO-8859-1"))
      bb.putInt(40).put("stbl".getBytes("ISO-8859-1"))
      bb.putInt(32).put("stsd".getBytes("ISO-8859-1"))
        .putInt(0) // version 0 + flags
        .putInt(1) // entry_count
      bb.putInt(16).put(codec.getBytes("ISO-8859-1"))
        .putShort(0.toShort).putInt(0) // 6 reserved bytes
        .putShort(1.toShort) // data_reference_index
    }
    bb.array()
  }

  /** Parsed PNG header + chunk inventory. Sentinels when the payload
    * is not a PNG (bad signature or no IHDR): dimensions/depth/type
    * −1, counts 0, has_iend false.
    */
  final case class PngMeta(
      width: Int, height: Int, bit_depth: Int, color_type: Int,
      interlace: Int, n_chunks: Int, n_idat: Int, idat_bytes: Long,
      has_iend: Boolean)

  final case class PngMetaRow(
      media_id: Long, width: Int, height: Int, bit_depth: Int,
      color_type: Int, interlace: Int, n_chunks: Int, n_idat: Int,
      idat_bytes: Long, has_iend: Boolean, n_bytes: Long)

  private val UnknownPng = PngMeta(-1, -1, -1, -1, -1, 0, 0, 0L, has_iend = false)

  private val PngSignature =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Total PNG chunk walk: 8-byte signature, then (length, fourcc,
    * data, crc) chunks until IEND. Defensive like
    * [[parseContainerMeta]] — a negative or lying length stops the
    * walk at what was parsed so far; a payload without the signature
    * or a parseable IHDR yields the sentinel; never throws. CRCs are
    * inventoried, not validated (metadata extraction, not decoding).
    */
  def parsePngMeta(bytes: Array[Byte]): PngMeta = {
    if (bytes == null || bytes.length < 8 + 8 + 13 + 4) return UnknownPng
    var i = 0
    while (i < 8) { if (bytes(i) != PngSignature(i)) return UnknownPng; i += 1 }
    var p = 8
    var width = -1; var height = -1; var depth = -1; var ctype = -1
    var interlace = -1
    var nChunks = 0; var nIdat = 0; var idatBytes = 0L; var iend = false
    var stop = false
    while (!stop && p + 8 <= bytes.length) {
      val len = beInt(bytes, p)
      if (len < 0 || p + 8 + len.toLong + 4 > bytes.length) stop = true
      else {
        val id = fourcc(bytes, p + 4)
        nChunks += 1
        if (id == "IHDR" && len >= 13) {
          width = beInt(bytes, p + 8)
          height = beInt(bytes, p + 12)
          depth = bytes(p + 16) & 0xFF
          ctype = bytes(p + 17) & 0xFF
          interlace = bytes(p + 20) & 0xFF
        } else if (id == "IDAT") {
          nIdat += 1
          idatBytes += len.toLong
        } else if (id == "IEND") {
          iend = true
          stop = true
        }
        p += 8 + len + 4
      }
    }
    if (width < 0) UnknownPng
    else PngMeta(width, height, depth, ctype, interlace, nChunks, nIdat,
      idatBytes, iend)
  }

  /** PNG metadata over a media Dataset — same shape as
    * [[containerMeta]]: one partition-batched map, only the fixed-size
    * metadata row travels onward.
    */
  def pngMeta(ds: Dataset[MediaRow]): Dataset[PngMetaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val m = parsePngMeta(r.media)
      val n = if (r.media == null) 0L else r.media.length.toLong
      PngMetaRow(r.media_id, m.width, m.height, m.bit_depth, m.color_type,
        m.interlace, m.n_chunks, m.n_idat, m.idat_bytes, m.has_iend, n)
    })
  }

  /** Deterministic PNG fixture: signature + IHDR + `idatSizes` IDAT
    * chunks of deterministic filler + IEND. CRC fields are zeroed (the
    * parser inventories, it does not validate). Size is
    * 8 + 25 + Σ(12 + size) + 12 bytes.
    */
  def pngBytes(width: Int, height: Int, bitDepth: Int, colorType: Int,
      interlace: Int, idatSizes: Seq[Int]): Array[Byte] = {
    require(width > 0 && height > 0, "dimensions must be positive")
    require(idatSizes.forall(_ >= 0), "idat sizes must be non-negative")
    val total = 8 + 25 + idatSizes.map(12 + _).sum + 12
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(PngSignature)
    bb.putInt(13).put("IHDR".getBytes("ISO-8859-1"))
      .putInt(width).putInt(height)
      .put(bitDepth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte)
      .putInt(0) // crc (not validated)
    idatSizes.foreach { sz =>
      bb.putInt(sz).put("IDAT".getBytes("ISO-8859-1"))
      var j = 0
      while (j < sz) { bb.put((j % 251).toByte); j += 1 }
      bb.putInt(0)
    }
    bb.putInt(0).put("IEND".getBytes("ISO-8859-1")).putInt(0)
    bb.array()
  }

  /** Parsed JPEG frame header. Sentinels when the payload is not a
    * JPEG (no SOI or no SOF before SOS/end): dimensions/precision/
    * components −1, flags false, n_segments 0.
    */
  final case class JpegMeta(
      width: Int, height: Int, precision: Int, n_components: Int,
      progressive: Boolean, has_jfif: Boolean, has_exif: Boolean,
      n_segments: Int)

  final case class JpegMetaRow(
      media_id: Long, width: Int, height: Int, precision: Int,
      n_components: Int, progressive: Boolean, has_jfif: Boolean,
      has_exif: Boolean, n_segments: Int, n_bytes: Long)

  private val UnknownJpeg =
    JpegMeta(-1, -1, -1, -1, progressive = false, has_jfif = false,
      has_exif = false, n_segments = 0)

  /** Total JPEG marker walk: SOI, then (0xFF marker, BE length,
    * payload) segments until SOS or EOI — SOF0/1 (baseline) and SOF2
    * (progressive) carry precision/height/width/components; APP0
    * "JFIF\0" and APP1 "Exif\0\0" flag the metadata wrappers an ingest
    * pipeline filters on. Defensive like [[parsePngMeta]]: lying or
    * truncated lengths stop the walk; a payload without SOI + a SOF
    * yields the sentinel; never throws. Entropy-coded data is never
    * touched — the walk ends at SOS.
    */
  def parseJpegMeta(bytes: Array[Byte]): JpegMeta = {
    if (bytes == null || bytes.length < 4) return UnknownJpeg
    if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8)
      return UnknownJpeg
    var p = 2
    var width = -1; var height = -1; var prec = -1; var ncomp = -1
    var prog = false; var jfif = false; var exif = false; var nSeg = 0
    var stop = false
    while (!stop && p + 2 <= bytes.length) {
      if ((bytes(p) & 0xFF) != 0xFF) { stop = true }
      else {
        // ITU-T T.81 B.1.1.2: any number of 0xFF fill bytes may pad
        // the gap before a marker — a 0xFF followed by another 0xFF
        // is padding, not a marker of 0xFF. Skip to the run's last
        // 0xFF so bytes(p+1) is the real marker byte.
        while (p + 2 <= bytes.length && (bytes(p + 1) & 0xFF) == 0xFF)
          p += 1
        if (p + 2 > bytes.length) { stop = true }
        else {
        val marker = bytes(p + 1) & 0xFF
        if (marker == 0xD9 || marker == 0xDA) { // EOI / SOS: done
          nSeg += 1
          stop = true
        } else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
          nSeg += 1 // standalone marker, no length
          p += 2
        } else if (p + 4 > bytes.length) { stop = true }
        else {
          val len = ((bytes(p + 2) & 0xFF) << 8) | (bytes(p + 3) & 0xFF)
          if (len < 2 || p + 2 + len > bytes.length) stop = true
          else {
            nSeg += 1
            if ((marker == 0xC0 || marker == 0xC1 || marker == 0xC2)
              && len >= 8) {
              prec = bytes(p + 4) & 0xFF
              height = ((bytes(p + 5) & 0xFF) << 8) | (bytes(p + 6) & 0xFF)
              width = ((bytes(p + 7) & 0xFF) << 8) | (bytes(p + 8) & 0xFF)
              ncomp = bytes(p + 9) & 0xFF
              prog = marker == 0xC2
            } else if (marker == 0xE0 && len >= 7
              && fourcc(bytes, p + 4) == "JFIF" && bytes(p + 8) == 0) {
              jfif = true
            } else if (marker == 0xE1 && len >= 8
              && fourcc(bytes, p + 4) == "Exif" && bytes(p + 8) == 0
              && bytes(p + 9) == 0) {
              exif = true
            }
            p += 2 + len
          }
        }
        }
      }
    }
    if (width < 0) UnknownJpeg
    else JpegMeta(width, height, prec, ncomp, prog, jfif, exif, nSeg)
  }

  /** JPEG metadata over a media Dataset — same shape as
    * [[containerMeta]]/[[pngMeta]].
    */
  def jpegMeta(ds: Dataset[MediaRow]): Dataset[JpegMetaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val m = parseJpegMeta(r.media)
      val n = if (r.media == null) 0L else r.media.length.toLong
      JpegMetaRow(r.media_id, m.width, m.height, m.precision,
        m.n_components, m.progressive, m.has_jfif, m.has_exif,
        m.n_segments, n)
    })
  }

  /** Deterministic JPEG fixture: SOI + JFIF APP0 + optional Exif APP1
    * (minimal 8-byte ident payload) + SOF0/SOF2 + SOS + 4 entropy
    * filler bytes + EOI. Segment count: 3 (APP0, SOF, SOS) + 1 if
    * exif. Size: 2 + 18 + (exif ? 12 : 0) + (10 + 3*components)
    * + 2 + 4 + 2 bytes.
    */
  def jpegBytes(width: Int, height: Int, components: Int,
      progressive: Boolean, withExif: Boolean): Array[Byte] = {
    require(width > 0 && width <= 0xFFFF && height > 0 && height <= 0xFFFF)
    require(components >= 1 && components <= 4)
    val sofLen = 8 + 3 * components
    val total = 2 + 18 + (if (withExif) 12 else 0) + (2 + sofLen) + 2 + 4 + 2
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putShort(0xFFD8.toShort) // SOI
    bb.putShort(0xFFE0.toShort).putShort(16.toShort) // APP0, len 16
      .put("JFIF".getBytes("ISO-8859-1")).put(0.toByte)
      .putShort(0x0102.toShort).put(0.toByte) // version, units
      .putShort(1.toShort).putShort(1.toShort) // densities
      .put(0.toByte).put(0.toByte) // thumbnail
    if (withExif) {
      bb.putShort(0xFFE1.toShort).putShort(10.toShort)
        .put("Exif".getBytes("ISO-8859-1")).put(0.toByte).put(0.toByte)
        .putShort(0x4949.toShort) // TIFF byte-order stub
    }
    bb.putShort((if (progressive) 0xFFC2 else 0xFFC0).toShort)
      .putShort(sofLen.toShort)
      .put(8.toByte) // precision
      .putShort(height.toShort).putShort(width.toShort)
      .put(components.toByte)
    (1 to components).foreach { c =>
      bb.put(c.toByte).put(0x11.toByte).put(0.toByte)
    }
    bb.putShort(0xFFDA.toShort) // SOS (walk stops here)
    bb.putInt(0x00C0FFEE) // entropy filler
    bb.putShort(0xFFD9.toShort) // EOI
    bb.array()
  }

  /** Parsed Exif IFD0 summary. Sentinels when the payload has no
    * APP1 Exif TIFF block (or a malformed one): byte_order "",
    * n_entries 0, orientation −1, has_gps false, datetime "".
    */
  final case class ExifMeta(
      byte_order: String, n_entries: Int, orientation: Int,
      has_gps: Boolean, datetime: String)

  final case class ExifMetaRow(
      media_id: Long, byte_order: String, n_entries: Int,
      orientation: Int, has_gps: Boolean, datetime: String,
      n_bytes: Long)

  private val UnknownExif =
    ExifMeta("", 0, -1, has_gps = false, "")

  /** Real Exif walk: the JPEG marker walk finds APP1 `Exif\0\0`, then
    * the embedded TIFF block parses byte-order-aware — `II`/`MM`
    * header, magic 42, IFD0 offset, then the 12-byte
    * (tag, type, count, value) entries: orientation (0x0112, SHORT,
    * inline — the rotate-before-train signal), the GPS-IFD pointer
    * (0x8825 — the PII flag a privacy scrub keys on), and DateTime
    * (0x0132, ASCII, OFFSET-addressed — dereferenced against the TIFF
    * base with bounds checks). Defensive like [[parsePngMeta]]: lying
    * offsets/lengths degrade to the sentinel or skip the field; never
    * throws.
    */
  def parseExifMeta(bytes: Array[Byte]): ExifMeta = {
    if (bytes == null || bytes.length < 4) return UnknownExif
    if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8)
      return UnknownExif
    // find APP1 Exif via the marker walk (fill-byte tolerant)
    var p = 2
    var tiffBase = -1
    var tiffEnd = -1
    var stop = false
    while (!stop && tiffBase < 0 && p + 4 <= bytes.length) {
      if ((bytes(p) & 0xFF) != 0xFF) stop = true
      else {
        var q = p
        while (q + 1 < bytes.length && (bytes(q + 1) & 0xFF) == 0xFF)
          q += 1 // ITU-T T.81 B.1.1.2 fill bytes
        val marker = bytes(q + 1) & 0xFF
        if (marker == 0xD9 || marker == 0xDA) stop = true
        else if (q + 4 > bytes.length) stop = true
        else {
          val len = ((bytes(q + 2) & 0xFF) << 8) | (bytes(q + 3) & 0xFF)
          if (len < 2 || q + 2 + len > bytes.length) stop = true
          else {
            if (marker == 0xE1 && len >= 2 + 6 + 8 &&
                fourcc(bytes, q + 4) == "Exif" &&
                bytes(q + 8) == 0 && bytes(q + 9) == 0) {
              tiffBase = q + 10
              tiffEnd = q + 2 + len
            }
            p = q + 2 + len
          }
        }
      }
    }
    if (tiffBase < 0 || tiffBase + 8 > tiffEnd) return UnknownExif
    val le = bytes(tiffBase) == 'I' && bytes(tiffBase + 1) == 'I'
    val be = bytes(tiffBase) == 'M' && bytes(tiffBase + 1) == 'M'
    if (!le && !be) return UnknownExif
    def u16(o: Int): Int =
      if (le) leShort(bytes, o)
      else ((bytes(o) & 0xFF) << 8) | (bytes(o + 1) & 0xFF)
    def u32(o: Int): Long =
      if (le) leInt(bytes, o) & 0xFFFFFFFFL
      else beInt(bytes, o) & 0xFFFFFFFFL
    if (u16(tiffBase + 2) != 42) return UnknownExif
    val ifdOff = u32(tiffBase + 4)
    val ifd = tiffBase + ifdOff
    if (ifdOff < 0 || ifd + 2 > tiffEnd) return UnknownExif
    val n = u16(ifd.toInt)
    if (ifd + 2 + 12L * n + 4 > tiffEnd) return UnknownExif
    var orientation = -1
    var gps = false
    var datetime = ""
    var i = 0
    while (i < n) {
      val e = (ifd + 2 + 12 * i).toInt
      val tag = u16(e)
      val typ = u16(e + 2)
      val cnt = u32(e + 4)
      if (tag == 0x0112 && typ == 3 && cnt == 1L)
        orientation = u16(e + 8)
      else if (tag == 0x8825) gps = true
      else if (tag == 0x0132 && typ == 2 && cnt >= 2L && cnt <= 64L) {
        val off = tiffBase + u32(e + 8)
        if (off >= tiffBase && off + cnt <= tiffEnd)
          datetime = new String(bytes, off.toInt, cnt.toInt - 1,
            "ISO-8859-1") // NUL-terminated ASCII
      }
      i += 1
    }
    ExifMeta(if (le) "II" else "MM", n, orientation, gps, datetime)
  }

  /** Exif metadata over a media Dataset — same shape as [[pngMeta]]. */
  def exifMeta(ds: Dataset[MediaRow]): Dataset[ExifMetaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val m = parseExifMeta(r.media)
      val n = if (r.media == null) 0L else r.media.length.toLong
      ExifMetaRow(r.media_id, m.byte_order, m.n_entries, m.orientation,
        m.has_gps, m.datetime, n)
    })
  }

  /** Deterministic TIFF block for the APP1 Exif payload: II/MM header
    * + IFD0 with orientation (inline SHORT), optional GPS-IFD pointer,
    * and a DateTime ASCII entry whose 20-byte value lives out-of-line
    * after the IFD (offset-addressed, exercising the deref path).
    */
  def tiffIfdBytes(littleEndian: Boolean, orientation: Int,
      withGps: Boolean, datetime: String): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, "orientation in [1,8]")
    require(datetime.length == 19, "Exif DateTime is 19 chars + NUL")
    val n = if (withGps) 3 else 2
    val ifdSize = 2 + 12 * n + 4
    val dtOff = 8 + ifdSize
    val bb = java.nio.ByteBuffer.allocate(dtOff + 20)
      .order(if (littleEndian) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN)
    bb.put((if (littleEndian) "II" else "MM").getBytes("ISO-8859-1"))
    bb.putShort(42.toShort).putInt(8)
    bb.putShort(n.toShort)
    // 0x0112 orientation, SHORT x1, inline in the value field's
    // FIRST TWO BYTES under the declared byte order
    bb.putShort(0x0112.toShort).putShort(3.toShort).putInt(1)
      .putShort(orientation.toShort).putShort(0.toShort)
    // 0x0132 DateTime, ASCII x20, offset-addressed
    bb.putShort(0x0132.toShort).putShort(2.toShort).putInt(20)
      .putInt(dtOff)
    if (withGps)
      bb.putShort(0x8825.toShort).putShort(4.toShort).putInt(1)
        .putInt(dtOff + 20) // pointer target not dereferenced
    bb.putInt(0) // next-IFD offset
    bb.put(datetime.getBytes("ISO-8859-1")).put(0.toByte)
    bb.array()
  }

  /** Deterministic JPEG fixture with a REAL APP1 Exif TIFF block:
    * SOI + APP1(Exif + `tiff`) + minimal SOF0 + SOS + EOI.
    */
  def jpegBytesWithTiff(width: Int, height: Int,
      tiff: Array[Byte]): Array[Byte] = {
    require(width > 0 && width <= 0xFFFF && height > 0 && height <= 0xFFFF)
    val app1Len = 2 + 6 + tiff.length
    val sofLen = 8 + 3
    val total = 2 + (2 + app1Len) + (2 + sofLen) + 2 + 4 + 2
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putShort(0xFFD8.toShort)
    bb.putShort(0xFFE1.toShort).putShort(app1Len.toShort)
      .put("Exif".getBytes("ISO-8859-1")).put(0.toByte).put(0.toByte)
      .put(tiff)
    bb.putShort(0xFFC0.toShort).putShort(sofLen.toShort)
      .put(8.toByte).putShort(height.toShort).putShort(width.toShort)
      .put(1.toByte)
    bb.put(1.toByte).put(0x11.toByte).put(0.toByte)
    bb.putShort(0xFFDA.toShort)
    bb.putInt(0x00C0FFEE)
    bb.putShort(0xFFD9.toShort)
    bb.array()
  }

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

  final case class WarcRecMeta(
      rec_idx: Int,
      warc_type: String,
      target_uri: String,
      content_length: Long,
      n_headers: Int,
      payload_off: Int)

  final case class WarcRecRow(
      media_id: Long,
      rec_idx: Int,
      warc_type: String,
      target_uri: String,
      content_length: Long,
      n_headers: Int,
      n_bytes: Long)

  /** Byte-walk the WARC record grammar (ISO 28500 / WARC/1.x — the
    * format web crawls actually arrive in): each record is a
    * `WARC/1.x` version line, CRLF-separated `Name: value` header
    * lines, an empty line, `Content-Length` payload bytes, and a
    * CRLF CRLF record separator. Returns one row per well-formed
    * record — WARC-Type, WARC-Target-URI ("" when absent, e.g.
    * warcinfo), Content-Length, header count — walking records in
    * order and STOPPING at the first malformed one (no version line,
    * unterminated headers, missing/negative Content-Length, or a
    * payload running past the buffer), so truncated and garbage
    * payloads degrade to a record prefix, never a crash. Headers are
    * matched case-insensitively (the spec makes field names
    * case-insensitive); bodies are skipped, never inspected —
    * metadata-only ingest, same discipline as the MP4/PNG/JPEG
    * walkers.
    */
  def parseWarc(bytes: Array[Byte]): Seq[WarcRecMeta] = {
    if (bytes == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecMeta]
    var p = 0
    var stop = false
    // read one CRLF-terminated ASCII line at `from`; (-1, null) when
    // no CRLF arrives within the buffer
    def line(from: Int): (Int, String) = {
      var i = from
      while (i + 1 < bytes.length
          && !(bytes(i) == '\r' && bytes(i + 1) == '\n'))
        i += 1
      if (i + 1 >= bytes.length) (-1, null)
      else (i + 2, new String(bytes, from, i - from, "ISO-8859-1"))
    }
    while (!stop && p < bytes.length) {
      val (afterVersion, version) = line(p)
      if (afterVersion < 0 || version == null
          || !version.startsWith("WARC/")) { stop = true }
      else {
        var q = afterVersion
        var warcType = ""
        var uri = ""
        var clen = -1L
        var nHeaders = 0
        var headersDone = false
        var bad = false
        while (!headersDone && !bad) {
          val (next, l) = line(q)
          if (next < 0) bad = true
          else if (l.isEmpty) { headersDone = true; q = next }
          else {
            val ci = l.indexOf(':')
            if (ci > 0) {
              nHeaders += 1
              val name = l.substring(0, ci).trim.toLowerCase
              val value = l.substring(ci + 1).trim
              name match {
                case "warc-type" => warcType = value
                case "warc-target-uri" => uri = value
                case "content-length" =>
                  clen = try value.toLong catch { case _: Exception => -1L }
                case _ => ()
              }
            }
            q = next
          }
        }
        if (bad || clen < 0 || q + clen + 4 > bytes.length) stop = true
        else {
          out += WarcRecMeta(out.length, warcType, uri, clen, nHeaders, q)
          p = (q + clen + 4).toInt // payload + CRLF CRLF separator
        }
      }
    }
    out.toSeq
  }

  /** WARC record inventory over a media Dataset — one row per parsed
    * record; a payload yielding NO records (garbage, empty, truncated
    * before the first record completes) emits a single sentinel row
    * (rec_idx −1) so every input stays visible downstream, matching
    * the container-walker convention.
    */
  def warcRecords(ds: Dataset[MediaRow]): Dataset[WarcRecRow] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val n = if (r.media == null) 0L else r.media.length.toLong
      val recs = parseWarc(r.media)
      if (recs.isEmpty)
        Seq(WarcRecRow(r.media_id, -1, "", "", -1L, 0, n))
      else recs.map(m => WarcRecRow(r.media_id, m.rec_idx, m.warc_type,
        m.target_uri, m.content_length, m.n_headers, n))
    }
  }

  final case class WarcHttpMeta(
      rec_idx: Int,
      target_uri: String,
      status: Int,
      content_type: String,
      charset: String,
      header_bytes: Long,
      body_bytes: Long)

  final case class WarcHttpRow(
      media_id: Long,
      rec_idx: Int,
      target_uri: String,
      status: Int,
      content_type: String,
      charset: String,
      header_bytes: Long,
      body_bytes: Long)

  /** Parse the HTTP message inside each WARC `response` record's
    * payload — the step between the archive wrapper and
    * `TextPrep.extractText` in the real chain (WARC → HTTP → HTML):
    * status code from the `HTTP/x.y SSS ...` line, media type and
    * charset split out of `Content-Type` (type lowercased and
    * trimmed at `;`; `charset=` parameter lowercased, quotes
    * stripped, "" when absent), the header block's byte size, and the
    * entity body size (payload minus headers). Non-`response` records
    * are skipped; a response whose payload is not HTTP (no status
    * line, unterminated headers) degrades to status −1 with the whole
    * payload counted as body — metadata only, the body itself is
    * never decoded here.
    */
  /** (status, content_type, charset, headerEnd byte pos) of the HTTP
    * message starting at `rec.payload_off`; status −1 / headerEnd −1
    * when the payload is not a well-formed HTTP header block.
    */
  private def httpHead(bytes: Array[Byte], rec: WarcRecMeta)
      : (Int, String, String, Int) = {
    val end = rec.payload_off + rec.content_length.toInt
    def line(from: Int): (Int, String) = {
      var i = from
      while (i + 1 < end && !(bytes(i) == '\r' && bytes(i + 1) == '\n'))
        i += 1
      if (i + 1 >= end) (-1, null)
      else (i + 2, new String(bytes, from, i - from, "ISO-8859-1"))
    }
    val (afterStatus, statusLine) = line(rec.payload_off)
    val status =
      if (statusLine == null) -1
      else {
        val m = "^HTTP/\\d\\.\\d (\\d{3})(?: .*)?$".r
          .findFirstMatchIn(statusLine)
        m.map(_.group(1).toInt).getOrElse(-1)
      }
    var contentType = ""
    var charset = ""
    var headerEnd = -1
    if (status >= 0) {
      var q2 = afterStatus
      var done = false
      while (!done) {
        val (next, l) = line(q2)
        if (next < 0) done = true
        else if (l.isEmpty) { headerEnd = next; done = true }
        else {
          val ci = l.indexOf(':')
          if (ci > 0 && l.substring(0, ci).trim
              .equalsIgnoreCase("content-type")) {
            val v = l.substring(ci + 1).trim
            contentType = v.split(";")(0).trim.toLowerCase
            val cm = "(?i)charset=\"?([^\";\\s]+)\"?".r
              .findFirstMatchIn(v)
            charset = cm.map(_.group(1).toLowerCase).getOrElse("")
          }
          q2 = next
        }
      }
    }
    if (status < 0 || headerEnd < 0) (-1, "", "", -1)
    else (status, contentType, charset, headerEnd)
  }

  def parseWarcHttp(bytes: Array[Byte]): Seq[WarcHttpMeta] =
    parseWarc(bytes).filter(_.warc_type == "response").map { r =>
      val end = r.payload_off + r.content_length.toInt
      val (status, contentType, charset, headerEnd) = httpHead(bytes, r)
      if (headerEnd < 0)
        WarcHttpMeta(r.rec_idx, r.target_uri, -1, "", "",
          -1L, r.content_length)
      else
        WarcHttpMeta(r.rec_idx, r.target_uri, status, contentType, charset,
          (headerEnd - r.payload_off).toLong,
          (end - headerEnd).toLong)
    }

  final case class WarcBodyRow(
      media_id: Long,
      rec_idx: Int,
      target_uri: String,
      status: Int,
      content_type: String,
      body: String)

  /** Decoded entity bodies of the HTTP responses inside WARC payloads
    * — the hand-off from the archive walkers to
    * [[graft.operators.TextPrep.extractText]] (WARC → HTTP → HTML →
    * text): one row per `response` record, body decoded by the
    * declared charset (`utf-8` → UTF-8; anything else — including
    * absent — falls back to ISO-8859-1, the byte-preserving default).
    * A non-HTTP payload rides along whole as the body with status −1,
    * so nothing silently disappears before the downstream filter.
    */
  /** Shared response-body extraction over one WARC byte buffer:
    * (rec_idx, target_uri, status, content_type, body) per `response`
    * record — the inner step of [[warcResponseBodies]] (plain WARC)
    * and [[warcGzResponseBodies]] (member-per-record WARC.gz).
    */
  private def responseBodyRecs(
      bytes: Array[Byte]): Seq[(Int, String, Int, String, String)] =
    parseWarc(bytes).filter(_.warc_type == "response").map { r =>
      val end = r.payload_off + r.content_length.toInt
      val (status, contentType, charset, headerEnd) = httpHead(bytes, r)
      val bodyStart = if (headerEnd < 0) r.payload_off else headerEnd
      val cs = if (charset == "utf-8") "UTF-8" else "ISO-8859-1"
      val body = new String(bytes, bodyStart, end - bodyStart, cs)
      (r.rec_idx, r.target_uri,
        if (headerEnd < 0) -1 else status,
        if (headerEnd < 0) "" else contentType, body)
    }

  def warcResponseBodies(ds: Dataset[MediaRow]): Dataset[WarcBodyRow] = {
    import ds.sparkSession.implicits._
    ds.flatMap { row =>
      responseBodyRecs(row.media).map { case (ri, uri, st, ct, body) =>
        WarcBodyRow(row.media_id, ri, uri, st, ct, body)
      }
    }
  }

  final case class WarcGzBodyRow(
      media_id: Long,
      member_idx: Int,
      rec_idx: Int,
      target_uri: String,
      status: Int,
      content_type: String,
      body: String)

  /** Decoded HTTP response bodies straight from WARC.gz wire bytes:
    * [[gzipMembers]] walks the member-per-record stream (the Common
    * Crawl layout), [[responseBodyRecs]] extracts each member's
    * `response` bodies — the one-call hand-off from raw crawl bytes
    * to [[graft.operators.TextPrep.extractText]], completing the
    * q438 (members) / q413 (bodies of pre-gunzipped WARC) pair.
    * Members that fail CRC still parse (the payload is whatever
    * inflated); media with no members or members with no response
    * records contribute nothing — the inventory view with sentinels
    * is [[warcGzRecords]]' job.
    */
  def warcGzResponseBodies(ds: Dataset[MediaRow]): Dataset[WarcGzBodyRow] = {
    import ds.sparkSession.implicits._
    ds.flatMap { row =>
      gzipMembers(row.media).flatMap { m =>
        responseBodyRecs(m.payload).map { case (ri, uri, st, ct, body) =>
          WarcGzBodyRow(row.media_id, m.member_idx, ri, uri, st, ct, body)
        }
      }
    }
  }

  /** HTTP-response inventory over a media Dataset of WARC payloads —
    * one row per `response` record ([[parseWarcHttp]]); payloads with
    * no response records contribute nothing (the record-level view is
    * [[warcRecords]]' job).
    */
  def warcHttpResponses(ds: Dataset[MediaRow]): Dataset[WarcHttpRow] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      parseWarcHttp(r.media).map(m => WarcHttpRow(r.media_id, m.rec_idx,
        m.target_uri, m.status, m.content_type, m.charset,
        m.header_bytes, m.body_bytes))
    }
  }

  /** Deterministic WARC fixture with RAW string bodies — the
    * [[warcBytes]] sibling for records whose payload matters (HTTP
    * responses): one record per (warcType, targetUri, body) triple.
    */
  def warcBytesRaw(records: Seq[(String, String, String)]): Array[Byte] = {
    val sb = new StringBuilder
    records.foreach { case (t, u, body) =>
      sb.append("WARC/1.0\r\n")
      sb.append("WARC-Type: ").append(t).append("\r\n")
      if (u.nonEmpty)
        sb.append("WARC-Target-URI: ").append(u).append("\r\n")
      sb.append("Content-Length: ").append(body.length).append("\r\n")
      sb.append("\r\n")
      sb.append(body)
      sb.append("\r\n\r\n")
    }
    sb.toString.getBytes("ISO-8859-1")
  }

  /** Deterministic WARC fixture: one `WARC/1.0` record per
    * (warcType, targetUri, bodyLen) triple — a Target-URI header only
    * when `targetUri` is non-empty, a deterministic `x` filler body,
    * standard CRLF framing. bodyLen must be >= 0.
    */
  def warcBytes(records: Seq[(String, String, Int)]): Array[Byte] = {
    require(records.forall(_._3 >= 0), "body lengths must be >= 0")
    val sb = new StringBuilder
    records.foreach { case (t, u, n) =>
      sb.append("WARC/1.0\r\n")
      sb.append("WARC-Type: ").append(t).append("\r\n")
      if (u.nonEmpty)
        sb.append("WARC-Target-URI: ").append(u).append("\r\n")
      sb.append("WARC-Record-ID: <urn:graft:").append(t).append(":")
        .append(n).append(">\r\n")
      sb.append("Content-Length: ").append(n).append("\r\n")
      sb.append("\r\n")
      sb.append("x" * n)
      sb.append("\r\n\r\n")
    }
    sb.toString.getBytes("ISO-8859-1")
  }

  final case class GzMemberMeta(
      member_idx: Int,
      member_off: Long,
      compressed_bytes: Long,
      uncompressed_bytes: Long,
      crc_ok: Boolean,
      payload: Array[Byte])

  /** Walk a MULTI-MEMBER gzip stream (RFC 1952) member by member —
    * the wire format WARC actually ships in (Common Crawl gzips each
    * record as its OWN member so readers can seek to record
    * boundaries; a whole-stream gunzip loses them). Per member: parse
    * the 10-byte header (magic 1f 8b, deflate CM, FLG-gated FEXTRA /
    * FNAME / FCOMMENT / FHCRC fields), inflate raw deflate data with
    * `java.util.zip.Inflater(nowrap)`, then read the 8-byte
    * CRC32 + ISIZE trailer and verify both. Walks members in order
    * and STOPS at the first malformed one (bad magic, truncated
    * header/trailer, deflate error) — garbage degrades to a member
    * prefix, never a crash, the container-walker convention. A
    * failed CRC/ISIZE check records the member with
    * `crc_ok = false` and keeps walking (the next member boundary is
    * still known exactly).
    */
  def gzipMembers(bytes: Array[Byte]): Seq[GzMemberMeta] = {
    if (bytes == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[GzMemberMeta]
    val len = bytes.length
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
        ((u8(i + 3) & 0xffL) << 24)
    var p = 0
    var stop = false
    while (!stop && p + 10 <= len) {
      if (u8(p) != 0x1f || u8(p + 1) != 0x8b || u8(p + 2) != 8) stop = true
      else {
        val flg = u8(p + 3)
        var q = p + 10
        var bad = false
        if ((flg & 4) != 0) { // FEXTRA
          if (q + 2 > len) bad = true
          else { q += 2 + le16(q); if (q > len) bad = true }
        }
        def skipZeroTerminated(): Unit = {
          while (q < len && bytes(q) != 0) q += 1
          if (q >= len) bad = true else q += 1
        }
        if (!bad && (flg & 8) != 0) skipZeroTerminated()  // FNAME
        if (!bad && (flg & 16) != 0) skipZeroTerminated() // FCOMMENT
        if (!bad && (flg & 2) != 0) { q += 2; if (q > len) bad = true }
        if (bad) stop = true
        else {
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(bytes, q, len - q)
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          try {
            while (!inf.finished()) {
              val n = inf.inflate(buf)
              if (n > 0) bos.write(buf, 0, n)
              else if (inf.needsInput()) throw new java.util.zip
                .DataFormatException("truncated deflate stream")
            }
            val consumed = (len - q) - inf.getRemaining
            val trailer = q + consumed
            if (trailer + 8 > len) stop = true
            else {
              val data = bos.toByteArray
              val crc = new java.util.zip.CRC32()
              crc.update(data)
              val crcOk = crc.getValue == le32(trailer) &&
                (data.length.toLong & 0xffffffffL) == le32(trailer + 4)
              out += GzMemberMeta(out.length, p.toLong,
                (trailer + 8 - p).toLong, data.length.toLong, crcOk, data)
              p = trailer + 8
            }
          } catch {
            case _: java.util.zip.DataFormatException => stop = true
          } finally inf.end()
        }
      }
    }
    out.toSeq
  }

  /** Deterministic multi-member gzip fixture: each payload becomes
    * its OWN member (`GZIPOutputStream` per payload, concatenated) —
    * the Common-Crawl member-per-record layout.
    */
  def gzipMembersBytes(payloads: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    payloads.foreach { pl =>
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(pl)
      gz.finish()
      // close() releases the native Deflater NOW (finalization-only
      // release leaks native memory when this runs per-row in a
      // mapped Dataset); safe after finish() — the trailer is already
      // written and closing the wrapper just closes the shared
      // ByteArrayOutputStream, a no-op
      gz.close()
    }
    bos.toByteArray
  }

  final case class WarcGzRecRow(
      media_id: Long,
      member_idx: Int,
      uncompressed_bytes: Long,
      crc_ok: Boolean,
      rec_idx: Int,
      warc_type: String,
      target_uri: String,
      content_length: Long,
      n_headers: Int)

  /** WARC.gz record inventory: [[gzipMembers]] feeding [[parseWarc]]
    * per member — the real Common-Crawl ingest shape (q408's record
    * walk assumed pre-gunzipped bytes; the wire format is per-record
    * gzip members). One row per (member, record); a media whose bytes
    * yield NO members, or a member whose payload yields no records,
    * emits the −1 sentinel row, keeping every input visible
    * downstream. Compressed sizes and member offsets stay on the
    * [[GzMemberMeta]] API (deflate output is implementation-defined —
    * not a differential-testable column); the row carries the
    * UNCOMPRESSED member size, which is generator-derivable.
    */
  def warcGzRecords(ds: Dataset[MediaRow]): Dataset[WarcGzRecRow] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val members = gzipMembers(r.media)
      if (members.isEmpty)
        Seq(WarcGzRecRow(r.media_id, -1, -1L, false, -1, "", "", -1L, 0))
      else members.flatMap { m =>
        val recs = parseWarc(m.payload)
        if (recs.isEmpty)
          Seq(WarcGzRecRow(r.media_id, m.member_idx,
            m.uncompressed_bytes, m.crc_ok, -1, "", "", -1L, 0))
        else recs.map(rec => WarcGzRecRow(r.media_id, m.member_idx,
          m.uncompressed_bytes, m.crc_ok, rec.rec_idx, rec.warc_type,
          rec.target_uri, rec.content_length, rec.n_headers))
      }
    }
  }

  /** Parsed GIF header + block inventory. Sentinels when the payload
    * is not a GIF (bad signature or truncated screen descriptor):
    * version "", dimensions −1, counts 0, has_trailer false.
    */
  final case class GifMeta(
      version: String, width: Int, height: Int, gct_flag: Boolean,
      gct_entries: Int, n_images: Int, n_extensions: Int,
      has_trailer: Boolean)

  final case class GifMetaRow(
      media_id: Long, version: String, width: Int, height: Int,
      gct_flag: Boolean, gct_entries: Int, n_images: Int,
      n_extensions: Int, has_trailer: Boolean, n_bytes: Long)

  private val UnknownGif =
    GifMeta("", -1, -1, gct_flag = false, 0, 0, 0, has_trailer = false)

  /** Total GIF block walk (GIF87a/89a grammar): 6-byte signature,
    * 7-byte logical screen descriptor (LE dims + packed GCT flag/size),
    * optional global color table, then 0x21 extensions (label +
    * size-prefixed sub-blocks to a 0 terminator), 0x2C image
    * descriptors (9-byte header, optional local color table, LZW
    * min-code byte + sub-blocks), 0x3B trailer. Defensive like
    * [[parsePngMeta]]: a truncated sub-block chain or unknown
    * introducer stops the walk at what was parsed; a payload without
    * the signature yields the sentinel; never throws. The fields an
    * image-ingest pipeline filters on — canvas size, palette size,
    * frame count (animation!), extension mass — without LZW decoding.
    */
  def parseGifMeta(bytes: Array[Byte]): GifMeta = {
    if (bytes == null || bytes.length < 13) return UnknownGif
    val sig = new String(bytes, 0, 6, "ISO-8859-1")
    if (sig != "GIF87a" && sig != "GIF89a") return UnknownGif
    val version = sig.substring(3)
    val width = leShort(bytes, 6)
    val height = leShort(bytes, 8)
    val packed = bytes(10) & 0xFF
    val gctFlag = (packed & 0x80) != 0
    val gctEntries = if (gctFlag) 1 << ((packed & 0x07) + 1) else 0
    var p = 13 + (if (gctFlag) 3 * gctEntries else 0)
    var nImages = 0; var nExt = 0; var trailer = false
    var stop = false
    // skip a size-prefixed sub-block chain; -1 on truncation
    def skipSubBlocks(from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != 0) {
        i += 1 + (bytes(i) & 0xFF)
      }
      if (i >= bytes.length) -1 else i + 1
    }
    while (!stop && p < bytes.length) {
      (bytes(p) & 0xFF) match {
        case 0x3B =>
          trailer = true; stop = true
        case 0x21 =>
          if (p + 2 > bytes.length) stop = true
          else {
            val next = skipSubBlocks(p + 2)
            if (next < 0) stop = true else { nExt += 1; p = next }
          }
        case 0x2C =>
          if (p + 10 > bytes.length) stop = true
          else {
            val ipacked = bytes(p + 9) & 0xFF
            val lct = if ((ipacked & 0x80) != 0)
              3 * (1 << ((ipacked & 0x07) + 1)) else 0
            val dataStart = p + 10 + lct + 1 // + LZW min-code byte
            if (dataStart > bytes.length) stop = true
            else {
              val next = skipSubBlocks(dataStart)
              if (next < 0) stop = true else { nImages += 1; p = next }
            }
          }
        case _ => stop = true
      }
    }
    GifMeta(version, width, height, gctFlag, gctEntries, nImages, nExt,
      trailer)
  }

  /** GIF metadata over a media Dataset — same shape as [[pngMeta]]. */
  def gifMeta(ds: Dataset[MediaRow]): Dataset[GifMetaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val m = parseGifMeta(r.media)
      val n = if (r.media == null) 0L else r.media.length.toLong
      GifMetaRow(r.media_id, m.version, m.width, m.height, m.gct_flag,
        m.gct_entries, m.n_images, m.n_extensions, m.has_trailer, n)
    })
  }

  /** Deterministic GIF fixture: signature + screen descriptor
    * (+ global color table of `gctEntries` when > 0, must be a power
    * of two in [2,256]) + `nExtensions` graphic-control extensions +
    * one image per `frameDataSizes` entry (descriptor + LZW min-code
    * byte + one data sub-block of that size) + trailer. Size is
    * 13 + 3·gct + 8·nExt + Σ(13 + size) + 1 bytes.
    */
  def gifBytes(version: String, width: Int, height: Int, gctEntries: Int,
      nExtensions: Int, frameDataSizes: Seq[Int]): Array[Byte] = {
    require(version == "87a" || version == "89a", "version must be 87a/89a")
    require(width > 0 && height > 0, "dimensions must be positive")
    require(gctEntries == 0 ||
      (Integer.bitCount(gctEntries) == 1 && gctEntries >= 2 &&
        gctEntries <= 256), "gctEntries must be 0 or a power of two in [2,256]")
    require(frameDataSizes.forall(s => s >= 1 && s <= 255),
      "frame data sub-block sizes must be in [1,255]")
    val total = 13 + 3 * gctEntries + 8 * nExtensions +
      frameDataSizes.map(13 + _).sum + 1
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(("GIF" + version).getBytes("ISO-8859-1"))
    bb.putShort(width.toShort).putShort(height.toShort)
    val sizeBits =
      if (gctEntries == 0) 0
      else 31 - Integer.numberOfLeadingZeros(gctEntries) - 1
    bb.put((if (gctEntries > 0) 0x80 | sizeBits else 0x00).toByte)
    bb.put(0.toByte).put(0.toByte) // background index, aspect ratio
    var i = 0
    while (i < 3 * gctEntries) { bb.put((i % 255).toByte); i += 1 }
    var e = 0
    while (e < nExtensions) {
      // graphic control: 0x21 0xF9, one 4-byte sub-block, terminator
      bb.put(0x21.toByte).put(0xF9.toByte).put(4.toByte)
        .put(0.toByte).putShort((10 * (e + 1)).toShort).put(0.toByte)
        .put(0.toByte)
      e += 1
    }
    frameDataSizes.foreach { sz =>
      bb.put(0x2C.toByte)
        .putShort(0.toShort).putShort(0.toShort) // left, top
        .putShort(width.toShort).putShort(height.toShort)
        .put(0.toByte) // no local color table
        .put(8.toByte) // LZW min code size
        .put(sz.toByte)
      var j = 0
      while (j < sz) { bb.put((j % 251).toByte); j += 1 }
      bb.put(0.toByte) // sub-block terminator
    }
    bb.put(0x3B.toByte)
    bb.array()
  }

  /** Parsed FLAC STREAMINFO + metadata-block inventory. Sentinels when
    * the payload is not a FLAC (bad magic or no STREAMINFO first
    * block, per spec): rate/channels/bits −1, samples/duration −1,
    * counts 0, flags false.
    */
  final case class FlacMeta(
      sample_rate: Int, channels: Int, bits_per_sample: Int,
      total_samples: Long, duration_ms: Long, n_blocks: Int,
      has_vorbis_comment: Boolean, has_picture: Boolean)

  final case class FlacMetaRow(
      media_id: Long, sample_rate: Int, channels: Int,
      bits_per_sample: Int, total_samples: Long, duration_ms: Long,
      n_blocks: Int, has_vorbis_comment: Boolean, has_picture: Boolean,
      n_bytes: Long)

  private val UnknownFlac =
    FlacMeta(-1, -1, -1, -1L, -1L, 0, has_vorbis_comment = false,
      has_picture = false)

  /** Total FLAC metadata-block walk: `fLaC` magic, then blocks of
    * (1-byte header: last-flag bit + 7-bit type, 24-bit BE length,
    * payload) — STREAMINFO (type 0, mandatory first) carries the
    * packed 20-bit sample rate / 3-bit channels−1 / 5-bit bps−1 /
    * 36-bit total-samples field an audio-ingest pipeline filters on;
    * VORBIS_COMMENT (4) and PICTURE (6) are flagged. Defensive like
    * [[parsePngMeta]]: truncated or lying lengths stop the walk;
    * never throws. Audio FRAMES are not decoded (no codec here, by
    * construction — same contract as [[parseContainerMeta]]).
    */
  def parseFlacMeta(bytes: Array[Byte]): FlacMeta = {
    if (bytes == null || bytes.length < 4 + 4 + 34) return UnknownFlac
    if (fourcc(bytes, 0) != "fLaC") return UnknownFlac
    var p = 4
    var first = true
    var rate = -1; var ch = -1; var bps = -1; var total = -1L
    var nBlocks = 0; var vorbis = false; var pic = false
    var last = false
    var stop = false
    while (!stop && !last && p + 4 <= bytes.length) {
      val hdr = bytes(p) & 0xFF
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7F
      val len = ((bytes(p + 1) & 0xFF) << 16) |
        ((bytes(p + 2) & 0xFF) << 8) | (bytes(p + 3) & 0xFF)
      if (p + 4 + len > bytes.length) stop = true
      else {
        if (first && btype != 0) return UnknownFlac // spec: SI first
        nBlocks += 1
        if (first && len >= 34) {
          val d = p + 4 + 10 // skip block/frame size fields
          rate = ((bytes(d) & 0xFF) << 12) | ((bytes(d + 1) & 0xFF) << 4) |
            ((bytes(d + 2) & 0xFF) >>> 4)
          ch = (((bytes(d + 2) & 0xFF) >>> 1) & 0x7) + 1
          bps = (((bytes(d + 2) & 1) << 4) |
            ((bytes(d + 3) & 0xFF) >>> 4)) + 1
          total = ((bytes(d + 3) & 0xFL) << 32) |
            ((bytes(d + 4) & 0xFFL) << 24) | ((bytes(d + 5) & 0xFFL) << 16) |
            ((bytes(d + 6) & 0xFFL) << 8) | (bytes(d + 7) & 0xFFL)
        } else if (btype == 4) vorbis = true
        else if (btype == 6) pic = true
        first = false
        p += 4 + len
      }
    }
    if (rate <= 0) UnknownFlac
    else FlacMeta(rate, ch, bps, total,
      total * 1000L / rate, nBlocks, vorbis, pic)
  }

  /** FLAC metadata over a media Dataset — same shape as [[pngMeta]]. */
  def flacMeta(ds: Dataset[MediaRow]): Dataset[FlacMetaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val m = parseFlacMeta(r.media)
      val n = if (r.media == null) 0L else r.media.length.toLong
      FlacMetaRow(r.media_id, m.sample_rate, m.channels,
        m.bits_per_sample, m.total_samples, m.duration_ms, m.n_blocks,
        m.has_vorbis_comment, m.has_picture, n)
    })
  }

  /** Deterministic FLAC fixture: magic + STREAMINFO (34 bytes, the
    * packed rate/channels/bps/total-samples field assembled bit-wise)
    * + one block per (type, len) in `extraBlocks` with deterministic
    * filler; the final block carries the last-block flag. Size is
    * 4 + 38 + Σ(4 + len) bytes.
    */
  def flacBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, extraBlocks: Seq[(Int, Int)]): Array[Byte] = {
    require(sampleRate >= 1 && sampleRate < (1 << 20), "rate needs 20 bits")
    require(channels >= 1 && channels <= 8, "channels in [1,8]")
    require(bitsPerSample >= 4 && bitsPerSample <= 32, "bps in [4,32]")
    require(totalSamples >= 0 && totalSamples < (1L << 36),
      "total samples needs 36 bits")
    require(extraBlocks.forall { case (t, l) =>
      t >= 1 && t <= 126 && l >= 0 }, "extra blocks need type/len bounds")
    val total = 4 + 38 + extraBlocks.map(4 + _._2).sum
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put("fLaC".getBytes("ISO-8859-1"))
    val siLast = if (extraBlocks.isEmpty) 0x80 else 0x00
    bb.put(siLast.toByte).put(0.toByte).put(0.toByte).put(34.toByte)
    bb.putShort(4096.toShort).putShort(4096.toShort) // block sizes
    bb.put(0.toByte).put(0.toByte).put(0.toByte) // min frame size
    bb.put(0.toByte).put(0.toByte).put(0.toByte) // max frame size
    bb.put((sampleRate >>> 12).toByte)
    bb.put(((sampleRate >>> 4) & 0xFF).toByte)
    bb.put((((sampleRate & 0xF) << 4) | ((channels - 1) << 1) |
      ((bitsPerSample - 1) >>> 4)).toByte)
    bb.put(((((bitsPerSample - 1) & 0xF) << 4) |
      ((totalSamples >>> 32) & 0xF).toInt).toByte)
    bb.putInt((totalSamples & 0xFFFFFFFFL).toInt)
    var j = 0
    while (j < 16) { bb.put(0.toByte); j += 1 } // md5 (not validated)
    extraBlocks.zipWithIndex.foreach { case ((t, l), i) =>
      val lastFlag = if (i == extraBlocks.length - 1) 0x80 else 0x00
      bb.put((lastFlag | t).toByte)
      bb.put(((l >>> 16) & 0xFF).toByte).put(((l >>> 8) & 0xFF).toByte)
        .put((l & 0xFF).toByte)
      var x = 0
      while (x < l) { bb.put((x % 247).toByte); x += 1 }
    }
    bb.array()
  }

  /** Parsed WebP header. Sentinels when the payload is not a WebP
    * (no RIFF/WEBP framing or unknown first chunk): format "",
    * dimensions −1, flags false, n_chunks 0.
    */
  final case class WebpMeta(
      format: String, width: Int, height: Int, has_alpha: Boolean,
      has_anim: Boolean, has_exif: Boolean, n_chunks: Int)

  final case class WebpMetaRow(
      media_id: Long, format: String, width: Int, height: Int,
      has_alpha: Boolean, has_anim: Boolean, has_exif: Boolean,
      n_chunks: Int, n_bytes: Long)

  private val UnknownWebp =
    WebpMeta("", -1, -1, has_alpha = false, has_anim = false,
      has_exif = false, 0)

  /** Total WebP chunk walk (RIFF framing): `RIFF <size> WEBP`, then
    * (fourcc, LE size, payload padded to even) chunks. The first chunk
    * decides the format: `VP8 ` (lossy — 3-byte frame tag, 9D 01 2A
    * start code, 14-bit LE dims), `VP8L` (lossless — 0x2F signature,
    * 14-bit packed dims−1), or `VP8X` (extended — flag byte for
    * alpha/anim/EXIF, 24-bit LE canvas dims−1, followed by feature
    * chunks which are inventoried). Defensive like [[parsePngMeta]]:
    * truncated or lying sizes stop the walk; never throws.
    */
  def parseWebpMeta(bytes: Array[Byte]): WebpMeta = {
    if (bytes == null || bytes.length < 20) return UnknownWebp
    if (fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "WEBP")
      return UnknownWebp
    var p = 12
    var format = ""; var width = -1; var height = -1
    var alpha = false; var anim = false; var exif = false
    var nChunks = 0
    var stop = false
    while (!stop && p + 8 <= bytes.length) {
      val id = fourcc(bytes, p)
      val len = leInt(bytes, p + 4)
      if (len < 0 || p + 8 + len.toLong > bytes.length) stop = true
      else {
        val d = p + 8
        nChunks += 1
        if (nChunks == 1) {
          id match {
            case "VP8 " if len >= 10 &&
                (bytes(d + 3) & 0xFF) == 0x9D &&
                (bytes(d + 4) & 0xFF) == 0x01 &&
                (bytes(d + 5) & 0xFF) == 0x2A =>
              format = "VP8"
              width = leShort(bytes, d + 6) & 0x3FFF
              height = leShort(bytes, d + 8) & 0x3FFF
            case "VP8L" if len >= 5 && (bytes(d) & 0xFF) == 0x2F =>
              format = "VP8L"
              val b = leInt(bytes, d + 1)
              width = (b & 0x3FFF) + 1
              height = ((b >>> 14) & 0x3FFF) + 1
              alpha = ((b >>> 28) & 1) == 1
            case "VP8X" if len >= 10 =>
              format = "VP8X"
              val flags = bytes(d) & 0xFF
              alpha = (flags & 0x10) != 0
              exif = (flags & 0x08) != 0
              anim = (flags & 0x02) != 0
              width = ((bytes(d + 4) & 0xFF) | ((bytes(d + 5) & 0xFF) << 8) |
                ((bytes(d + 6) & 0xFF) << 16)) + 1
              height = ((bytes(d + 7) & 0xFF) | ((bytes(d + 8) & 0xFF) << 8) |
                ((bytes(d + 9) & 0xFF) << 16)) + 1
            case _ => return UnknownWebp
          }
        }
        p = d + len + (len & 1) // chunks pad to even
      }
    }
    if (format.isEmpty) UnknownWebp
    else WebpMeta(format, width, height, alpha, anim, exif, nChunks)
  }

  /** WebP metadata over a media Dataset — same shape as [[pngMeta]]. */
  def webpMeta(ds: Dataset[MediaRow]): Dataset[WebpMetaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val m = parseWebpMeta(r.media)
      val n = if (r.media == null) 0L else r.media.length.toLong
      WebpMetaRow(r.media_id, m.format, m.width, m.height, m.has_alpha,
        m.has_anim, m.has_exif, m.n_chunks, n)
    })
  }

  /** Deterministic extended-WebP (VP8X) fixture: RIFF framing, VP8X
    * feature chunk with the given flags and canvas dims, then one
    * feature chunk per (fourcc, size) in `extraChunks` with
    * deterministic filler (sizes pad to even per RIFF). Size is
    * 12 + 18 + Σ(8 + size + pad) bytes.
    */
  def webpBytesVp8x(width: Int, height: Int, alpha: Boolean, anim: Boolean,
      exif: Boolean, extraChunks: Seq[(String, Int)]): Array[Byte] = {
    require(width >= 1 && height >= 1, "dimensions must be >= 1")
    require(extraChunks.forall(c => c._1.length == 4 && c._2 >= 0),
      "extra chunks need 4-char fourccs and sizes >= 0")
    val body = 4 + (8 + 10) +
      extraChunks.map { case (_, s) => 8 + s + (s & 1) }.sum
    val bb = java.nio.ByteBuffer.allocate(8 + body)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ISO-8859-1")).putInt(body)
    bb.put("WEBP".getBytes("ISO-8859-1"))
    bb.put("VP8X".getBytes("ISO-8859-1")).putInt(10)
    val flags = (if (alpha) 0x10 else 0) | (if (exif) 0x08 else 0) |
      (if (anim) 0x02 else 0)
    bb.put(flags.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val w = width - 1; val h = height - 1
    bb.put((w & 0xFF).toByte).put(((w >>> 8) & 0xFF).toByte)
      .put(((w >>> 16) & 0xFF).toByte)
    bb.put((h & 0xFF).toByte).put(((h >>> 8) & 0xFF).toByte)
      .put(((h >>> 16) & 0xFF).toByte)
    extraChunks.foreach { case (id, sz) =>
      bb.put(id.getBytes("ISO-8859-1")).putInt(sz)
      var j = 0
      while (j < sz + (sz & 1)) { bb.put((j % 253).toByte); j += 1 }
    }
    bb.array()
  }

  /** Deterministic lossy-WebP (VP8) fixture: RIFF framing + one
    * `VP8 ` chunk (3-byte frame tag, 9D 01 2A start code, 14-bit LE
    * dims, `dataLen` deterministic filler bytes).
    */
  def webpBytesVp8(width: Int, height: Int, dataLen: Int): Array[Byte] = {
    require(width >= 1 && width <= 0x3FFF && height >= 1 &&
      height <= 0x3FFF, "dimensions must be in [1, 16383]")
    require(dataLen >= 0, "dataLen must be >= 0")
    val chunkLen = 10 + dataLen
    val body = 4 + 8 + chunkLen + (chunkLen & 1)
    val bb = java.nio.ByteBuffer.allocate(8 + body)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ISO-8859-1")).putInt(body)
    bb.put("WEBP".getBytes("ISO-8859-1"))
    bb.put("VP8 ".getBytes("ISO-8859-1")).putInt(chunkLen)
    bb.put(0.toByte).put(0.toByte).put(0.toByte) // frame tag
    bb.put(0x9D.toByte).put(0x01.toByte).put(0x2A.toByte)
    bb.putShort(width.toShort).putShort(height.toShort)
    var j = 0
    while (j < dataLen + (chunkLen & 1)) { bb.put((j % 249).toByte); j += 1 }
    bb.array()
  }
}

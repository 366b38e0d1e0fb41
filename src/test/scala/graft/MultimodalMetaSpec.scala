package graft

import java.nio.{ByteBuffer, ByteOrder}

import graft.operators.Multimodal

/** Golden-byte tests for the container-header parser: headers are
  * assembled field-by-field here (independently of the wavBytes /
  * mp4Bytes fixture builders) so a builder+parser co-bug cannot cancel.
  */
class MultimodalMetaSpec extends SparkSpec {
  import spark.implicits._

  test("WAV/RIFF: hand-assembled canonical header parses exactly") {
    // 2 samples, mono, 8-bit, 4 Hz -> duration 500 ms
    val bb = ByteBuffer.allocate(46).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ISO-8859-1")).putInt(38)
      .put("WAVE".getBytes("ISO-8859-1"))
      .put("fmt ".getBytes("ISO-8859-1")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(4).putInt(4) // sample rate, byte rate
      .putShort(1).putShort(8) // block align, bits
      .put("data".getBytes("ISO-8859-1")).putInt(2)
      .put(Array[Byte](0x11, 0x22))
    val m = Multimodal.parseContainerMeta(bb.array())
    assert(m === Multimodal.ContainerMeta("wav", "pcm", 4, 1, 8, 500L))
  }

  test("WAV/RIFF: odd-sized chunks are word-aligned, IEEE float codec " +
    "tag, fmt after an unknown chunk still found") {
    val bb = ByteBuffer.allocate(12 + 8 + 3 + 1 + 24 + 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ISO-8859-1")).putInt(0) // size unused by parser
      .put("WAVE".getBytes("ISO-8859-1"))
      .put("LIST".getBytes("ISO-8859-1")).putInt(3) // odd size -> pad byte
      .put(Array[Byte](1, 2, 3, 0))
      .put("fmt ".getBytes("ISO-8859-1")).putInt(16)
      .putShort(3).putShort(2) // IEEE float, stereo
      .putInt(8000).putInt(64000)
      .putShort(8).putShort(32)
      .put("data".getBytes("ISO-8859-1")).putInt(0)
    val m = Multimodal.parseContainerMeta(bb.array())
    assert(m.container === "wav")
    assert(m.codec === "ieee_float")
    assert(m.sample_rate === 8000 && m.channels === 2 &&
      m.bits_per_sample === 32)
    assert(m.duration_ms === 0L)
  }

  test("MP4: hand-assembled mvhd version 1 (64-bit times) parses") {
    val bb = ByteBuffer.allocate(16 + 8 + 120).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(16).put("ftyp".getBytes("ISO-8859-1"))
      .put("mp42".getBytes("ISO-8859-1")).putInt(0)
    bb.putInt(128).put("moov".getBytes("ISO-8859-1"))
    bb.putInt(120).put("mvhd".getBytes("ISO-8859-1"))
      .putInt(0x01000000) // version 1
      .putLong(0L).putLong(0L) // creation, modification (64-bit)
      .putInt(48000) // timescale
      .putLong(96000L) // duration ticks -> 2000 ms
    // remaining mvhd payload (rate..next_track_id) left zeroed
    val m = Multimodal.parseContainerMeta(bb.array())
    assert(m === Multimodal.ContainerMeta("mp4", "mp42", -1, 0, 0, 2000L))
  }

  test("MP4: a truncated v1 mvhd keeps the duration sentinel instead of " +
    "misreading v0 offsets from the v1 layout") {
    val bb = ByteBuffer.allocate(16 + 36).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(16).put("ftyp".getBytes("ISO-8859-1"))
      .put("mp42".getBytes("ISO-8859-1")).putInt(0)
    bb.putInt(36).put("moov".getBytes("ISO-8859-1"))
    // mvhd declares version 1 but the box is only 28 bytes — too short
    // for the 64-bit v1 fields. The bytes AT the v0 offsets are valid
    // numbers, so a fallback v0 read would "succeed" with garbage.
    bb.putInt(28).put("mvhd".getBytes("ISO-8859-1"))
      .putInt(0x01000000) // version 1
      .putInt(0).putInt(0)
      .putInt(48000) // v0 timescale offset
      .putInt(96000) // v0 duration offset
    val m = Multimodal.parseContainerMeta(bb.array())
    assert(m === Multimodal.ContainerMeta("mp4", "mp42", -1, 0, 0, -1L))
  }

  test("parseTrackMeta: two-track fixture parses timescale/duration/" +
    "codec per track in file order; movie-level parse still works") {
    val b = Multimodal.mp4BytesWithTracks("isom", 1000, 5000L,
      Seq((90000, 270000L, "avc1"), (48000, 144007L, "mp4a")))
    val tracks = Multimodal.parseTrackMeta(b)
    assert(tracks === Seq(
      Multimodal.TrackMeta(0, 90000, 3000L, "avc1"),
      Multimodal.TrackMeta(1, 48000, 144007L * 1000L / 48000L, "mp4a")))
    // trak boxes do not confuse the movie-level mvhd walk
    val m = Multimodal.parseContainerMeta(b)
    assert(m === Multimodal.ContainerMeta("mp4", "isom", -1, 0, 0, 5000L))
  }

  test("parseTrackMeta: non-MP4 and garbage yield zero rows; a " +
    "truncated v1 mdhd degrades that track to sentinels, codec intact") {
    assert(Multimodal.parseTrackMeta(null) === Seq.empty)
    assert(Multimodal.parseTrackMeta(
      Multimodal.wavBytes(8000, 1, 16, 10)) === Seq.empty)
    assert(Multimodal.parseTrackMeta(
      "random junk bytes here".getBytes("ISO-8859-1")) === Seq.empty)
    // flip the first track's mdhd version byte to 1: the 24-byte v0
    // payload is too short for v1's 64-bit fields -> sentinels, but
    // the stsd codec below it still parses
    val b = Multimodal.mp4BytesWithTracks("isom", 1000, 5000L,
      Seq((90000, 270000L, "avc1")))
    // mdhd version byte: ftyp(16) + moov hdr(8) + mvhd(108) +
    // trak hdr(8) + mdia hdr(8) + mdhd hdr(8) = offset 156
    b(156) = 1.toByte
    assert(Multimodal.parseTrackMeta(b) ===
      Seq(Multimodal.TrackMeta(0, -1, -1L, "avc1")))
  }

  test("garbage, truncated, and lying-size payloads yield the unknown " +
    "sentinel instead of throwing") {
    val unknown = Multimodal.ContainerMeta("unknown", "", -1, 0, 0, -1L)
    assert(Multimodal.parseContainerMeta(null) === unknown)
    assert(Multimodal.parseContainerMeta(Array[Byte](1, 2, 3)) === unknown)
    assert(Multimodal.parseContainerMeta(
      "RIFFxxxxWAVE".getBytes("ISO-8859-1") ++
        "fmt ".getBytes("ISO-8859-1") ++
        Array.fill[Byte](4)(-1)) === unknown) // negative chunk size
    val text = "just some text that is long enough to scan".getBytes("ISO-8859-1")
    assert(Multimodal.parseContainerMeta(text) === unknown)
  }

  test("builder fixtures roundtrip through the dataset operator") {
    val rows = Seq(
      Multimodal.MediaRow(1L, Multimodal.wavBytes(16000, 2, 16, 8000),
        "audio/wav", -1, -1),
      Multimodal.MediaRow(2L, Multimodal.mp4Bytes("isom", 600, 1500L),
        "video/mp4", -1, -1)).toDS()
    val got = Multimodal.containerMeta(rows).collect()
      .map(r => r.media_id -> r).toMap
    assert(got(1L).container === "wav")
    assert(got(1L).sample_rate === 16000 && got(1L).channels === 2)
    assert(got(1L).duration_ms === 500L) // 8000 samples @ 16 kHz
    assert(got(1L).n_bytes === 44L + 8000L * 4L)
    assert(got(2L).container === "mp4" && got(2L).codec === "isom")
    assert(got(2L).duration_ms === 2500L) // 1500 ticks @ 600/s
    assert(got(2L).n_bytes === 132L)
  }

  test("parsePngMeta: round-trip, truncation, lying length, post-IEND junk") {
    val good = Multimodal.parsePngMeta(
      Multimodal.pngBytes(640, 480, 8, 6, 1, Seq(100, 0, 7)))
    assert(good === Multimodal.PngMeta(640, 480, 8, 6, 1,
      n_chunks = 5, n_idat = 3, idat_bytes = 107L, has_iend = true))

    // bytes after IEND are outside the grammar and must not be counted
    val base = Multimodal.pngBytes(2, 2, 8, 0, 0, Seq(4))
    val trailing = base ++ Array.fill(32)(0x41.toByte)
    assert(Multimodal.parsePngMeta(trailing) ===
      Multimodal.parsePngMeta(base))

    // truncated mid-IDAT: inventory stops at what was parsed; no IEND
    val cut = base.take(base.length - 20)
    val t = Multimodal.parsePngMeta(cut)
    assert(t.width === 2 && !t.has_iend)

    // a lying (huge) chunk length stops the walk instead of overreading
    val lying = base.clone()
    lying(8 + 25) = 0x7F.toByte // first IDAT length becomes enormous
    val l = Multimodal.parsePngMeta(lying)
    assert(l.width === 2 && l.n_idat === 0 && !l.has_iend)

    // not a PNG / no IHDR first chunk field parse -> sentinel
    assert(Multimodal.parsePngMeta("plain text".getBytes("ISO-8859-1"))
      .width === -1)
    assert(Multimodal.parsePngMeta(null).width === -1)
    val sigOnly = java.util.Arrays.copyOf(base, 8)
    assert(Multimodal.parsePngMeta(sigOnly).width === -1)
  }

  test("parseJpegMeta: round-trip, progressive flag, truncation, garbage") {
    val base = Multimodal.jpegBytes(1920, 1080, 3,
      progressive = false, withExif = true)
    val m = Multimodal.parseJpegMeta(base)
    assert(m === Multimodal.JpegMeta(1920, 1080, 8, 3,
      progressive = false, has_jfif = true, has_exif = true,
      n_segments = 4))

    val prog = Multimodal.parseJpegMeta(
      Multimodal.jpegBytes(64, 48, 1, progressive = true, withExif = false))
    assert(prog.progressive && !prog.has_exif && prog.n_segments === 3)
    assert(prog.width === 64 && prog.height === 48 && prog.n_components === 1)

    // dimensions above the signed-short range survive the BE read
    val big = Multimodal.parseJpegMeta(
      Multimodal.jpegBytes(40000, 35000, 3, progressive = false,
        withExif = false))
    assert(big.width === 40000 && big.height === 35000)

    // ITU-T T.81 B.1.1.2 fill bytes: runs of 0xFF before a marker are
    // legal padding, not a 0xFF marker with a bogus length read
    val padded = base.take(2) ++ Array.fill(3)(0xFF.toByte) ++ base.drop(2)
    assert(Multimodal.parseJpegMeta(padded) === m)
    // a run that hits end-of-buffer stops cleanly at the sentinel
    val fillTail = Array(0xFF.toByte, 0xD8.toByte) ++
      Array.fill(6)(0xFF.toByte)
    assert(Multimodal.parseJpegMeta(fillTail).width === -1)

    // truncated before the SOF -> sentinel (no frame header found)
    val cut = java.util.Arrays.copyOf(base, 12)
    assert(Multimodal.parseJpegMeta(cut).width === -1)

    // a lying segment length stops the walk at the sentinel
    val lying = base.clone()
    lying(4) = 0x7F.toByte // APP0 length high byte: becomes enormous
    assert(Multimodal.parseJpegMeta(lying).width === -1)

    assert(Multimodal.parseJpegMeta("just bytes".getBytes("ISO-8859-1"))
      .width === -1)
    assert(Multimodal.parseJpegMeta(null).width === -1)
  }

  test("parseWarc: record walk, header extraction, and every " +
    "malformed-input degradation") {
    val bytes = Multimodal.warcBytes(Seq(
      ("warcinfo", "", 5),
      ("response", "https://h.com/a", 0),
      ("request", "https://h.com/a", 12)))
    val recs = Multimodal.parseWarc(bytes)
    assert(recs.map(r => (r.rec_idx, r.warc_type, r.target_uri,
      r.content_length, r.n_headers)) === Seq(
      (0, "warcinfo", "", 5L, 3),
      (1, "response", "https://h.com/a", 0L, 4),
      (2, "request", "https://h.com/a", 12L, 4)))

    // header names are case-insensitive; unknown headers count
    val mixed = ("WARC/1.1\r\ncontent-length: 2\r\nWARC-TYPE: conversion\r\n"
      + "X-Custom: y\r\n\r\nab\r\n\r\n").getBytes("ISO-8859-1")
    val m = Multimodal.parseWarc(mixed)
    assert(m.map(r => (r.warc_type, r.content_length, r.n_headers))
      === Seq(("conversion", 2L, 3)))

    // truncation mid-payload keeps the complete prefix only
    val cut = bytes.take(bytes.length - 10)
    assert(Multimodal.parseWarc(cut).size === 2)
    // a record missing Content-Length stops the walk
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\nbody"
      ).getBytes("ISO-8859-1")
    assert(Multimodal.parseWarc(noLen).isEmpty)
    // garbage, empty, and null all yield no records
    assert(Multimodal.parseWarc("HTTP/1.1 200 OK".getBytes).isEmpty)
    assert(Multimodal.parseWarc(Array.emptyByteArray).isEmpty)
    assert(Multimodal.parseWarc(null).isEmpty)
    // trailing garbage after a valid record: the record survives
    val trail = bytes ++ "WARC/".getBytes("ISO-8859-1")
    assert(Multimodal.parseWarc(trail).size === 3)
  }

  test("parseWarcHttp: status/content-type/charset extraction, header " +
    "accounting, and the non-HTTP-payload sentinel") {
    val bytes = Multimodal.warcBytesRaw(Seq(
      ("warcinfo", "", "software: graft\r\n"),
      ("response", "https://h.com/a",
        "HTTP/1.1 200 OK\r\ncontent-TYPE: Text/HTML; charset=\"UTF-8\"\r\n"
          + "\r\n<html>hi</html>"),
      ("request", "https://h.com/a", "GET /a HTTP/1.1\r\n\r\n"),
      ("response", "https://h.com/b", "HTTP/1.0 404 Not Found\r\n\r\n"),
      ("response", "https://h.com/c", "garbage payload")))
    val got = Multimodal.parseWarcHttp(bytes)
      .map(m => (m.rec_idx, m.status, m.content_type, m.charset,
        m.header_bytes, m.body_bytes))
    val h1 = ("HTTP/1.1 200 OK\r\ncontent-TYPE: Text/HTML; "
      + "charset=\"UTF-8\"\r\n\r\n").length.toLong
    assert(got === Seq(
      (1, 200, "text/html", "utf-8", h1, "<html>hi</html>".length.toLong),
      (3, 404, "", "", "HTTP/1.0 404 Not Found\r\n\r\n".length.toLong, 0L),
      (4, -1, "", "", -1L, "garbage payload".length.toLong)))
  }

  test("warcResponseBodies: charset-aware body decode and the " +
    "non-HTTP passthrough") {
    import spark.implicits._
    // a UTF-8 body with a two-byte character: decoded correctly under
    // the declared charset, mangled if the fallback had been used
    val utf8Body = "café time"
    val utf8Payload = ("HTTP/1.1 200 OK\r\n"
      + "Content-Type: text/plain; charset=utf-8\r\n\r\n"
      + new String(utf8Body.getBytes("UTF-8"), "ISO-8859-1"))
    val latinPayload = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
      + "\r\nplain bytes")
    val ds = Seq(Multimodal.MediaRow(1L, Multimodal.warcBytesRaw(Seq(
      ("response", "https://h.com/u", utf8Payload),
      ("response", "https://h.com/l", latinPayload),
      ("response", "https://h.com/x", "not http"),
      ("warcinfo", "", "software: graft\r\n"))),
      "application/warc", -1, -1)).toDS()
    val got = Multimodal.warcResponseBodies(ds).collect()
      .map(r => (r.rec_idx, r.status, r.content_type, r.body)).toSeq
    assert(got === Seq(
      (0, 200, "text/plain", utf8Body),
      (1, 200, "text/plain", "plain bytes"),
      (2, -1, "", "not http")))
  }

  test("warcRecords: per-record rows over a Dataset; a garbage payload " +
    "emits the single sentinel row") {
    import spark.implicits._
    val ds = Seq(
      Multimodal.MediaRow(1L, Multimodal.warcBytes(Seq(
        ("warcinfo", "", 3), ("response", "https://x.org/p", 7))),
        "application/warc", -1, -1),
      Multimodal.MediaRow(2L, "junk".getBytes("ISO-8859-1"),
        "text/plain", -1, -1)).toDS()
    val got = Multimodal.warcRecords(ds).collect()
      .map(r => (r.media_id, r.rec_idx, r.warc_type, r.target_uri,
        r.content_length, r.n_headers)).toSet
    assert(got === Set(
      (1L, 0, "warcinfo", "", 3L, 3),
      (1L, 1, "response", "https://x.org/p", 7L, 4),
      (2L, -1, "", "", -1L, 0)))
  }

  test("Exif: hand-assembled big-endian TIFF IFD parses exactly") {
    // MM header, one orientation entry (value 6, inline SHORT in the
    // first two value bytes), assembled independently of tiffIfdBytes
    val tiff = ByteBuffer.allocate(8 + 2 + 12 + 4)
      .order(ByteOrder.BIG_ENDIAN)
    tiff.put("MM".getBytes("ISO-8859-1")).putShort(42.toShort).putInt(8)
    tiff.putShort(1.toShort)
    tiff.putShort(0x0112.toShort).putShort(3.toShort).putInt(1)
      .putShort(6.toShort).putShort(0.toShort)
    tiff.putInt(0)
    val m = Multimodal.parseExifMeta(
      Multimodal.jpegBytesWithTiff(10, 10, tiff.array()))
    assert(m === Multimodal.ExifMeta("MM", 1, 6, has_gps = false, ""))
  }

  test("parseExifMeta: both byte orders, datetime deref, lying " +
    "offsets, no-Exif sentinel") {
    val le = Multimodal.parseExifMeta(Multimodal.jpegBytesWithTiff(4, 4,
      Multimodal.tiffIfdBytes(littleEndian = true, 8, withGps = true,
        "2026:01:02 03:04:05")))
    assert(le === Multimodal.ExifMeta("II", 3, 8, has_gps = true,
      "2026:01:02 03:04:05"))
    val be = Multimodal.parseExifMeta(Multimodal.jpegBytesWithTiff(4, 4,
      Multimodal.tiffIfdBytes(littleEndian = false, 3, withGps = false,
        "2027:12:31 23:59:59")))
    assert(be === Multimodal.ExifMeta("MM", 2, 3, has_gps = false,
      "2027:12:31 23:59:59"))

    // a lying DateTime offset skips the field, keeps the rest
    val tiff = Multimodal.tiffIfdBytes(littleEndian = true, 5,
      withGps = false, "2026:01:02 03:04:05")
    // DateTime entry is the 2nd: value field at 8 + 2 + 12 + 8
    val bb = ByteBuffer.wrap(tiff).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(8 + 2 + 12 + 8, 0x7FFFFF)
    val lying = Multimodal.parseExifMeta(
      Multimodal.jpegBytesWithTiff(4, 4, tiff))
    assert(lying.orientation === 5 && lying.datetime === "")

    // plain JPEG without APP1 Exif and raw garbage both sentinel
    assert(Multimodal.parseExifMeta(Multimodal.jpegBytes(8, 8, 3,
      progressive = false, withExif = false)).byte_order === "")
    // (jpegBytes' withExif stub has no real TIFF block either)
    assert(Multimodal.parseExifMeta(Multimodal.jpegBytes(8, 8, 3,
      progressive = false, withExif = true)).byte_order === "")
    assert(Multimodal.parseExifMeta("garbage".getBytes("ISO-8859-1"))
      .byte_order === "")
    assert(Multimodal.parseExifMeta(null).byte_order === "")
  }

  test("FLAC: hand-assembled STREAMINFO bit fields parse exactly") {
    // 44100 Hz, 2ch, 16bps, 441000 samples (10 s), one VORBIS_COMMENT
    val bb = ByteBuffer.allocate(4 + 38 + 4 + 8)
      .order(ByteOrder.BIG_ENDIAN)
    bb.put("fLaC".getBytes("ISO-8859-1"))
    bb.put(0x00.toByte).put(0.toByte).put(0.toByte).put(34.toByte)
    bb.putShort(4096.toShort).putShort(4096.toShort)
    (0 until 6).foreach(_ => bb.put(0.toByte)) // frame size fields
    // 44100 = 0b00001010 11000100 0100 -> bytes 0x0A 0xC4 0x4?
    bb.put(0x0A.toByte).put(0xC4.toByte)
    // low rate nibble 0x4, channels-1 = 1 (bits 3..1), bps-1 = 15
    // high bit (bit 0) = 0 -> 0100 001 0
    bb.put(0x42.toByte)
    // bps-1 low nibble 1111, total>>32 = 0 -> 0xF0
    bb.put(0xF0.toByte)
    bb.putInt(441000)
    (0 until 16).foreach(_ => bb.put(0.toByte)) // md5
    bb.put(0x84.toByte).put(0.toByte).put(0.toByte).put(8.toByte)
    (0 until 8).foreach(_ => bb.put(0.toByte))
    val m = Multimodal.parseFlacMeta(bb.array())
    assert(m === Multimodal.FlacMeta(44100, 2, 16, 441000L, 10000L,
      n_blocks = 2, has_vorbis_comment = true, has_picture = false))
  }

  test("parseFlacMeta: fixture round-trip, truncation, garbage") {
    val base = Multimodal.flacBytes(48000, 2, 24, 48000L * 7 + 3,
      Seq((4, 10), (6, 20)))
    val m = Multimodal.parseFlacMeta(base)
    assert(m === Multimodal.FlacMeta(48000, 2, 24, 48000L * 7 + 3,
      7000L, n_blocks = 3, has_vorbis_comment = true,
      has_picture = true))

    // 8-channel 36-bit-boundary sample count survives the bit packing
    val big = Multimodal.parseFlacMeta(
      Multimodal.flacBytes(96000, 8, 32, (1L << 36) - 1, Seq.empty))
    assert(big.channels === 8 && big.bits_per_sample === 32)
    assert(big.total_samples === (1L << 36) - 1)

    // truncated mid-extra-block: STREAMINFO stands, the cut block
    // is not inventoried
    val cut = Multimodal.parseFlacMeta(base.take(base.length - 15))
    assert(cut.sample_rate === 48000 && cut.n_blocks === 2
      && !cut.has_picture)

    // a non-STREAMINFO first block violates the spec -> sentinel
    val bad = base.clone()
    bad(4) = 0x04.toByte
    assert(Multimodal.parseFlacMeta(bad).sample_rate === -1)

    assert(Multimodal.parseFlacMeta("fLaCxxxx".getBytes("ISO-8859-1"))
      .sample_rate === -1)
    assert(Multimodal.parseFlacMeta(null).sample_rate === -1)
  }

  test("GIF: hand-assembled 89a with GCT, extension, two frames") {
    // assembled field-by-field, independent of gifBytes
    val bb = ByteBuffer.allocate(13 + 3 * 4 + 8 + 2 * (13 + 3) + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("GIF89a".getBytes("ISO-8859-1"))
    bb.putShort(320.toShort).putShort(200.toShort)
    bb.put(0x81.toByte) // GCT flag + size bits 001 -> 4 entries
    bb.put(0.toByte).put(0.toByte)
    (0 until 12).foreach(i => bb.put(i.toByte)) // GCT 4 x RGB
    bb.put(0x21.toByte).put(0xF9.toByte).put(4.toByte)
      .put(0.toByte).putShort(10.toShort).put(0.toByte).put(0.toByte)
    (0 until 2).foreach { _ =>
      bb.put(0x2C.toByte).putShort(0.toShort).putShort(0.toShort)
        .putShort(320.toShort).putShort(200.toShort).put(0.toByte)
        .put(8.toByte).put(3.toByte).put(1.toByte).put(2.toByte)
        .put(3.toByte).put(0.toByte)
    }
    bb.put(0x3B.toByte)
    val m = Multimodal.parseGifMeta(bb.array())
    assert(m === Multimodal.GifMeta("89a", 320, 200, gct_flag = true,
      gct_entries = 4, n_images = 2, n_extensions = 1,
      has_trailer = true))
  }

  test("parseGifMeta: fixture round-trip, truncation, garbage") {
    val base = Multimodal.gifBytes("87a", 64, 48, 32, 2, Seq(9, 200))
    val m = Multimodal.parseGifMeta(base)
    assert(m === Multimodal.GifMeta("87a", 64, 48, gct_flag = true,
      gct_entries = 32, n_images = 2, n_extensions = 2,
      has_trailer = true))

    // no GCT, single frame, no extensions
    val plain = Multimodal.parseGifMeta(
      Multimodal.gifBytes("89a", 3, 2, 0, 0, Seq(1)))
    assert(plain === Multimodal.GifMeta("89a", 3, 2, gct_flag = false,
      gct_entries = 0, n_images = 1, n_extensions = 0,
      has_trailer = true))

    // truncated mid-frame: stops at what was parsed, no trailer
    val cut = Multimodal.parseGifMeta(base.take(base.length - 205))
    assert(cut.width === 64 && cut.n_images < 2 && !cut.has_trailer)

    // bytes after the trailer are outside the grammar
    val trailing = base ++ Array.fill(16)(0x2C.toByte)
    assert(Multimodal.parseGifMeta(trailing) === m)

    assert(Multimodal.parseGifMeta("GIF99a not really a gif"
      .getBytes("ISO-8859-1")).width === -1)
    assert(Multimodal.parseGifMeta(null).width === -1)
  }

  test("WebP: hand-assembled VP8X and VP8 headers parse exactly") {
    // VP8X: alpha + anim flags, canvas 2000x1000, one ANIM chunk
    val bb = ByteBuffer.allocate(12 + 18 + 8 + 6)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ISO-8859-1")).putInt(4 + 18 + 8 + 6)
      .put("WEBP".getBytes("ISO-8859-1"))
    bb.put("VP8X".getBytes("ISO-8859-1")).putInt(10)
    bb.put(0x12.toByte) // alpha (0x10) + anim (0x02)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    bb.put(0xCF.toByte).put(0x07.toByte).put(0.toByte) // 1999 -> 2000
    bb.put(0xE7.toByte).put(0x03.toByte).put(0.toByte) // 999 -> 1000
    bb.put("ANIM".getBytes("ISO-8859-1")).putInt(6)
    (0 until 6).foreach(_ => bb.put(0.toByte))
    val x = Multimodal.parseWebpMeta(bb.array())
    assert(x === Multimodal.WebpMeta("VP8X", 2000, 1000,
      has_alpha = true, has_anim = true, has_exif = false, n_chunks = 2))

    val v = Multimodal.parseWebpMeta(Multimodal.webpBytesVp8(640, 480, 5))
    assert(v === Multimodal.WebpMeta("VP8", 640, 480, has_alpha = false,
      has_anim = false, has_exif = false, n_chunks = 1))
  }

  test("parseWebpMeta: fixture round-trip, odd-size padding, garbage") {
    val m = Multimodal.parseWebpMeta(Multimodal.webpBytesVp8x(
      800, 600, alpha = true, anim = false, exif = true,
      Seq(("ALPH", 7), ("EXIF", 12))))
    assert(m === Multimodal.WebpMeta("VP8X", 800, 600, has_alpha = true,
      has_anim = false, has_exif = true, n_chunks = 3))

    // odd chunk sizes pad to even per RIFF; the walk must not drift
    val odd = Multimodal.parseWebpMeta(Multimodal.webpBytesVp8x(
      10, 20, alpha = false, anim = true, exif = false,
      Seq(("ANIM", 5), ("ANMF", 3), ("XYZW", 1))))
    assert(odd.n_chunks === 4 && odd.width === 10 && odd.height === 20)
    assert(odd.has_anim && !odd.has_alpha)

    // a lying chunk size stops the walk at what was inventoried
    val base = Multimodal.webpBytesVp8x(4, 4, alpha = false,
      anim = false, exif = false, Seq(("EXIF", 2)))
    val lying = base.clone()
    lying(12 + 4) = 0x7F.toByte // VP8X length becomes enormous
    assert(Multimodal.parseWebpMeta(lying).n_chunks === 0)

    // RIFF framing but an unknown first chunk is not a WebP we claim
    val alien = base.clone()
    alien(12) = 'Q'.toByte
    assert(Multimodal.parseWebpMeta(alien).width === -1)
    assert(Multimodal.parseWebpMeta("RIFFxxxxWAVE----"
      .getBytes("ISO-8859-1")).width === -1)
    assert(Multimodal.parseWebpMeta(null).width === -1)
  }

  test("gzipMembers: multi-member stream walks member by member, " +
    "payloads round-trip byte-exactly, offsets/sizes tile the buffer") {
    val p1 = ("alpha " * 40).getBytes("ISO-8859-1")
    val p2 = "short".getBytes("ISO-8859-1")
    val bytes = Multimodal.gzipMembersBytes(Seq(p1, p2))
    val ms = Multimodal.gzipMembers(bytes)
    assert(ms.length === 2)
    assert(ms(0).payload.toSeq === p1.toSeq)
    assert(ms(1).payload.toSeq === p2.toSeq)
    assert(ms.forall(_.crc_ok))
    assert(ms(0).member_off === 0L)
    assert(ms(1).member_off === ms(0).compressed_bytes)
    assert(ms.map(_.compressed_bytes).sum === bytes.length.toLong)
    assert(ms(0).uncompressed_bytes === p1.length.toLong)
  }

  test("gzipMembers: a corrupted trailer flags crc_ok=false but the " +
    "walk continues at the known member boundary") {
    val p1 = "first member payload".getBytes("ISO-8859-1")
    val p2 = "second member payload".getBytes("ISO-8859-1")
    val bytes = Multimodal.gzipMembersBytes(Seq(p1, p2))
    val clean = Multimodal.gzipMembers(bytes)
    // flip a bit in member 0's stored CRC (first trailer byte)
    val crcPos = clean(0).compressed_bytes.toInt - 8
    bytes(crcPos) = (bytes(crcPos) ^ 0x01).toByte
    val ms = Multimodal.gzipMembers(bytes)
    assert(ms.length === 2)
    assert(!ms(0).crc_ok)
    assert(ms(1).crc_ok)
    assert(ms(1).payload.toSeq === p2.toSeq)
  }

  test("gzipMembers: garbage yields nothing; trailing garbage after a " +
    "valid member degrades to a member prefix") {
    assert(Multimodal.gzipMembers("not gzip".getBytes("ISO-8859-1")).isEmpty)
    assert(Multimodal.gzipMembers(null).isEmpty)
    val ok = Multimodal.gzipMembersBytes(Seq("x".getBytes("ISO-8859-1")))
    val withJunk = ok ++ "JUNKJUNKJUNKJUNK".getBytes("ISO-8859-1")
    val ms = Multimodal.gzipMembers(withJunk)
    assert(ms.length === 1)
    assert(ms(0).crc_ok)
  }

  test("warcGzRecords: member-per-record WARC.gz parses end to end; " +
    "junk media emits the sentinel row") {
    val recs = Seq(
      ("warcinfo", "", 12),
      ("response", "https://e.example/p", 24))
    val media = Multimodal.gzipMembersBytes(
      recs.map(r => Multimodal.warcBytes(Seq(r))))
    val ds = Seq(
      Multimodal.MediaRow(1L, media, "application/warc", -1, -1),
      Multimodal.MediaRow(2L, "not gzip at all".getBytes("ISO-8859-1"),
        "text/plain", -1, -1)).toDS()
    val rows = Multimodal.warcGzRecords(ds).collect()
      .sortBy(r => (r.media_id, r.member_idx))
    assert(rows.length === 3)
    assert(rows(0).member_idx === 0 && rows(0).warc_type === "warcinfo"
      && rows(0).content_length === 12L && rows(0).rec_idx === 0)
    assert(rows(1).member_idx === 1 && rows(1).warc_type === "response"
      && rows(1).target_uri === "https://e.example/p"
      && rows(1).content_length === 24L)
    assert(rows.take(2).forall(_.crc_ok))
    assert(rows(2).media_id === 2L && rows(2).member_idx === -1)
  }

  test("warcGzResponseBodies: response bodies decode straight from " +
    "member-per-record WARC.gz; non-response members contribute nothing") {
    val html = "<p>hello archive</p>"
    val ok = "HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n\r\n" + html
    val media = Multimodal.gzipMembersBytes(Seq(
      Multimodal.warcBytesRaw(Seq(("warcinfo", "", "software: x\r\n"))),
      Multimodal.warcBytesRaw(Seq(
        ("response", "https://e.example/p", ok))),
      Multimodal.warcBytesRaw(Seq(("request", "https://e.example/p", "")))))
    val ds = Seq(
      Multimodal.MediaRow(1L, media, "application/warc", -1, -1),
      Multimodal.MediaRow(2L, "not gzip".getBytes("ISO-8859-1"),
        "text/plain", -1, -1)).toDS()
    val rows = Multimodal.warcGzResponseBodies(ds).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.media_id === 1L && r.member_idx === 1 && r.rec_idx === 0)
    assert(r.target_uri === "https://e.example/p")
    assert(r.status === 200 && r.content_type === "text/html")
    assert(r.body === html)
  }
}

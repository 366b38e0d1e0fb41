package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.NfcNormalizeExpr

class NfcNormalizeExprSpec extends SparkSpec {
  import spark.implicits._

  test("NFC composes decomposed sequences, maps compatibility codepoints, keeps ligatures") {
    val cases = Seq(
      "e\u0301",  // decomposed e + combining acute -> U+00E9
      "\u00e9",   // already composed -> unchanged
      "\u212b",   // Angstrom sign -> U+00C5 under NFC
      "\ufb01",   // fi ligature: NFC keeps it (NFKC would split)
      "plain ascii",  // fast path: already normalized
      "")
    val got = cases.toDF("s")
      .select(NfcNormalizeExpr.nfcNormalize(spark, $"s").as("n"))
      .select($"n", length($"n").as("len"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(got(0) === ("\u00e9", 1))
    assert(got(1) === ("\u00e9", 1))
    assert(got(2) === ("\u00c5", 1))
    assert(got(3) === ("\ufb01", 1))
    assert(got(4) === ("plain ascii", 11))
    assert(got(5) === ("", 0))
  }

  test("null propagates; fast path returns the same UTF8String; normalization is idempotent") {
    val withNull = Seq(Some("a\u0301"), None).toDF("s")
      .select(NfcNormalizeExpr.nfcNormalize(spark, $"s").as("n"))
      .collect()
    assert(withNull(0).getString(0) === "\u00e1")
    assert(withNull(1).isNullAt(0))
    val ascii = UTF8String.fromString("already fine")
    assert(NfcNormalizeExpr.normalize(ascii) eq ascii) // no copy
    val once = NfcNormalizeExpr.normalize(UTF8String.fromString("e\u0301 x"))
    assert(NfcNormalizeExpr.normalize(once) === once)
  }

  test("dedup fingerprints agree after normalization where raw bytes disagree") {
    // the motivating bug: the same visible text in two encodings would
    // split an exact-dedup group without NFC
    val df = Seq((1L, "caf\u00e9 au lait"), (2L, "cafe\u0301 au lait"))
      .toDF("id", "text")
    val raw = df.select(md5($"text").as("fp")).distinct().count()
    val norm = df
      .select(md5(NfcNormalizeExpr.nfcNormalize(spark, $"text")).as("fp"))
      .distinct().count()
    assert(raw === 2L && norm === 1L)
  }
}

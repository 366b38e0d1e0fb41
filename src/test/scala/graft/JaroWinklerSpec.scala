package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.JaroWinklerExpr
import graft.operators.FuzzyJoin

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerExpr.similarity(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values match the rapidfuzz/DuckDB reference bits") {
    // constants read back from DuckDB jaro_winkler_similarity
    assert(jw("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") === 0.8962962962962964)
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(jw("kitten", "sitting") === 0.746031746031746)
    assert(jw("arnab", "aranb") === 0.9466666666666665)
  }

  test("edge semantics: empties score 0, identity scores 1, " +
    "no boost at or below 0.7, window-0 transposition") {
    assert(jw("", "") === 0.0) // DuckDB convention, NOT 1.0
    assert(jw("", "abc") === 0.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("x", "x") === 1.0)
    assert(jw("ab", "ba") === 0.0) // window floor(2/2)-1 = 0
    assert(jw("foo", "bar") === 0.0)
    // jaro 2/3 < 0.7: prefix 3 must NOT boost
    assert(jw("abcdef", "abczzz") === 0.6666666666666666)
  }

  test("expression: null-safe, codegen'd column path") {
    val df = Seq(("MARTHA", "MARHTA"), (null, "x"), ("y", null))
      .toDF("a", "b")
    val out = df.select(
      JaroWinklerExpr.jaroWinkler(spark, col("a"), col("b")).as("jw"))
      .collect()
    assert(out(0).getDouble(0) === 0.9611111111111111)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }

  test("jaroWinklerBlocked: within-block pairs only, threshold kept, " +
    "id_a < id_b") {
    val df = Seq(
      (1L, "jon smith", "b1"), (2L, "john smith", "b1"),
      (3L, "jane doe", "b1"), (4L, "john smith", "b2"))
      .toDF("id", "name", "blk")
    val out = FuzzyJoin.jaroWinklerBlocked(df, "id", "name", "blk", 0.9)
      .collect()
    // only (1,2) passes: cross-block (2,4) never scored, jane doe too far
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSet === Set((1L, 2L)))
    assert(out.head.getAs[Double]("jw") > 0.9)
  }

  test("fellegiSunterWeights: hand-computed u and log2 weights") {
    // one block, seg values A,A,B,C: u = (4+1+1)/16 = 0.375;
    // m = 0.75 -> agree weight log2(2) = 1, disagree log2(0.25/0.625)
    val df = Seq((1L, 9L, "A"), (2L, 9L, "A"), (3L, 9L, "B"), (4L, 9L, "C"))
      .toDF("id", "blk", "seg")
    val out = FuzzyJoin.fellegiSunterWeights(df, "id", "blk",
      Seq(("seg", 0.75)))
      .orderBy($"agree_seg")
      .collect().map(r => (r.getBoolean(0), r.getLong(1), r.getDouble(2)))
    val wDis = BigDecimal(math.log(0.25 / 0.625) / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq === Seq((false, 5L, wDis), (true, 1L, 1.0)))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Mixture, Network, Recommend, TextAnalysis}

class RecommendSpec extends SparkSpec {
  import spark.implicits._

  test("cidrBounds: /8 clears 24 host bits, /32 is a single address, " +
    "malformed prefix or address yields null") {
    val df = Seq("10.0.0.0/8", "10.9.8.7/8", "1.2.3.4/32", "1.2.3.4/33",
      "garbage/8").toDF("cidr")
      .select(col("cidr"), Network.cidrBounds(col("cidr")).as("b"))
      .select(col("cidr"), col("b.lo"), col("b.hi"), col("b.prefix_len"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))).toMap
    val lo8 = 10L * (1L << 24)
    assert(df("10.0.0.0/8") === Some((lo8, lo8 + (1L << 24) - 1)))
    // host bits of the base are cleared, not preserved
    assert(df("10.9.8.7/8") === Some((lo8, lo8 + (1L << 24) - 1)))
    val one = 1L * (1L << 24) + 2L * 65536 + 3L * 256 + 4L
    assert(df("1.2.3.4/32") === Some((one, one)))
    assert(df("1.2.3.4/33") === None)
    assert(df("garbage/8") === None)
  }

  test("cidrJoin + mostSpecific: wide blocks span multiple /16 prefixes; " +
    "nested blocks resolve to the longest prefix") {
    val ips = Seq(
      (1L, "10.0.0.5"), (2L, "10.1.200.9"), (3L, "10.2.0.1"),
      (4L, "99.0.0.1"))
      .toDF("id", "ip")
      .withColumn("ip_int", graft.functions.IpFunctions.ipToInt(col("ip")))
    // 10.0.0.0/15 covers 10.0.* and 10.1.* (two /16 prefixes);
    // 10.0.0.0/24 nests inside it
    val blocks = Seq("10.0.0.0/15", "10.0.0.0/24", "10.2.0.0/16")
      .toDF("cidr")
    val joined = Network.cidrJoin(ips, "ip_int", blocks, "cidr")
    val all = joined.select(col("id"), col("cidr")).as[(Long, String)]
      .collect().toSet
    assert(all === Set(
      (1L, "10.0.0.0/15"), (1L, "10.0.0.0/24"),
      (2L, "10.0.0.0/15"), (3L, "10.2.0.0/16")))
    val best = Network.mostSpecific(joined, Seq("id"), "prefix_len",
      col("cidr")).select(col("id"), col("cidr")).as[(Long, String)]
      .collect().toMap
    assert(best === Map(1L -> "10.0.0.0/24", 2L -> "10.0.0.0/15",
      3L -> "10.2.0.0/16"))
  }

  test("knBigramLogProb: hand-computed interpolated KN on a 2-bigram " +
    "reference; unseen history falls back to continuation probability") {
    val ref = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b"), (2L, "z a")).toDF("doc_id", "text")
    val out = TextAnalysis.knBigramLogProb(docs, ref, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("kn_logprob")).toMap
    // ref bigrams: (a,b) c=2, (b,a) c=1; c1(a)=2 n1fw(a)=1; B=2 types
    // Pcont(b) = 1/2; P(b|a) = (2-.75)/2 + .75*1/2*(1/2) = 0.8125
    assert(math.abs(out(1L) - math.log(0.8125)) < 1e-12)
    // doc2 "z a": history z unseen -> Pcont(a) = 1/2
    assert(math.abs(out(2L) - math.log(0.5)) < 1e-12)
  }

  test("queryLikelihood: matched doc scores the closed form; docs with " +
    "no query term are absent") {
    val docs = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val out = TextAnalysis.queryLikelihood(
      docs, "text", "doc_id", Seq("x"), mu = 1.0, k = 10).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    // cf(x)=2, |C|=5, bg = 1*2/5 = 0.4
    // score = [ln(2+0.4) - ln(0.4)] + ln(0.4) - 1*ln(3+1)
    val expect = math.log(2.4) - math.log(4.0)
    assert(math.abs(out.head.getAs[Double]("ql_score") - expect) < 1e-9)
  }

  test("itemItemCosine/itemTopK: identical baskets give cosine 1; the " +
    "maxBasket cap excludes power users from counts and degrees") {
    val baskets = Seq(
      (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (3L, 10L), (3L, 30L),
      // power user touching everything: must not inflate any pair
      (9L, 10L), (9L, 20L), (9L, 30L), (9L, 40L))
      .toDF("u", "i")
    val pairs = Recommend.itemItemCosine(baskets, "u", "i",
      maxBasket = 3, minCo = 1L)
      .select(col("item_a"), col("item_b"), col("co"), col("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getAs[Double]("cosine"))).toMap
    // user 9 has 4 items > maxBasket=3 and is dropped entirely
    assert(pairs((10L, 20L))._1 === 2L)
    assert(math.abs(pairs((10L, 20L))._2 - 2.0 / math.sqrt(3.0 * 2.0)) < 1e-12)
    assert(pairs((10L, 30L)) === ((1L, 1.0 / math.sqrt(3.0 * 1.0))))
    assert(!pairs.contains((10L, 40L)) && !pairs.contains((20L, 40L)))
    val top = Recommend.itemTopK(
      Recommend.itemItemCosine(baskets, "u", "i", maxBasket = 3, minCo = 1L),
      1).select(col("item"), col("neighbor")).as[(Long, Long)]
      .collect().toMap
    // item 10's best neighbor is 20 (cosine 0.816 > 0.577)
    assert(top(10L) === 20L)
  }

  test("negativeSamplingTable: intervals tile [0,1) gaplessly in count " +
    "order and weights sum to 1") {
    val docs = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val rows = Mixture.negativeSamplingTable(docs, "text", vocabSize = 2)
      .collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(rows.head.getAs[Double]("cum_lo") === 0.0)
    assert(rows.last.getAs[Double]("cum_hi") === 1.0)
    // adjacent intervals share their boundary exactly
    assert(rows(0).getAs[Double]("cum_hi") === rows(1).getAs[Double]("cum_lo"))
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-12)
    // count^0.75 via IEEE sqrt: a=4 -> 4^0.75 = 2*sqrt(2)
    val wa = rows(0).getAs[Double]("weight")
    val expectA = 2.0 * math.sqrt(2.0) /
      (2.0 * math.sqrt(2.0) + math.sqrt(2.0 * math.sqrt(2.0)))
    assert(math.abs(wa - expectA) < 1e-9)
  }

  test("negativeSamplingAudit: every draw lands in exactly one interval") {
    val docs = Seq((1L, "a a a b b c d e")).toDF("doc_id", "text")
    val table = Mixture.negativeSamplingTable(docs, "text", vocabSize = 5)
    val out = Mixture.negativeSamplingAudit(table, nDraws = 500, seed = 7L)
    assert(out.agg(sum(col("actual"))).as[Long].head === 500L)
    // head token expects the most draws
    val byUc = out.orderBy(col("uc").desc).select(col("expected"))
      .as[Double].collect()
    assert(byUc.head === byUc.max)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{TextAnalysis, TextDedup}

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("textStats on a known string") {
    val df = Seq((1L, "Hello, world! 42  wide")).toDF("doc_id", "text")
    val r = TextAnalysis.textStats(df, "text").head
    assert(r.getAs[Long]("n_chars") === 22L)
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Double]("digit_ratio") === 2.0 / 22)
    // puncts: , ! -> 2
    assert(r.getAs[Double]("punct_ratio") === 2.0 / 22)
  }

  test("bpeish token count: runs + marks") {
    val df = Seq("ab12cd, x!").toDF("text")
    // [ab][12][cd][,][x][!] = 6
    val n = df.select(TextAnalysis.bpeishTokenCount($"text")).head.getLong(0)
    assert(n === 6L)
  }

  test("languageId picks the right stopword table; und on no hits") {
    val samples = Seq(
      ("the cat and the dog went to the park", "en"),
      ("der hund und die katze ist nicht da", "de"),
      ("le chat est dans la maison pour le chien", "fr"),
      ("el perro y la casa es una fiesta", "es"),
      ("zzz qqq xxx", "und"))
    val df = samples.map(_._1).toDF("text")
    val got = df.select(TextAnalysis.languageId($"text")).collect().map(_.getString(0))
    assert(got.toSeq === samples.map(_._2))
  }

  test("repetitionStats: hand-computed fractions on known docs") {
    val df = Seq(
      (1L, "a a a b"),      // tokens: a x3, b -> top 3/4, dup 3/4
                            // 2-grams: "a a" x2, "a b" -> dup 2/3
                            // 3-grams: "a a a", "a a b" -> dup 0/2
      (2L, "x y z"),        // all unique: top 1/3, dup 0 everywhere
      (3L, "q w")           // no 3-grams -> NULL dup_3gram_frac
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(df, "text", "doc_id")
      .orderBy($"doc_id").collect()
    assert(r(0).getAs[Long]("n_tokens") === 4L)
    assert(r(0).getAs[Double]("top_token_frac") === 0.75)
    assert(r(0).getAs[Double]("dup_token_frac") === 0.75)
    assert(math.abs(r(0).getAs[Double]("dup_2gram_frac") - 2.0 / 3) < 1e-12)
    assert(r(0).getAs[Double]("dup_3gram_frac") === 0.0)
    assert(math.abs(r(1).getAs[Double]("top_token_frac") - 1.0 / 3) < 1e-12)
    assert(r(1).getAs[Double]("dup_token_frac") === 0.0)
    assert(r(2).getAs[Long]("n_tokens") === 2L)
    assert(r(2).isNullAt(r(2).fieldIndex("dup_3gram_frac")))
  }

  test("substringDupCoverage: islands merge overlapping k-spans; cross-doc hits count") {
    val df = Seq(
      (1L, "a b c d e a b c d e x"), // "a b c","b c d","c d e" repeat at +5
      (2L, "q w e r t"),             // clean
      (3L, "a b c z z")              // shares "a b c" with doc 1
    ).toDF("doc_id", "text")
    val r = TextDedup.substringDupCoverage(df, "text", "doc_id", k = 3)
      .orderBy($"doc_id").collect()
    // doc 1: marked positions 1,2,3 and 6,7,8 -> two islands, each
    // covering max-min+k = 5 tokens ("a b c d e" twice) -> 10 of 11
    assert(r(0).getAs[Long]("n_tokens") === 11L)
    assert(r(0).getAs[Long]("dup_span_count") === 2L)
    assert(r(0).getAs[Long]("dup_tokens") === 10L)
    assert(math.abs(r(0).getAs[Double]("dup_token_frac") - 10.0 / 11) < 1e-11)
    assert(r(1).getAs[Long]("dup_span_count") === 0L)
    assert(r(1).getAs[Long]("dup_tokens") === 0L)
    // doc 3: only "a b c" (pos 1) is duplicated (cross-doc) -> 3 tokens
    assert(r(2).getAs[Long]("dup_span_count") === 1L)
    assert(r(2).getAs[Long]("dup_tokens") === 3L)
  }

  test("containmentPairs: full quote scores 1.0 where Jaccard would be tiny; hot shingles pruned") {
    val quote = "the five boxing wizards jump quickly over glass"
    val filler = (1 to 40).map(i => s"filler$i word$i token$i").mkString(" ")
    val df = Seq(
      (1L, quote),                 // 6 shingles, all inside doc 2
      (2L, s"$filler $quote"),     // long doc quoting doc 1 verbatim
      (3L, "completely unrelated text about gardens and weather patterns"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextDedup.containmentPairs(
      df, "text", "doc_id", n = 3, maxDf = 50, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 2L, 1.0))) // |A∩B|/min = 1; Jaccard ≈ 0.05
    // a shingle shared by > maxDf docs must not generate pairs
    val boiler = (1L to 5L).map(i => (i, "same boiler plate line " + i))
      .toDF("doc_id", "text")
    val pruned = graft.operators.TextDedup.containmentPairs(
      boiler, "text", "doc_id", n = 3, maxDf = 2, threshold = 0.1)
    // "same boiler plate" and "boiler plate line" appear in 5 docs > maxDf=2;
    // the only surviving shingle per doc is its unique "plate line <i>"
    assert(pruned.count() === 0)
  }

  test("dedupKeepBest keeps the highest-quality doc per cluster, not the lowest id") {
    val shared = "aa bb cc dd ee ff gg hh ii jj kk ll"
    val df = Seq(
      (1L, shared + " 111111111 222222222"), // digit_ratio > 0.3 -> quality 0.8
      (2L, shared),                          // clean -> quality 1.0
      (3L, "zz yy xx ww vv uu tt ss rr qq")  // unrelated singleton
    ).toDF("doc_id", "text")
    val scored = TextAnalysis.qualityScore(df, "text")
      .select($"doc_id", $"text", $"quality_score")
    val kept = TextDedup.dedupKeepBest(scored, "text", "doc_id", "quality_score")
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1,2 share 10 of 12 3-shingles (jaccard 0.833 >= 0.8) -> one
    // cluster labeled min id 1; the KEPT doc is 2 (quality beats id)
    assert(kept === Map(2L -> 1L, 3L -> 3L))
  }

  test("unigramLogProb: hand-computed corpus distribution") {
    val df = Seq((1L, "a a b"), (2L, "a b")).toDF("doc_id", "text")
    // corpus: a x3, b x2, total 5
    val r = TextAnalysis.unigramLogProb(df, "text", "doc_id")
      .orderBy($"doc_id").collect()
    val exp1 = (2 * math.log(3.0 / 5) + math.log(2.0 / 5)) / 3
    val exp2 = (math.log(3.0 / 5) + math.log(2.0 / 5)) / 2
    assert(r(0).getAs[Long]("n_tokens") === 3L)
    assert(math.abs(r(0).getAs[Double]("unigram_logprob") - exp1) < 1e-9)
    assert(math.abs(r(1).getAs[Double]("unigram_logprob") - exp2) < 1e-9)
  }

  test("bigramLogProb: hand-computed interpolation, OOV floor, short docs excluded") {
    val ref = Seq((100L, "a b a")).toDF("doc_id", "text")
    // ref model: unigrams a:2 b:1 (T=3, V=2); bigrams (a,b):1 (b,a):1
    val docs = Seq(
      (1L, "a b"), // seen bigram: 0.7*(1/2) + 0.2*(1/3) + 0.1/3
      (2L, "b c"), // seen w1, unseen bigram+w2: floor only
      (3L, "c a"), // unseen w1: unigram + floor terms
      (4L, "z")    // one token: no bigrams, excluded
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bigramLogProb(docs, ref, "text", "doc_id")
      .orderBy($"doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val p1 = 0.7 * (1.0 / 2) + 0.2 * (1.0 / 3) + 0.1 / 3
    val p2 = 0.1 / 3
    val p3 = 0.2 * (2.0 / 3) + 0.1 / 3
    val got = r.map(x => x.getAs[Double]("bigram_logprob"))
    assert(math.abs(got(0) - math.log(p1)) < 1e-9)
    assert(math.abs(got(1) - math.log(p2)) < 1e-9)
    assert(math.abs(got(2) - math.log(p3)) < 1e-9)
    assert(r.forall(x => x.getAs[Long]("n_bigrams") === 1L))
    assert(math.abs(r(0).getAs[Double]("perplexity") - 1.0 / p1) < 1e-9)
    // perplexity orders quality: the in-distribution doc scores lowest
    assert(r(0).getAs[Double]("perplexity") < r(2).getAs[Double]("perplexity"))
    assert(r(2).getAs[Double]("perplexity") < r(1).getAs[Double]("perplexity"))
  }

  test("tokenDropout: deterministic, order-preserving, rate near dropFrac, frac 0 is identity") {
    val docs = (1 to 50).map(i => (i.toLong, (("w" + i + " ") * 20).trim))
      .toDF("doc_id", "text")
    val a = TextAnalysis.tokenDropout(docs, "text", "doc_id", 0.3, 7L)
    val b = TextAnalysis.tokenDropout(docs, "text", "doc_id", 0.3, 7L)
    val ra = a.orderBy($"doc_id").collect()
    assert(ra.map(_.getString(3)).toSeq ===
      b.orderBy($"doc_id").collect().map(_.getString(3)).toSeq)
    // aggregate drop rate near 30% (hash-uniform over 1000 positions)
    val total = ra.map(_.getLong(1)).sum.toDouble
    val keptN = ra.map(_.getLong(2)).sum.toDouble
    assert(math.abs(1.0 - keptN / total - 0.3) < 0.08, s"rate ${1 - keptN / total}")
    // surviving tokens keep their original order (subsequence check)
    ra.foreach { r =>
      val orig = (("w" + r.getLong(0) + " ") * 20).trim
      val it = orig.split(" ").iterator
      assert(r.getString(3).split(" ").filter(_.nonEmpty)
        .forall(tok => it.contains(tok)))
    }
    // dropFrac 0 is the identity on tokens
    val id0 = TextAnalysis.tokenDropout(docs, "text", "doc_id", 0.0, 7L)
      .orderBy($"doc_id").collect()
    assert(id0.forall(r => r.getLong(1) === r.getLong(2)))
    // a different seed produces a different augmentation somewhere
    val c = TextAnalysis.tokenDropout(docs, "text", "doc_id", 0.3, 8L)
      .orderBy($"doc_id").collect().map(_.getString(3)).toSeq
    assert(c !== ra.map(_.getString(3)).toSeq)
  }

  test("ngramNovelty: unseen fraction, fully-known doc scores 0, short docs absent") {
    val ref = Seq((10L, "a b c d")).toDF("doc_id", "text")
    val df = Seq(
      (1L, "a b c d"),   // all 2 distinct 3-grams seen -> novelty 0
      (2L, "a b c x y"), // grams: abc(seen), bcx, cxy -> 2/3 unseen
      (3L, "z q")        // no 3-grams -> absent
    ).toDF("doc_id", "text")
    val got = graft.operators.TextDedup
      .ngramNovelty(df, ref, "text", "doc_id", n = 3)
      .orderBy($"doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(got(0).getAs[Long]("n_grams") === 2L &&
      got(0).getAs[Long]("n_unseen") === 0L &&
      got(0).getAs[Double]("novelty") === 0.0)
    assert(got(1).getAs[Long]("n_grams") === 3L &&
      got(1).getAs[Long]("n_unseen") === 2L)
    assert(math.abs(got(1).getAs[Double]("novelty") - 2.0 / 3) < 1e-12)
  }

  test("truncationStats: hand-computed truncation accounting per candidate length") {
    val df = Seq(3L, 10L, 4L).toDF("n_tokens")
    val got = TextAnalysis.truncationStats(df, "n_tokens", Seq(4, 8))
      .orderBy($"context_len").collect()
    // L=4: doc 10 truncates (kept 4); kept = 3+4+4 = 11 of 17
    assert(got(0).getAs[Long]("context_len") === 4L)
    assert(got(0).getAs[Long]("n_docs") === 3L)
    assert(got(0).getAs[Long]("n_truncated") === 1L)
    assert(got(0).getAs[Long]("tokens_kept") === 11L)
    assert(math.abs(got(0).getAs[Double]("frac_tokens_lost") - 6.0 / 17) < 1e-12)
    // L=8: still only the 10-token doc truncates, kept 15 of 17
    assert(got(1).getAs[Long]("n_truncated") === 1L)
    assert(got(1).getAs[Long]("tokens_kept") === 15L)
  }

  test("zipfFit: OLS matches a hand-computed fit over exact counts") {
    // freqs: a x8, b x4, c x2, d x1 -> ranks 1..4
    val df = Seq((1L, ("a " * 8 + "b " * 4 + "c c d").trim)).toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(df, "text", topN = 10).collect()(0)
    val xs = Seq(1, 2, 3, 4).map(i => math.log(i.toDouble))
    val ys = Seq(8, 4, 2, 1).map(f => math.log(f.toDouble))
    val n = 4.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val syy = ys.map(y => y * y).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - sx * slope) / n
    val r2 = math.pow(n * sxy - sx * sy, 2) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(r.getAs[Long]("n_terms") === 4L)
    assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-6)
    assert(math.abs(r.getAs[Double]("intercept") - icept) < 1e-6)
    assert(math.abs(r.getAs[Double]("r2") - r2) < 1e-6)
    // near-Zipf data: slope negative, r2 high
    assert(r.getAs[Double]("slope") < 0 && r.getAs[Double]("r2") > 0.9)
  }

  test("keywordTag: counts per topic, multi-topic terms count in both, no-hit docs absent") {
    val lexicon = Seq(("cat", "pets"), ("dog", "pets"), ("cat", "memes"))
      .toDF("term", "topic")
    val df = Seq(
      (1L, "cat dog cat bird"),
      (2L, "fish only")).toDF("doc_id", "text")
    val got = TextAnalysis.keywordTag(df, "text", "doc_id", lexicon)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc 1: pets = 2 cats + 1 dog; memes = 2 cats; doc 2: no rows
    assert(got === Map((1L, "pets") -> 3L, (1L, "memes") -> 2L))
  }

  test("crossSourceDupMatrix: asymmetric overlap, diagonal = within-source dups") {
    val df = Seq(
      (1L, "t one", "A"), (2L, "t one", "A"), // within-A dup pair
      (3L, "t one", "B"), (4L, "t two", "B")) // B shares t-one with A
      .toDF("doc_id", "text", "source")
    val got = graft.operators.TextDedup
      .crossSourceDupMatrix(df, "text", "doc_id", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(
      ("A", "A") -> 2L, // both copies have a same-source twin
      ("A", "B") -> 1L, // one B doc also occurs in A
      ("B", "A") -> 2L, // both A copies occur in B
      ("B", "B") -> 0L)) // no within-B dup
  }

  test("sourceDivergence: hand-computed entropy/cross-entropy/KL, identity holds") {
    val df = Seq(
      (1L, "A", "a a b"),
      (2L, "B", "b")).toDF("doc_id", "source", "text")
    // corpus: a:2 b:2 (q = 0.5 each); A: p_a=2/3 p_b=1/3; B: p_b=1
    val r = TextAnalysis.sourceDivergence(df, "text", "source")
      .orderBy($"source").collect()
    val entA = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    val ceA = math.log(2.0)
    assert(r(0).getAs[Long]("n_tokens") === 3L && r(0).getAs[Long]("vocab") === 2L)
    assert(math.abs(r(0).getAs[Double]("entropy") - entA) < 1e-9)
    assert(math.abs(r(0).getAs[Double]("cross_entropy") - ceA) < 1e-9)
    assert(math.abs(r(0).getAs[Double]("kl_divergence") - (ceA - entA)) < 1e-9)
    // a one-term source: zero entropy, KL = cross-entropy = ln 2
    assert(math.abs(r(1).getAs[Double]("entropy")) < 1e-12)
    assert(math.abs(r(1).getAs[Double]("kl_divergence") - math.log(2.0)) < 1e-9)
    // KL >= 0 on both (Gibbs), identity ce = ent + kl within rounding
    r.foreach { row =>
      assert(row.getAs[Double]("kl_divergence") >= -1e-12)
      assert(math.abs(row.getAs[Double]("cross_entropy")
        - row.getAs[Double]("entropy") - row.getAs[Double]("kl_divergence")) < 1e-9)
    }
  }

  test("hashedTf: buckets bounded, counts preserved, same term same bucket") {
    val df = Seq(
      (1L, "x y x"),
      (2L, "x z")).toDF("doc_id", "text")
    val r = TextAnalysis.hashedTf(df, "text", "doc_id", numFeatures = 16)
    val rows = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(rows.forall { case (_, b, _) => b >= 0 && b < 16 })
    // tf mass preserved per doc
    val mass = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(mass === Map(1L -> 3L, 2L -> 2L))
    // "x" lands in ONE bucket in both docs, with tf 2 and 1
    val xBuckets = rows.filter(_._3 == 2L).map(_._2).toSet
    assert(xBuckets.size === 1)
    assert(rows.filter(t => t._1 == 2L && t._2 == xBuckets.head)
      .map(_._3).toSeq === Seq(1L))
  }

  test("corpusReport rolls up counts, tokens, quality, languages per source") {
    val df = Seq(
      (1L, "the cat and the dog went to the park", "web"),
      (2L, "der hund und die katze ist nicht da", "web"),
      (3L, "zz", "books") // short: quality 1 - 0.5(len) - 0 - 0 - 0 = 0.5
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis.corpusReport(df, "text", "doc_id", "source")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("web").getAs[Long]("n_docs") === 2L)
    assert(r("web").getAs[Long]("sum_tokens") === 17L)
    assert(r("web").getAs[Long]("n_langs") === 2L) // en + de
    assert(r("books").getAs[Double]("sum_quality") === 0.5)
  }

  test("fingerprint is whitespace/case-insensitive canonical") {
    val df = Seq(("a  B\tc", "a b c")).toDF("x", "y")
    val r = df.select(
      TextFunctions.fingerprint($"x") === TextFunctions.fingerprint($"y")).head
    assert(r.getBoolean(0))
  }

  test("shingles: distinct word n-grams; short docs give empty set") {
    val df = Seq("a b c d", "a b").toDF("text")
    val got = df.select(TextFunctions.shingles($"text", 3)).collect()
      .map(_.getSeq[String](0).toSet)
    assert(got(0) === Set("a b c", "b c d"))
    assert(got(1) === Set.empty)
  }

  test("exactDedup keeps lowest id per duplicate text") {
    val df = Seq((1L, "x y z"), (2L, "X  y z"), (3L, "other")).toDF("id", "text")
    val kept = TextDedup.exactDedup(df, "text", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L))
  }

  test("minhash near-dup pairs find planted near-dups, skip unrelated") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"w$i").mkString(" ")
    val unrelated = (100 to 140).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("id", "text")
    val pairs = TextDedup.minhashNearDupPairs(df, "text", "id",
      threshold = 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    // jaccard of the planted pair: 35 shared / 41+... verify > 0.5 exact value
    val j = pairs.head.getAs[Double]("jaccard")
    assert(j > 0.7 && j < 1.0)
    val deduped = TextDedup.minhashDedup(df, "text", "id", threshold = 0.5)
    assert(deduped.select("id").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
  }

  test("persisted minhash index: probing the saved+loaded index is " +
    "row-identical to the from-scratch against-join") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"w$i").mkString(" ")
    val unrelated = (100 to 140).map(i => s"v$i").mkString(" ")
    val corpus = Seq((1L, base), (3L, unrelated)).toDF("id", "text")
    val incoming = Seq((10L, nearDup), (11L, "nothing shared at all"))
      .toDF("id", "text")
    val path = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_spec_minhash_index")
      .getAbsolutePath
    TextDedup.saveMinhashIndex(corpus, "text", "id", path)
    val viaIndex = TextDedup.minhashNearDupPairsAgainstIndex(
      TextDedup.loadMinhashIndex(spark, path), incoming, "text", "id",
      threshold = 0.5)
      .orderBy("id_a", "id_b").collect().map(_.toSeq)
    val fresh = TextDedup.minhashNearDupPairsAgainst(
      corpus, incoming, "text", "id", threshold = 0.5)
      .orderBy("id_a", "id_b").collect().map(_.toSeq)
    assert(viaIndex.toSeq === fresh.toSeq)
    assert(viaIndex.map(r => (r(0), r(1))).toSet === Set((1L, 10L)))
  }

  test("minhash index append-equivalence: save(A) + append(B) loads " +
    "identically to save(A ∪ B) and probes identically") {
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(); ()
    }
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 7) "ALTERED" else s"w$i").mkString(" ")
    val a = Seq((1L, base), (2L, "completely different words here"))
      .toDF("id", "text")
    val b = Seq((3L, nearDup)).toDF("id", "text")
    val probe = Seq((10L, base)).toDF("id", "text")
    val p1 = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_spec_minhash_append")
    val p2 = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_spec_minhash_union")
    rmrf(p1); rmrf(p2)
    TextDedup.saveMinhashIndex(a, "text", "id", p1.getAbsolutePath)
    TextDedup.appendToMinhashIndex(b, "text", "id", p1.getAbsolutePath)
    TextDedup.saveMinhashIndex(a.unionByName(b), "text", "id",
      p2.getAbsolutePath)
    val i1 = TextDedup.loadMinhashIndex(spark, p1.getAbsolutePath)
    val i2 = TextDedup.loadMinhashIndex(spark, p2.getAbsolutePath)
    assert(i1.bands.orderBy("id", "band").collect().map(_.toSeq).toSeq ===
      i2.bands.orderBy("id", "band").collect().map(_.toSeq).toSeq)
    assert(i1.shingles.orderBy("id", "shingle").collect().map(_.toSeq).toSeq ===
      i2.shingles.orderBy("id", "shingle").collect().map(_.toSeq).toSeq)
    val r1 = TextDedup.minhashNearDupPairsAgainstIndex(i1, probe,
      "text", "id", threshold = 0.5)
      .orderBy("id_a", "id_b").collect().map(_.toSeq)
    val r2 = TextDedup.minhashNearDupPairsAgainstIndex(i2, probe,
      "text", "id", threshold = 0.5)
      .orderBy("id_a", "id_b").collect().map(_.toSeq)
    assert(r1.toSeq === r2.toSeq)
    // the appended doc (near-dup of the probe) must be findable
    assert(r1.map(r => (r(0), r(1))).toSet === Set((1L, 10L), (3L, 10L)))
  }

  test("simhash: identical texts collide at hamming 0; near texts close") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val near = (1 to 60).map(i => if (i % 20 == 0) s"u$i" else s"w$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, near)).toDF("id", "text")
    val sigs = df.select($"id",
      TextFunctions.simhash64(TextFunctions.tokens($"text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(2L))
    val hd = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    assert(hd > 0 && hd <= 16)
    val pairs = TextDedup.simhashNearDupPairs(df, "text", "id", maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("repetitionStats single-scan shape equals the three-branch shape") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val docs = (1L to 40L).map { i =>
      (i, Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val a = TextAnalysis.repetitionStats(df, "text", "doc_id")
    val b = TextAnalysis.repetitionStats(df, "text", "doc_id", singleScan = true)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("decontaminateBloom equals plain decontaminate at any fpp") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"), // contains a bench 5-gram
      (2L, "totally unrelated words about something else here"),
      (3L, "beta gamma delta epsilon zeta more tail"), // contains a bench 5-gram
      (4L, "short doc"))                               // no 5-grams at all
    val cdf = corpus.toDF("doc_id", "text")
    val bdf = bench.toDF("doc_id", "text")
    val exact = TextDedup.decontaminate(cdf, bdf, "text", "doc_id", n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact === Set(2L, 4L))
    // loose fpp: false positives must be cleaned up by the verify join
    for (fpp <- Seq(0.5, 0.01)) {
      val got = TextDedup.decontaminateBloom(cdf, bdf, "text", "doc_id",
        n = 5, fpp = fpp).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === exact, s"fpp=$fpp")
    }
  }

  test("bloom might-contain expression has no false negatives vs the sketch") {
    val vals = (1 to 500).map(i => s"item-$i")
    val df = vals.toDF("s")
    val bf = df.stat.bloomFilter("s", 500, 0.03)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray
    }
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_bloom_might_contain",
        exprs => graft.functions.BloomMightContainExpr(
          scala.collection.immutable.ArraySeq.unsafeWrapArray(bytes), exprs.head),
        "scala_udf")
    // every inserted value probes true through the codegen'd expression
    val hits = df.filter(call_function("graft_bloom_might_contain", $"s")).count()
    assert(hits === 500L)
    // expression agrees with the driver-side sketch on non-members too
    val probes = (1 to 500).map(i => s"other-$i")
    val exprSays = probes.toDF("s")
      .select($"s", call_function("graft_bloom_might_contain", $"s").as("m"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    probes.foreach { p =>
      assert(exprSays(p) === bf.mightContainString(p), p)
    }
  }

  test("rollingHash is order-sensitive where fingerprint is not") {
    val df = Seq(("a b c", "c b a")).toDF("x", "y")
    val r = df.select(
      TextFunctions.rollingHash(TextFunctions.tokens($"x")) ===
        TextFunctions.rollingHash(TextFunctions.tokens($"y"))).head
    assert(!r.getBoolean(0))
  }

  test("removeDupSpans scrubs shared spans, keeps unique text, empties full dups") {
    val docs = Seq(
      (1L, "x1 a b c d e y1"), // shares "a b c d e" with doc 2
      (2L, "z1 a b c d e w1"),
      (3L, "p q r s t"),       // unique -> untouched
      (4L, "m n o p2 q2"),     // identical to doc 5 -> fully scrubbed
      (5L, "m n o p2 q2")).toDF("doc_id", "text")
    val got = TextDedup.removeDupSpans(docs, "text", "doc_id", k = 5)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(4)))
    assert(got.toSeq === Seq(
      (1L, 2L, "x1 y1"), (2L, 2L, "z1 w1"),
      (3L, 5L, "p q r s t"), (4L, 0L, ""), (5L, 0L, "")))
    // the scrub and the coverage report can never disagree
    val dropped = TextDedup.removeDupSpans(docs, "text", "doc_id", k = 5)
      .select($"doc_id", $"n_tokens_dropped")
    val reported = TextDedup.substringDupCoverage(docs, "text", "doc_id", k = 5)
      .select($"doc_id", $"dup_tokens")
    assert(dropped.join(reported, "doc_id")
      .filter($"n_tokens_dropped" =!= $"dup_tokens").count() === 0)
  }

  test("spanCorrupt: sentinels dense in order, corrupted+target reconstruct the doc") {
    val docs = (1 to 40).map(i => (i.toLong, (1 to 64).map(p => s"t$p").mkString(" ")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.spanCorrupt(docs, "text", "doc_id",
      blockSize = 16, spanLen = 3, corruptDen = 2, seed = 9L)
      .orderBy($"doc_id").collect()
    assert(r.forall(_.getLong(1) === 64L))
    // determinism
    val r2 = TextAnalysis.spanCorrupt(docs, "text", "doc_id",
      blockSize = 16, spanLen = 3, corruptDen = 2, seed = 9L)
      .orderBy($"doc_id").collect()
    assert(r.map(_.getString(4)).toSeq === r2.map(_.getString(4)).toSeq)
    assert(r.exists(_.getLong(2) > 0), "corruptDen=2 over 4 blocks must corrupt somewhere")
    r.foreach { row =>
      val nSpans = row.getLong(2); val nMasked = row.getLong(3)
      val corrupted = row.getString(4); val target = row.getString(5)
      // sentinel ids dense and in order in BOTH strings
      val sentRe = "<extra_id_(\\d+)>".r
      val inCorrupted = sentRe.findAllMatchIn(corrupted).map(_.group(1).toInt).toSeq
      val inTarget = sentRe.findAllMatchIn(target).map(_.group(1).toInt).toSeq
      assert(inCorrupted === (0 until nSpans.toInt))
      assert(inTarget === (0 until nSpans.toInt))
      // splice the target's spans back into the corrupted text at the
      // sentinels -> exactly the original document
      val spans = target.split("<extra_id_\\d+> ?").filter(_.nonEmpty).map(_.trim)
      assert(spans.length === nSpans.toInt)
      assert(spans.map(_.split(" ").length).sum === nMasked.toInt)
      var rebuilt = corrupted
      spans.zipWithIndex.foreach { case (s, k) =>
        rebuilt = rebuilt.replace(s"<extra_id_$k>", s)
      }
      assert(rebuilt === (1 to 64).map(p => s"t$p").mkString(" "))
    }
    // masked tokens never survive in the corrupted text, rate is plausible
    val totMasked = r.map(_.getLong(3)).sum.toDouble
    val totTokens = r.map(_.getLong(1)).sum.toDouble
    assert(totMasked / totTokens > 0.03 && totMasked / totTokens < 0.2,
      s"mask rate ${totMasked / totTokens}")
  }

  test("sortedNeighborhoodPairs: adjacent sorted near-matches pair; blocks bound the slide") {
    import graft.operators.TextDedup
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delte"),   // 1 edit from doc 1, same key prefix
      (3L, "alpha beta gamma zzzzzz"),  // nearby in sort, larger distance
      (4L, "zebra quail"),              // different block entirely
      (5L, "zebra quaik"))              // 1 edit from doc 4
      .toDF("doc_id", "text")
    val got = TextDedup.sortedNeighborhoodPairs(
      docs, "text", "doc_id",
      keyLen = 16, windowSize = 2, probeLen = 64,
      maxDistance = 2, blockLen = 4)
      .orderBy($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // (1,2) pairs at distance 1; (5,4) pairs at 1 in the zebra block
    // (id_a is the SORT-order predecessor — "zebraquaik" < "zebraquail");
    // (1,3)/(2,3) exceed maxDistance; no cross-block candidates exist
    assert(got.toSeq === Seq((1L, 2L, 1L), (5L, 4L, 1L)))
  }

  test("sortedNeighborhoodPairs: window width controls candidate reach") {
    import graft.operators.TextDedup
    val docs = Seq(
      (1L, "aaaa one"), (2L, "aaaa two"), (3L, "aaaa three"))
      .toDF("doc_id", "text")
    val w1 = TextDedup.sortedNeighborhoodPairs(
      docs, "text", "doc_id", windowSize = 1, maxDistance = 100)
      .count()
    val w2 = TextDedup.sortedNeighborhoodPairs(
      docs, "text", "doc_id", windowSize = 2, maxDistance = 100)
      .count()
    assert(w1 === 2L) // adjacent only
    assert(w2 === 3L) // plus the skip-one pair
  }

  test("trigramBackoffLogProb: seen trigram scores the MLE, unseen backs " +
    "off through bigram then the floor, each a factor of alpha") {
    import spark.implicits._
    // ref "a b c d": trigrams (a,b,c),(b,c,d); bigrams ab,bc,cd;
    // unigrams N=4, V=4
    val ref = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c"), // trigram seen: p = tc/bc = 1/1
      (2L, "x b c"), // unseen trigram, bigram (b,c) seen: p = 0.4 * 1/1
      (3L, "b c x") // all unseen: p = 0.4 * 0.4 * 1/(4+4)
    ).toDF("doc_id", "text")
    val out = TextAnalysis
      .trigramBackoffLogProb(docs, ref, "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("trigram_logprob")).toMap
    assert(math.abs(out(1L) - 0.0) < 1e-12)
    assert(math.abs(out(2L) - math.log(0.4)) < 1e-9)
    assert(math.abs(out(3L) - math.log(0.4 * 0.4 / 8.0)) < 1e-9)
  }

  test("bpeMerges: the most frequent weighted pair merges first and the " +
    "merged symbol participates in later rounds") {
    import spark.implicits._
    // "aab" x3, "ab" x2: round 1 pairs: (a,a):3, (a,b):5 -> merge "ab"
    // round 2: "a ab" x3 -> (a,ab):3 -> merge "aab"
    val df = Seq("aab ab aab", "aab ab").toDF("text")
    val out = TextAnalysis.bpeMerges(df, "text", 2).collect()
      .map(r => r.getInt(0) ->
        (r.getString(1), r.getString(2), r.getAs[Long]("pair_count")))
      .toMap
    assert(out(1) === (("a", "b", 5L)))
    assert(out(2) === (("a", "ab", 3L)))
  }

  test("bpeMerges: repeated-pair runs merge with plain-replace " +
    "(alternating) semantics and stop early when fully merged") {
    import spark.implicits._
    val df = Seq("aaaa").toDF("text")
    val out = TextAnalysis.bpeMerges(df, "text", 5).collect()
    // plain replace consumes the trailing space, so " a a a a " merges
    // only its FIRST pair per pass: (a,a) -> " aa a a ", (a,a) again
    // -> " aa aa ", then (aa,aa) -> " aaaa "; rounds 4-5 find no pairs
    assert(out.length === 3)
    assert(out(0).getString(1) === "a" && out(0).getString(2) === "a")
    assert(out(0).getAs[Long]("pair_count") === 3L)
    assert(out(1).getString(1) === "a" && out(1).getString(2) === "a")
    assert(out(2).getString(1) === "aa" && out(2).getString(2) === "aa")
  }

  test("bpeEncode: applies merges in rank order with the training's " +
    "non-overlapping replace semantics, word-locally") {
    import spark.implicits._
    // "aaaa" under [(a,a),(aa,a)]: " a a a a " -> " aa a a " -> " aaa a "
    // = 2 subwords; "ab" -> [a, b] = 2 (no merge applies); "a"/"b" -> 1
    val df = Seq((1L, "aaaa ab a"), (2L, "b AAAA"), (3L, null))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(df, "text", "doc_id",
      Seq(("a", "a"), ("aa", "a"))).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"))).toMap
    assert(out.keySet === Set(1L, 2L)) // null text drops
    assert(out(1L) === ((3L, 5L)))
    assert(out(2L) === ((2L, 3L))) // lowercased before encoding
  }

  test("bpeEncode: rejects merge tables beyond the inlining bound") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    val big = (1 to 65).map(i => (s"x$i", s"y$i"))
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bpeEncode(df, "text", "doc_id", big)
    }
    assert(e.getMessage.contains("64"))
  }

  test("bpeEncode agrees with the training-side rewrite: encoding the " +
    "training corpus reproduces bpeSymbolCounts' total symbol mass") {
    import spark.implicits._
    val df = Seq((1L, "aab ab aab"), (2L, "aab ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(df, "text", 2).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val encoded = TextAnalysis.bpeEncode(df, "text", "doc_id", merges)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens")).head.getLong(0)
    val symbolMass = TextAnalysis.bpeSymbolCounts(df, "text", 2, k = 100)
      .agg(org.apache.spark.sql.functions.sum("n_occurrences")).head.getLong(0)
    assert(encoded === symbolMass)
  }

  test("bpeEncodeIndexed: bit-identical to bpeEncode on the same merge " +
    "table, and takes tables past the 64-literal cap") {
    import spark.implicits._
    val df = Seq((1L, "aaaa ab a"), (2L, "b AAAA"), (3L, null),
      (4L, ""), (5L, "xyxy xyx")).toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("aa", "a"), ("x", "y"), ("xy", "xy"))
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"))).toMap
    val fast = rows(TextAnalysis.bpeEncode(df, "text", "doc_id", merges))
    val idx = rows(TextAnalysis.bpeEncodeIndexed(df, "text", "doc_id", merges))
    assert(idx === fast)
    // > 64 merges: the literal path rejects, the indexed path runs —
    // inert extra merges must not change the answer
    val big = merges ++ (1 to 70).map(i => (s"q$i", s"z$i"))
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeEncode(df, "text", "doc_id", big)
    }
    assert(rows(TextAnalysis.bpeEncodeIndexed(df, "text", "doc_id", big))
      === fast)
    // registry hygiene: the per-call temp function is dropped
    assert(spark.sessionState.functionRegistry.listFunction()
      .map(_.funcName).count(_.startsWith("graft_bpe_token_count_")) === 0)
  }

  test("bpePhraseEncode: merges adjacent words in rank order; phrase " +
    "extensions chain through the _ symbol") {
    import spark.implicits._
    // merges: (a,b) then (a_b,c): " a b c a b " -> " a_b c a_b "
    // -> " a_b_c a_b " = 2 symbols
    val df = Seq((1L, "a b c a b"), (2L, "c a"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.bpePhraseEncode(df, "text", "doc_id",
      Seq(("a", "b"), ("a_b", "c"))).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"))).toMap
    assert(out(1L) === ((5L, 2L)))
    assert(out(2L) === ((2L, 2L))) // no merge applies
    assert(out(3L) === ((1L, 1L))) // empty text: one empty token
  }

  test("phraseMergeTable: level-1 pairs rank before level-2 " +
    "extensions, counts weight repeats, truncation respects rank") {
    import spark.implicits._
    val df = Seq((1L, "a b a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val all = TextAnalysis.phraseMergeTable(df, "text", 100).collect()
      .map(r => (r.getAs[Long]("rank"), r.getString(1), r.getString(2),
        r.getAs[Long]("pair_count")))
    // level 1: (a,b) x3, (b,a) x1, (b,c) x2; level 2 after
    assert(all.take(3).toSeq === Seq((1L, "a", "b", 3L),
      (2L, "b", "c", 2L), (3L, "b", "a", 1L)))
    val lvl2 = all.drop(3)
    assert(lvl2.forall(_._2.contains("_")))
    assert(lvl2.map(t => (t._2, t._3)).toSet ===
      Set(("a_b", "a"), ("a_b", "c"), ("b_a", "b")))
    // (a_b, c) appears twice, ranks first within level 2
    assert(all(3) === ((4L, "a_b", "c", 2L)))
    val trunc = TextAnalysis.phraseMergeTable(df, "text", 2).collect()
    assert(trunc.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L))
  }

  test("trigramBackoffLogProb: docs shorter than 3 tokens emit no rows " +
    "and counts weight repeated trigrams") {
    import spark.implicits._
    val ref = Seq((100L, "a b c a b c")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b"), (2L, "a b c a b c")).toDF("doc_id", "text")
    val rows = TextAnalysis
      .trigramBackoffLogProb(docs, ref, "text", "doc_id").collect()
    assert(rows.map(_.getLong(0)).toSet === Set(2L))
    assert(rows.head.getAs[Long]("n_trigrams") === 4L)
  }

  test("winnowing: rightmost tie-break, density bound, short docs") {
    // All grams identical ("a a a"): every window's min is the same
    // hash, tie broken rightmost. 5 tokens, k=3 -> grams at pos 1..3;
    // w=2 windows [1,2],[2,3] select pos 2 and 3 — never pos 1.
    val df = Seq((1L, "a a a a a"), (2L, "x y"), (3L, "")).toDF("doc_id", "text")
    val fps = TextDedup.winnowFingerprints(df, "text", "doc_id", k = 3, w = 2)
      .collect()
    val d1 = fps.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getAs[Long]("pos")).sorted.toSeq === Seq(2L, 3L))
    assert(d1.map(_.getAs[Long]("fp")).distinct.length === 1)
    // doc 2 (< k tokens) and doc 3 (empty) yield no fingerprints
    assert(!fps.exists(r => r.getLong(0) == 2L || r.getLong(0) == 3L))
  }

  test("winnowing guarantee: a shared run >= w+k-1 shares a fingerprint") {
    val run = (1 to 10).map(i => s"shared$i").mkString(" ")
    val a = s"alpha beta gamma $run delta"
    val b = s"one two three four five $run six seven"
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val fps = TextDedup.winnowFingerprints(df, "text", "doc_id", k = 3, w = 4)
    val shared = fps.filter(col("doc_id") === 1L).select("fp")
      .intersect(fps.filter(col("doc_id") === 2L).select("fp"))
    assert(shared.count() >= 1)
    // density: selected distinct fingerprints <= window count
    val df1 = Seq((1L, (1 to 100).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val n = TextDedup.winnowFingerprints(df1, "text", "doc_id", k = 3, w = 4).count()
    assert(n >= 1 && n <= 95) // m = 98 grams, 95 windows
  }

  test("winnowing clamps at 16383 grams: a longer doc fingerprints its " +
    "prefix exactly, no position underflow into the hash bits") {
    // 16600 tokens, k=3 -> 16598 grams, clamped to 16383; the clamp
    // must make the long doc IDENTICAL to a doc holding exactly the
    // first 16383 grams (tokens 1..16385)
    val longDoc = (1 to 16600).map(i => s"w${i % 997}").mkString(" ")
    val prefDoc = (1 to 16385).map(i => s"w${i % 997}").mkString(" ")
    val df = Seq((1L, longDoc), (2L, prefDoc)).toDF("doc_id", "text")
    val fps = TextDedup.winnowFingerprints(df, "text", "doc_id", k = 3, w = 4)
      .collect()
    val d1 = fps.filter(_.getLong(0) == 1L)
      .map(r => (r.getAs[Long]("pos"), r.getAs[Long]("fp"))).toSet
    val d2 = fps.filter(_.getLong(0) == 2L)
      .map(r => (r.getAs[Long]("pos"), r.getAs[Long]("fp"))).toSet
    assert(d1 === d2)
    assert(d1.forall { case (p, f) => p >= 1L && p <= 16383L && f >= 0L })
  }

  test("textRankKeywords ranks the co-occurrence hub first") {
    val df = Seq((1L, "a b a c a d"), (2L, "a e b c")).toDF("doc_id", "text")
    val out = TextAnalysis.textRankKeywords(df, "doc_id", "text",
      window = 1, iters = 3, topN = 3).collect()
    assert(out.length === 3)
    // 'a' co-occurs with every other word; it must rank first
    val byScore = out.sortBy(-_.getAs[Double]("pagerank"))
    assert(byScore.head.getString(0) === "a")
    // scores are a probability-ish distribution: all positive
    out.foreach(r => assert(r.getAs[Double]("pagerank") > 0.0))
  }

  test("lineDedup keeps first occurrences and rebuilds in order") {
    val a = ((1 to 10) ++ (11 to 20)).map(i => s"t$i").mkString(" ") // lines L1 L2
    val b = ((11 to 20) ++ (21 to 30)).map(i => s"t$i").mkString(" ") // L2 (dup) L3
    val df = Seq((1L, a), (2L, b), (3L, a)).toDF("doc_id", "text")
    val out = TextDedup.lineDedup(df, "text", "doc_id", lineTokens = 10)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) === ((1L, 2L, 2L, a)))                     // all first
    assert(out(1) === ((2L, 2L, 1L,
      (21 to 30).map(i => s"t$i").mkString(" "))))           // L2 deduped away
    assert(out(2) === ((3L, 2L, 0L, "")))                    // full clone
  }

  test("winnowOverlapAgainst: arrivals hit their originals, corpus-side df-prune") {
    val mk = (seed: Int) => (seed * 100 to seed * 100 + 30).map(i => s"t$i").mkString(" ")
    val corpus = Seq((1L, mk(1)), (2L, mk(2)), (3L, mk(3))).toDF("doc_id", "text")
    val arrivals = Seq((101L, mk(1)), (105L, "totally unrelated words here now"))
      .toDF("doc_id", "text")
    val hits = TextDedup.winnowOverlapAgainst(corpus, arrivals, "text", "doc_id",
      k = 3, w = 4, minShared = 3, maxDf = 50).collect()
    assert(hits.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((101L, 1L)))
    // maxDf = 1 prunes every fingerprint shared by 2+ corpus docs; a
    // duplicated corpus doc's postings vanish and the arrival misses
    val dupCorpus = corpus.unionByName(
      Seq((4L, mk(1))).toDF("doc_id", "text"))
    val pruned = TextDedup.winnowOverlapAgainst(dupCorpus, arrivals, "text", "doc_id",
      k = 3, w = 4, minShared = 1, maxDf = 1).collect()
    assert(!pruned.exists(r => r.getLong(1) == 1L || r.getLong(1) == 4L))
  }

  test("winnow index: save+append ≡ save(all) (probe-time df-prune) " +
    "and the loaded probe equals the from-scratch join") {
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(); ()
    }
    val mk = (seed: Int) =>
      (seed * 100 to seed * 100 + 30).map(i => s"t$i").mkString(" ")
    val corpus = Seq((1L, mk(1)), (2L, mk(2)), (3L, mk(3)), (4L, mk(4)))
      .toDF("doc_id", "text")
    val arrivals = Seq((101L, mk(1)), (104L, mk(4)),
      (105L, "totally unrelated words here now")).toDF("doc_id", "text")
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_spec_winnow_index")
    rmrf(base)
    val pAppend = new java.io.File(base, "appended").getAbsolutePath
    val pWhole = new java.io.File(base, "whole").getAbsolutePath
    TextDedup.saveWinnowIndex(corpus.filter($"doc_id" <= 2),
      "text", "doc_id", pAppend, k = 3, w = 4)
    TextDedup.appendToWinnowIndex(corpus.filter($"doc_id" > 2),
      "text", "doc_id", pAppend, k = 3, w = 4)
    TextDedup.saveWinnowIndex(corpus, "text", "doc_id", pWhole,
      k = 3, w = 4)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val fromAppend = key(TextDedup.winnowOverlapAgainstIndex(
      TextDedup.loadWinnowIndex(spark, pAppend), arrivals,
      "text", "doc_id", k = 3, w = 4, minShared = 3, maxDf = 50))
    val fromWhole = key(TextDedup.winnowOverlapAgainstIndex(
      TextDedup.loadWinnowIndex(spark, pWhole), arrivals,
      "text", "doc_id", k = 3, w = 4, minShared = 3, maxDf = 50))
    val scratch = key(TextDedup.winnowOverlapAgainst(corpus, arrivals,
      "text", "doc_id", k = 3, w = 4, minShared = 3, maxDf = 50))
    assert(fromAppend === scratch)
    assert(fromWhole === scratch)
    assert(scratch.map(t => (t._1, t._2)) === Set((101L, 1L), (104L, 4L)))
  }

  test("simhash index: save+append ≡ save(all), and the loaded probe " +
    "finds the planted near-clone at its exact Hamming distance") {
    import graft.functions.TextFunctions
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(); ()
    }
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 20) "CHANGED" else s"w$i")
      .mkString(" ")
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val corpus = Seq((1L, base), (2L, other)).toDF("doc_id", "text")
    val incoming = Seq((101L, near), (102L, "totally fresh words here"))
      .toDF("doc_id", "text")
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_spec_simhash_index")
    rmrf(root)
    val pAppend = new java.io.File(root, "appended").getAbsolutePath
    val pWhole = new java.io.File(root, "whole").getAbsolutePath
    TextDedup.saveSimhashIndex(corpus.filter($"doc_id" === 1), "text",
      "doc_id", pAppend, hashFn = TextFunctions.md5Hash60, bits = 60)
    TextDedup.appendToSimhashIndex(corpus.filter($"doc_id" === 2),
      "text", "doc_id", pAppend, hashFn = TextFunctions.md5Hash60,
      bits = 60)
    TextDedup.saveSimhashIndex(corpus, "text", "doc_id", pWhole,
      hashFn = TextFunctions.md5Hash60, bits = 60)
    def probe(path: String) =
      TextDedup.simhashNearDupPairsAgainstIndex(
        TextDedup.loadSimhashIndex(spark, path), incoming,
        "text", "doc_id", maxHamming = 8,
        hashFn = TextFunctions.md5Hash60, bits = 60)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2))).toSet
    val a = probe(pAppend)
    assert(a === probe(pWhole))
    // one flipped token moves few signature bits: the pair must be
    // (corpus 1, incoming 101) and match the direct signature delta
    assert(a.map(t => (t._1, t._2)) === Set((1L, 101L)))
    val sigs = TextDedup.simhashSignatures(
      Seq((1L, base), (2L, near)).toDF("doc_id", "text"),
      "text", "doc_id", TextFunctions.md5Hash60, bits = 60)
      .orderBy("doc_id").collect().map(_.getLong(1))
    val expected = java.lang.Long.bitCount(sigs(0) ^ sigs(1)).toLong
    assert(a.head._3 === expected)
  }

  test("winnowOverlapPairs finds the planted quote, skips unrelated") {
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (1L, s"intro words here $quote closing words"),
      (2L, s"totally different preamble $quote and an ending"),
      (3L, (100 to 140).map(i => s"v$i").mkString(" "))).toDF("doc_id", "text")
    val pairs = TextDedup.winnowOverlapPairs(docs, "text", "doc_id",
      k = 3, w = 4, minShared = 2, maxDf = 50).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(pairs.head.getAs[Long]("shared_fps") >= 2L)
  }

  test("tokenizerFertility: hand-computed per-language ratios") {
    val df = Seq(
      ("en", "ab cd"), // 2 words, 2 bpeish tokens, 5 bytes
      ("en", "a1!"),   // 1 word, 3 bpeish tokens ([a][1][!]), 3 bytes
      ("de", ""))      // 0 words, 0 tokens -> null ratios
      .toDF("lang", "text")
    val r = TextAnalysis.tokenizerFertility(df, "lang", "text")
      .orderBy($"lang").collect()
    assert(r(0).getAs[String]("lang") === "de")
    assert(r(0).isNullAt(r(0).fieldIndex("fertility")))
    assert(r(1).getAs[Long]("n_words") === 3L)
    assert(r(1).getAs[Long]("n_tokens") === 5L)
    // ratios are rounded to 12 places by the operator
    assert(math.abs(r(1).getAs[Double]("fertility") - 5.0 / 3) < 1e-12)
    assert(math.abs(r(1).getAs[Double]("bytes_per_token") - 8.0 / 5) < 1e-12)
  }

  test("heapsLawFit: all-new-token corpus fits V = N exactly") {
    // every token is novel, so cumulative V == N at each doc:
    // ln V = 1 * ln N + 0 -> beta 1, K = e^0 = 1, r2 = 1
    val df = Seq((0L, "a b"), (1L, "c d e"), (2L, "f g h i"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.heapsLawFit(df, "doc_id", "text").head
    assert(r.getAs[Long]("n_docs") === 3L)
    assert(math.abs(r.getAs[Double]("heaps_beta") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("heaps_k") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-9)
  }

  test("heapsLawFit: two-level cumsum is bucket-width invariant") {
    val df = Seq((0L, "a b a"), (3L, "b c"), (7L, "c d d e"),
      (9L, "a e f"), (12L, "g"))
      .toDF("doc_id", "text")
    val narrow = TextAnalysis.heapsLawFit(df, "doc_id", "text",
      bucketWidth = 1L).head
    val wide = TextAnalysis.heapsLawFit(df, "doc_id", "text",
      bucketWidth = 1024L).head
    assert(narrow === wide)
    // repeated tokens must slow vocabulary growth: beta < 1
    assert(narrow.getAs[Double]("heaps_beta") < 1.0)
  }

  test("sequencePack: contiguous offsets, span flags, bucket invariance") {
    import spark.implicits._
    val counts = Seq((0L, 100L), (1L, 200L), (2L, 30L), (3L, 0L),
      (4L, 300L), (5L, 5L))
    val df = counts.toDF("id", "n")
    val seqLen = 128
    val got = TextAnalysis.sequencePack(df, "id", "n", seqLen)
      .collect().sortBy(_.getLong(0))
    // driver-side reference: plain running offsets
    var off = 0L
    counts.zip(got).foreach { case ((id, n), row) =>
      assert(row.getLong(0) === id)
      assert(row.getLong(1) === n)
      assert(row.getLong(2) === off, s"start of doc $id")
      val first = off / seqLen
      val last = if (n > 0) (off + n - 1) / seqLen else first
      assert(row.getLong(3) === first)
      assert(row.getLong(4) === last)
      assert(row.getLong(5) === off % seqLen)
      assert(row.getLong(6) === last - first + 1)
      assert(row.getBoolean(7) === (last - first + 1 > 1))
      off += n
    }
    // the fixture exercises both a crossing and a zero-token doc
    assert(got.count(_.getBoolean(7)) >= 2)
    assert(got.exists(r => r.getLong(1) == 0L && r.getLong(6) == 1L))
    // two-level cumsum is invariant to the bucket width
    val narrow = TextAnalysis.sequencePack(df, "id", "n", seqLen,
      bucketWidth = 2L).collect().map(_.toSeq).toSet
    assert(narrow === got.map(_.toSeq).toSet)
    intercept[IllegalArgumentException] {
      TextAnalysis.sequencePack(df, "id", "n", 0)
    }

    // incremental append == one-shot pack on the appended rows
    val manifest = TextAnalysis.sequencePack(
      df.filter($"id" < 3), "id", "n", seqLen)
    val appended = TextAnalysis.sequencePackAppend(
      manifest, df.filter($"id" >= 3), "id", "n", seqLen)
      .collect().sortBy(_.getLong(0))
    val oneShot = got.filter(_.getLong(0) >= 3L)
    appended.zip(oneShot).foreach { case (a, o) =>
      assert(a.toSeq.dropRight(1) === o.toSeq)
      assert(a.getBoolean(8)) // append_ok
    }
    // an id at or below the frozen max id is flagged, not silently packed
    val bad = TextAnalysis.sequencePackAppend(
      manifest, df.filter($"id" === 1L), "id", "n", seqLen).collect()
    assert(bad.length === 1 && !bad.head.getBoolean(8))
    // appending to an EMPTY manifest starts at offset 0, all ok
    val fresh = TextAnalysis.sequencePackAppend(
      manifest.filter(lit(false)), df, "id", "n", seqLen)
      .collect().sortBy(_.getLong(0))
    fresh.zip(got).foreach { case (a, o) =>
      assert(a.toSeq.dropRight(1) === o.toSeq)
      assert(a.getBoolean(8))
    }
  }

  test("unigramSegment: matches a driver-side Viterbi reference") {
    import spark.implicits._
    val docs = Seq(
      "foobar foo bar foobar baz",
      "foo bar bar qux foobarbaz",
      "foo foobar zap").toDF("text")
    val maxPiece = 4; val vocabSize = 12; val unk = -20.0

    // driver-side reference of the whole operator
    val words = docs.collect().flatMap(_.getString(0).trim.toLowerCase
      .split("\\s+")).filter(w => w.nonEmpty && w.length <= 16)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pieceCnt = words.toSeq.flatMap { case (w, c) =>
      for (e <- 1 to w.length; j <- 1 to math.min(maxPiece, e))
        yield (w.substring(e - j, e), c)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val vocab = pieceCnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(vocabSize)
    val tot = vocab.map(_._2).sum.toDouble
    val lp = vocab.map { case (p, c) =>
      p -> BigDecimal(math.log(c / tot))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble }.toMap
    def viterbi(w: String): (Double, Int) = {
      val best = Array.fill(w.length + 1)((0.0, 0))
      for (e <- 1 to w.length) {
        val cands = for {
          j <- 1 to math.min(maxPiece, e)
          p = w.substring(e - j, e)
          l = lp.get(p).orElse(if (j == 1) Some(unk) else None)
          if l.isDefined
        } yield (best(e - j)._1 + l.get, best(e - j)._2 + 1)
        best(e) = cands.maxBy { case (b, np) => (b, -np) }
      }
      best(w.length)
    }

    val got = TextAnalysis.unigramSegment(docs, "text",
      maxPieceLen = maxPiece, vocabSize = vocabSize, unkLp = unk)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getInt(3))).toMap
    assert(got.keySet === words.keySet)
    words.foreach { case (w, c) =>
      val (gc, gb, gn) = got(w)
      val (wb, wn) = viterbi(w)
      assert(gc === c, s"count of $w")
      assert(math.abs(gb - wb) < 1e-9, s"best_lp of $w: $gb vs $wb")
      assert(gn === wn, s"n_pieces of $w: $gn vs $wn")
    }
    // frequent whole words segment as one piece; compounds decompose
    assert(got("foo")._3 === 1)
    assert(got("foobar")._3 <= 2)
    // unseen-char fallback keeps the DP total (zap has rare chars but
    // all single chars of the corpus are in-vocab or fall back)
    assert(got.contains("zap"))
  }

  test("unigramHardEmRound: path re-count matches a driver-side reference") {
    import spark.implicits._
    val docs = Seq(
      "foobar foo bar foobar baz",
      "foo bar bar qux foobarbaz",
      "foo foobar zap").toDF("text")
    val maxPiece = 4; val vocabSize = 12; val unk = -20.0

    // driver reference: vocab as in the segment spec, then
    // path-carrying Viterbi with the (best, -np, path) struct-max
    // tie-break, then frequency-weighted piece re-count
    val words = docs.collect().flatMap(_.getString(0).trim.toLowerCase
      .split("\\s+")).filter(w => w.nonEmpty && w.length <= 16)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pieceCnt = words.toSeq.flatMap { case (w, c) =>
      for (e <- 1 to w.length; j <- 1 to math.min(maxPiece, e))
        yield (w.substring(e - j, e), c)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val vocab = pieceCnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(vocabSize)
    val tot = vocab.map(_._2).sum.toDouble
    val lp = vocab.map { case (p, c) =>
      p -> BigDecimal(math.log(c / tot))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble }.toMap
    def path(w: String): Seq[String] = {
      val best = Array.fill(w.length + 1)((0.0, 0, ""))
      for (e <- 1 to w.length) {
        val cands = for {
          j <- 1 to math.min(maxPiece, e)
          p = w.substring(e - j, e)
          l = lp.get(p).orElse(if (j == 1) Some(unk) else None)
          if l.isDefined
          prev = best(e - j)
        } yield (prev._1 + l.get, prev._2 - 1, prev._3 + " " + p)
        best(e) = cands.max
      }
      best(w.length)._3.trim.split(" ").toSeq
    }
    val want = words.toSeq.flatMap { case (w, c) => path(w).map(_ -> c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val wtot = want.values.sum.toDouble

    val got = TextAnalysis.unigramHardEmRound(docs, "text",
      maxPieceLen = maxPiece, vocabSize = vocabSize, unkLp = unk)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (p, c) =>
      assert(got(p)._1 === c, s"cnt of piece $p")
      val wantLp = BigDecimal(math.log(c / wtot))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(p)._2 - wantLp) < 1e-9, s"lp of piece $p")
    }
    // hard-EM concentrates mass: whole frequent words survive as pieces
    assert(got.contains("foo"))
    // and the re-counted mass equals total path tokens (sanity)
    assert(got.values.map(_._1).sum === wtot.toLong)
  }

  test("unigramEmTrain: two pruned rounds match a driver-side reference") {
    import spark.implicits._
    val docs = Seq(
      "foobar foo bar foobar baz",
      "foo bar bar qux foobarbaz",
      "foo foobar zap").toDF("text")
    val maxPiece = 4; val vs = 8; val unk = -20.0; val rounds = 2

    val words = docs.collect().flatMap(_.getString(0).trim.toLowerCase
      .split("\\s+")).filter(w => w.nonEmpty && w.length <= 16)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    def subCnt = words.toSeq.flatMap { case (w, c) =>
      for (e <- 1 to w.length; j <- 1 to math.min(maxPiece, e))
        yield (w.substring(e - j, e), c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def renorm(cnt: Map[String, Long]): Map[String, Double] = {
      val kept = cnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(vs)
      val tot = kept.map(_._2).sum.toDouble
      kept.map { case (p, c) => p -> BigDecimal(math.log(c / tot))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble }.toMap
    }
    def emStep(lp: Map[String, Double]): Map[String, Long] = {
      def path(w: String): Seq[String] = {
        val best = Array.fill(w.length + 1)((0.0, 0, ""))
        for (e <- 1 to w.length) {
          val cands = for {
            j <- 1 to math.min(maxPiece, e)
            p = w.substring(e - j, e)
            l = lp.get(p).orElse(if (j == 1) Some(unk) else None)
            if l.isDefined
            prev = best(e - j)
          } yield (prev._1 + l.get, prev._2 - 1, prev._3 + " " + p)
          best(e) = cands.max
        }
        best(w.length)._3.trim.split(" ").toSeq
      }
      words.toSeq.flatMap { case (w, c) => path(w).map(_ -> c) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }
    var lp = renorm(subCnt)
    var cnt = Map.empty[String, Long]
    (1 to rounds).foreach { _ =>
      cnt = emStep(lp)
      lp = renorm(cnt)
    }
    val wantKept = cnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(vs).toMap

    val got = TextAnalysis.unigramEmTrain(docs, "text",
      rounds = rounds, maxPieceLen = maxPiece, vocabSize = vs, unkLp = unk)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got.keySet === wantKept.keySet)
    wantKept.foreach { case (p, c) =>
      assert(got(p)._1 === c, s"cnt of $p")
      assert(math.abs(got(p)._2 - lp(p)) < 1e-9, s"lp of $p")
    }
    // pruning bites: the seed substring space exceeds the kept vocab
    assert(subCnt.size > vs && got.size <= vs)
  }

  test("lshPlan: S-curve masses match a direct replay; more rows per " +
    "band trades FP for FN") {
    import graft.operators.TextDedup
    val rows = TextDedup.lshPlan(spark, numHashes = 16,
      targetJaccard = 0.5, grid = 64)
      .orderBy(col("rows_per_band")).collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSeq ===
      Seq((16, 1), (8, 2), (4, 4), (2, 8), (1, 16)))
    // direct replay of the (b=4, r=4) masses with plain doubles
    def f12(x: Double) = math.floor(x * 1e12) / 1e12
    val (fpExp, fnExp) = {
      var fp = BigDecimal(0); var fn = BigDecimal(0)
      for (i <- 1 until 64) {
        val s = i / 64.0
        val s4 = { val s2 = s * s; s2 * s2 }
        val q = 1.0 - s4
        val miss = { val q2 = q * q; q2 * q2 }
        if (i <= 32) fp += BigDecimal(f12(1.0 - miss))
        else fn += BigDecimal(f12(miss))
      }
      (math.floor(fp.toDouble / 64.0 * 1e9) / 1e9,
        math.floor(fn.toDouble / 64.0 * 1e9) / 1e9)
    }
    val r44 = rows.find(_.getInt(1) == 4).get
    assert(r44.getDouble(3) === fpExp)
    assert(r44.getDouble(4) === fnExp)
    // the knee: r=1 is FP-heavy, r=16 is FN-heavy, monotone trade
    val fps = rows.map(_.getDouble(3)).toSeq
    val fns = rows.map(_.getDouble(4)).toSeq
    assert(fps === fps.sorted.reverse)
    assert(fns === fns.sorted)
    // threshold (1/b)^(1/r) is monotone increasing in r
    val ths = rows.map(_.getDouble(2)).toSeq
    assert(ths === ths.sorted && ths.last === 1.0)
  }
}

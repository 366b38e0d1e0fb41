package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

import graft.functions.QuantizedDotExpr
import graft.operators.TextDedup

/** Seeded fuzz coverage for the scalar kernels and operator invariants
  * — deterministic (fixed seeds), so failures reproduce exactly.
  */
class FuzzSpec extends SparkSpec {
  import spark.implicits._

  test("QuantizedDotExpr.dot matches the reference fold on 1000 random arrays") {
    val rnd = new scala.util.Random(42)
    (1 to 1000).foreach { _ =>
      val a = Array.fill(rnd.nextInt(130))(rnd.nextInt(257) - 128L)
      val b = Array.fill(rnd.nextInt(130))(rnd.nextInt(257) - 128L)
      val expected = a.zip(b).map { case (x, y) => x * y }.sum
      val got = QuantizedDotExpr.dot(new GenericArrayData(a), new GenericArrayData(b))
      assert(got === expected)
    }
  }

  test("mixture quota arithmetic never oversubscribes a domain (10k random cases)") {
    // the plan computes N = min_d floor(c_d / w_d), quota_d = floor(w_d * N)
    // in double arithmetic; the no-upsampling contract is quota_d <= c_d
    val rnd = new scala.util.Random(7)
    (1 to 10000).foreach { _ =>
      val k = 1 + rnd.nextInt(6)
      val counts = Array.fill(k)(1L + rnd.nextInt(1000000))
      val weights = Array.fill(k)(rnd.nextDouble() * 0.99 + 0.01)
      val n = counts.zip(weights).map { case (c, w) =>
        math.floor(c / w) }.min.toLong
      counts.zip(weights).foreach { case (c, w) =>
        assert(math.floor(w * n).toLong <= c,
          s"quota overshoot: c=$c w=$w N=$n") }
    }
  }

  test("substringDupCoverage invariants on random small corpora") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val docs = (1L to 30L).map { i =>
      val words = Seq.fill(3 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
      (i, words.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val k = 4
    val r = TextDedup.substringDupCoverage(df, "text", "doc_id", k).collect()
    assert(r.length === 30)
    r.foreach { row =>
      val n = row.getAs[Long]("n_tokens")
      val spans = row.getAs[Long]("dup_span_count")
      val cov = row.getAs[Long]("dup_tokens")
      assert(cov >= 0 && cov <= n, s"coverage outside [0, n]: $row")
      // every island covers at least k tokens and islands are disjoint
      assert(spans == 0 || cov >= k * spans, s"island shorter than k: $row")
      val frac = row.getAs[Double]("dup_token_frac")
      assert(frac >= 0.0 && frac <= 1.0)
    }
    // a verbatim clone makes BOTH copies fully covered
    val withClone = df.unionByName(
      df.filter($"doc_id" === 1L).select(lit(1000L).as("doc_id"), $"text"))
    val cloned = TextDedup.substringDupCoverage(withClone, "text", "doc_id", k)
      .filter($"doc_id".isin(1L, 1000L)).collect()
    cloned.foreach { row =>
      val n = row.getAs[Long]("n_tokens")
      if (n >= k)
        assert(row.getAs[Long]("dup_tokens") === n,
          s"clone not fully covered: $row")
    }
  }

  test("asOfJoin all directions match a driver-side reference on random data") {
    val rnd = new scala.util.Random(23)
    val marks = (0 until 12).map(i => (rnd.nextInt(200).toLong, s"m$i"))
      .distinct.groupBy(_._1).map(_._2.head).toSeq // unique mark keys
    val probes = (1L to 60L).map(i => (i, rnd.nextInt(220).toLong))
    val mdf = marks.toDF("lb", "name")
    val pdf = probes.toDF("id", "v")
    def reference(dir: String, tol: Option[Long]): Map[Long, Option[String]] =
      probes.map { case (id, v) =>
        val cands = marks.filter { case (lb, _) =>
          (dir match {
            case "backward" => lb <= v
            case "forward"  => lb >= v
            case "nearest"  => true
          }) && tol.forall(t => math.abs(v - lb) <= t)
        }
        val best = dir match {
          case "backward" => cands.sortBy(-_._1).headOption
          case "forward"  => cands.sortBy(_._1).headOption
          case "nearest"  => cands.sortBy(c =>
            (math.abs(v - c._1), if (c._1 <= v) 0L else 1L)).headOption
        }
        id -> best.map(_._2)
      }.toMap
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(None, Some(15L))) {
      val got = graft.operators.RangeJoin
        .asOfJoin(pdf, mdf, "v", "lb", "id", dir, tol)
        .select($"id", $"name").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got === reference(dir, tol), s"dir=$dir tol=$tol")
    }
  }

  test("saltedJoin row multiset equals the plain join on random skewed data") {
    val rnd = new scala.util.Random(31)
    // zipf-ish: key 0 is hot
    val facts = (1L to 300L).map(i =>
      (i, if (rnd.nextInt(10) < 6) 0L else rnd.nextInt(20).toLong))
    val dim = (0L to 14L).flatMap(k => // duplicate dim keys: multiplicity matters
      Seq.fill(1 + (k % 3).toInt)((k, s"d$k-${rnd.nextInt(100)}")))
    val fdf = facts.toDF("id", "k")
    val ddf = dim.toDF("k", "payload")
    for (jt <- Seq("inner", "left")) {
      val plain = fdf.join(ddf, Seq("k"), jt).select($"id", $"payload")
      val salted = graft.operators.SkewJoin
        .saltedJoin(fdf, ddf, Seq("k"), $"id", salts = 7, joinType = jt)
        .select($"id", $"payload")
      assert(plain.exceptAll(salted).count() === 0 &&
        salted.exceptAll(plain).count() === 0, s"joinType=$jt")
    }
  }

  test("semanticDedup matches a driver-side union-find reference on random vectors") {
    val rnd = new scala.util.Random(23)
    val dim = 4
    val vecs = (1L to 60L).map(i =>
      i -> Array.fill(dim)(rnd.nextGaussian().toFloat)).toMap
    val cents = Seq(0, 1, 2).map(c => c -> vecs(c + 1L))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    // reference: argmax-cell assignment, union-find over within-cell
    // pairs >= t, keep max centroid-cosine (ties: min id)
    val t = 0.5
    val cell = vecs.map { case (id, v) =>
      id -> cents.maxBy { case (c, cv) => (cos(v, cv), -c) }._1 }
    val parent = scala.collection.mutable.Map(vecs.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for (a <- vecs.keys; b <- vecs.keys
         if a < b && cell(a) == cell(b) && cos(vecs(a), vecs(b)) >= t) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val refCluster = vecs.keys.map(k => k -> find(k)).toMap
    val refKept = refCluster.groupBy(_._2).map { case (_, members) =>
      members.keys.maxBy(id => (cos(vecs(id), cents(cell(id))._2), -id))
    }.toSet
    val df = vecs.toSeq.sortBy(_._1).toDF("vec_id", "embedding")
    val cdf = cents.toDF("cell", "cvec")
    val got = graft.operators.Similarity.semanticDedup(
      df, "vec_id", "embedding", cdf, threshold = t, dim = dim)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(4)))
    got.foreach { case (id, c, cl, kept) =>
      assert(c === cell(id), s"cell mismatch for $id")
      assert(cl === refCluster(id), s"cluster mismatch for $id")
      assert(kept === refKept.contains(id), s"kept mismatch for $id")
    }
    assert(got.length === vecs.size)
  }

  test("importanceResample membership is invariant under repartitioning") {
    val rnd = new scala.util.Random(31)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val docs = (1L to 200L).map { i =>
      val words = (1 to 5 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.size)))
      (i, words.mkString(" "), if (i % 3 == 0) "t" else "r")
    }.toDF("doc_id", "text", "src")
    val target = docs.filter($"src" === "t")
    def run(raw: org.apache.spark.sql.DataFrame) =
      graft.operators.Mixture.importanceResample(
        raw, target, "text", "doc_id", n = 50, numBuckets = 128, seed = 9L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val base = run(docs)
    assert(base.size === 50)
    assert(run(docs.repartition(7)) === base)
    assert(run(docs.repartition(1)) === base)
  }

  test("sequencePack offsets equal the reference cumsum on random sparse ids") {
    val rnd = new scala.util.Random(17)
    (1 to 5).foreach { _ =>
      // sparse non-contiguous ids, zero-count docs mixed in
      val rows = (1 to 40).scanLeft(0L)((acc, _) => acc + 1 + rnd.nextInt(97))
        .map(id => (id, rnd.nextInt(4) match {
          case 0 => 0L; case _ => rnd.nextInt(500).toLong }))
      val seqLen = 1 + rnd.nextInt(300)
      val bw = 1L + rnd.nextInt(64)
      val got = graft.operators.TextAnalysis.sequencePack(
        rows.toDF("id", "n"), "id", "n", seqLen, bucketWidth = bw)
        .collect().sortBy(_.getLong(0))
      var off = 0L
      rows.sortBy(_._1).zip(got).foreach { case ((id, n), r) =>
        assert(r.getLong(0) === id && r.getLong(2) === off,
          s"seqLen=$seqLen bw=$bw doc $id")
        val first = off / seqLen
        val last = if (n > 0) (off + n - 1) / seqLen else first
        assert(r.getLong(3) === first && r.getLong(4) === last)
        off += n
      }
    }
  }

  test("hyperAnf curve tracks exact ball sums on random graphs") {
    val rnd = new scala.util.Random(23)
    (1 to 4).foreach { _ =>
      val n = 6 + rnd.nextInt(6)
      val ids = (1L to n.toLong)
      val und = (for {
        a <- ids; b <- ids if a < b && rnd.nextInt(4) == 0
      } yield Seq((a, b), (b, a))).flatten
      val edges = if (und.isEmpty) Seq((1L, 2L), (2L, 1L)) else und
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      def ball(v: Long, t: Int): Set[Long] = {
        var s = Set(v)
        (1 to t).foreach { _ =>
          s = s ++ s.flatMap(u => adj.getOrElse(u, Set.empty)) }
        s
      }
      val got = graft.operators.Graphs.hyperAnf(
        ids.toDF("id"), "id", edges.toDF("s", "d"), "s", "d", maxT = 3)
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      (0 to 3).foreach { t =>
        val exact = ids.map(v => ball(v, t).size).sum.toDouble
        assert(math.abs(got(t) - exact) / exact < 0.25,
          s"n=$n t=$t: est ${got(t)} vs exact $exact")
      }
      // monotone non-decreasing curve
      (1 to 3).foreach(t => assert(got(t) >= got(t - 1)))
    }
  }

  test("knnShapley matches brute-force enumeration on random instances") {
    val rnd = new scala.util.Random(29)
    def fact(n: Int): Double = (1 to n).map(_.toDouble).product
    (1 to 4).foreach { _ =>
      val nTrain = 4 + rnd.nextInt(3)
      val k = 1 + rnd.nextInt(3)
      val train = (1L to nTrain.toLong).map(i =>
        (i, Array(rnd.nextFloat() * 10, rnd.nextFloat() * 10), rnd.nextInt(2)))
      val test = (1 to 2).map(i =>
        (100L + i, Array(rnd.nextFloat() * 10, rnd.nextFloat() * 10), rnd.nextInt(2)))
      def sq(a: Array[Float], b: Array[Float]) = a.zip(b).map {
        case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
      def brute(id: Long): Double = test.map { case (_, tv, ty) =>
        def util(s: Set[Long]): Double =
          if (s.isEmpty) 0.0
          else train.filter(t => s.contains(t._1))
            .sortBy(t => (sq(t._2, tv), t._1)).take(k)
            .count(_._3 == ty).toDouble / k
        val others = train.map(_._1).filterNot(_ == id).toSet
        others.subsets().map(s => fact(s.size) * fact(nTrain - 1 - s.size)
          / fact(nTrain) * (util(s + id) - util(s))).sum
      }.sum / test.size
      val got = graft.operators.Valuation.knnShapley(
        train.toDF("id", "v", "y"), test.toDF("id", "v", "y"),
        "id", "v", "y", k)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      train.foreach { case (id, _, _) =>
        assert(math.abs(got(id) - brute(id)) < 1e-9,
          s"nTrain=$nTrain k=$k id=$id: ${got(id)} vs ${brute(id)}")
      }
    }
  }

  test("unigramSegment matches the driver Viterbi on random corpora") {
    val rnd = new scala.util.Random(37)
    val alphabet = "abcd"
    (1 to 3).foreach { _ =>
      val docs = (1 to 6).map(_ => (1 to 3 + rnd.nextInt(6)).map(_ =>
        (1 to 1 + rnd.nextInt(8)).map(_ =>
          alphabet(rnd.nextInt(alphabet.length))).mkString)
        .mkString(" ")).toDF("text")
      val vs = 6 + rnd.nextInt(10)
      val words = docs.collect().flatMap(_.getString(0).split("\\s+"))
        .filter(_.nonEmpty).groupBy(identity).view.mapValues(_.length.toLong).toMap
      val pieceCnt = words.toSeq.flatMap { case (w, c) =>
        for (e <- 1 to w.length; j <- 1 to math.min(4, e))
          yield (w.substring(e - j, e), c) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val vocab = pieceCnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(vs)
      val tot = vocab.map(_._2).sum.toDouble
      val lp = vocab.map { case (p, c) => p -> BigDecimal(math.log(c / tot))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble }.toMap
      def vit(w: String): (Double, Int) = {
        val best = Array.fill(w.length + 1)((0.0, 0))
        for (e <- 1 to w.length) {
          val cands = for {
            j <- 1 to math.min(4, e)
            l = lp.get(w.substring(e - j, e))
              .orElse(if (j == 1) Some(-20.0) else None)
            if l.isDefined
          } yield (best(e - j)._1 + l.get, best(e - j)._2 + 1)
          best(e) = cands.maxBy { case (b, np) => (b, -np) }
        }
        best(w.length)
      }
      val got = graft.operators.TextAnalysis.unigramSegment(
        docs, "text", vocabSize = vs)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(2), r.getInt(3))).toMap
      words.keys.foreach { w =>
        val (wb, wn) = vit(w)
        assert(math.abs(got(w)._1 - wb) < 1e-9, s"vs=$vs best_lp of $w")
        assert(got(w)._2 === wn, s"vs=$vs n_pieces of $w")
      }
    }
  }
}

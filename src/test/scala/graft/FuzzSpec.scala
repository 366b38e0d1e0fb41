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
}

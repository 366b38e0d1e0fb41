package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) matching — the record-linkage/data-cleaning
  * join, with PassJoin-style pigeonhole blocking (Li et al., ICDE'11):
  * split every string into k+1 contiguous segments; at most k edits
  * cannot touch all k+1 segments, so for any pair within distance k the
  * probe string contains at least one of the source's segments EXACTLY,
  * start-shifted by at most k. Candidates therefore come from an
  * equi-join on (segment index, source length, segment content) —
  * shuffle O(n · k²) index entries, never an all-pairs scan — and the
  * O(|a|·|b|) levenshtein DP runs only on candidates.
  *
  * (A first cut used length-band blocking + a char-histogram L1
  * prefilter; the bands collapse on length-clustered corpora — O(n²)
  * candidates — and 28 per-side histogram columns sent Catalyst's
  * optimizer into minutes of planning. Segment blocking keeps both the
  * plan and the candidate stream small.)
  */
object FuzzyJoin {

  /** Self-join: pairs (id_a, id_b, dist) with
    * levenshtein(strCol_a, strCol_b) <= maxDist, id_a < id_b.
    */
  def levenshteinSelfJoin(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val k = maxDist
    val m = k + 1 // segments per string
    val s = col("__s")
    val len = col("__len")
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .withColumn("__len", length(s))

    // deterministic split of length l into m segments: the last (l % m)
    // segments are one longer; 1-based start of segment i and its
    // length — all-column arithmetic so the (i, dl, d) enumeration can
    // ride a tiny broadcast table instead of a giant struct array
    // (75-struct expression trees cost real codegen/planning time)
    def segStart(i: Column, l: Column): Column =
      lit(1) + i * floor(l / m).cast("int") +
        greatest(lit(0), i - (lit(m) - pmod(l, lit(m)).cast("int")))
    def segLen(i: Column, l: Column): Column =
      floor(l / m).cast("int") +
        when(i >= lit(m) - pmod(l, lit(m)).cast("int"), 1).otherwise(0)

    val spark = df.sparkSession
    val segIdx = broadcast(
      spark.createDataFrame((0 until m).map(Tuple1(_))).toDF("__i"))
    // index side: each string's own m segments, keyed by (i, own length)
    val index = base.crossJoin(segIdx)
      .select(col("__id").as("id_a"), col("__i"), len.as("__l"),
        substring(s, segStart(col("__i"), len), segLen(col("__i"), len))
          .as("__sub"))
      .filter(length(col("__sub")) > 0)

    // probe side: for every plausible source length l in [len-k, len+k]
    // and every start shift d in [-k, k], the substring the source's
    // segment i would occupy
    val offsets = broadcast(spark.createDataFrame(
      for { i <- 0 until m; dl <- -k to k; d <- -k to k }
        yield (i, dl, d)).toDF("__i", "__dl", "__d"))
    val probeL = len + col("__dl")
    val probeStart = segStart(col("__i"), probeL) + col("__d")
    val probe = base.crossJoin(offsets)
      .filter(probeL >= m && probeStart >= 1 &&
        segLen(col("__i"), probeL) > 0)
      .select(col("__id").as("id_b"), col("__i"), probeL.as("__l"),
        substring(s, probeStart, segLen(col("__i"), probeL)).as("__sub"))
      .filter(length(col("__sub")) > 0)

    val segCands = index.join(probe, Seq("__i", "__l", "__sub"))
      .select(col("id_a"), col("id_b"))

    // strings shorter than m have empty segments the pigeonhole can't
    // use; they can only pair with strings of length <= 2k, so the
    // side-channel is a bounded join among near-empty strings
    val tinyA = base.filter(len < m).select(col("__id").as("id_a"))
    val tinyPartners = base.filter(len <= lit(2 * k)).select(col("__id").as("id_b"))
    val tinyCands = tinyA.crossJoin(tinyPartners)
      .unionByName(tinyPartners.select(col("id_b").as("id_a"))
        .crossJoin(tinyA.select(col("id_a").as("id_b"))))

    val strs = base.select(col("__id"), col("__s"), col("__len"))
    segCands.unionByName(tinyCands)
      .filter(col("id_a") < col("id_b"))
      .distinct()
      .join(strs.select(col("__id").as("id_a"), col("__s").as("__sa"),
        col("__len").as("__la")), Seq("id_a"))
      .join(strs.select(col("__id").as("id_b"), col("__s").as("__sb"),
        col("__len").as("__lb")), Seq("id_b"))
      .filter(abs(col("__la") - col("__lb")) <= k)
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")).cast("long"))
      .filter(col("dist") <= k)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Blocked Jaro–Winkler linkage: candidate pairs come from an
    * equi-join on `blockCol` (id_a < id_b within a block), scored with
    * the codegen'd [[graft.functions.JaroWinklerExpr]] and kept at
    * `threshold` or above. Output: (blockCol, id_a, id_b, name_a,
    * name_b, jw).
    *
    * Blocking is the record-linkage scale contract: pair volume is
    * sum over blocks of |block|², so the CALLER picks a key whose
    * blocks are bounded (brand, zip, soundex, first-k chars) — the
    * operator is deliberately not defensively salted, because a block
    * too large to pair is a modeling error (the pairs ARE the output),
    * not a physical-plan accident.
    */
  def jaroWinklerBlocked(
      df: DataFrame,
      idCol: String,
      strCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {
    require(threshold >= 0.0 && threshold <= 1.0,
      s"threshold must be in [0,1], got $threshold")
    val spark = df.sparkSession
    val base = df.select(col(blockCol).as("__blk"),
      col(idCol).as("__id"), col(strCol).as("__s"))
    val a = base.select(col("__blk"), col("__id").as("id_a"),
      col("__s").as("name_a"))
    val b = base.select(col("__blk"), col("__id").as("id_b"),
      col("__s").as("name_b"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jw", graft.functions.JaroWinklerExpr
        .jaroWinkler(spark, col("name_a"), col("name_b")))
      .filter(col("jw") >= threshold)
      .select(col("__blk").as(blockCol), col("id_a"), col("id_b"),
        col("name_a"), col("name_b"), col("jw"))
  }

  /** Fellegi–Sunter record-linkage weights (Fellegi & Sunter 1969):
    * for every blocked candidate pair, the log₂-likelihood-ratio match
    * weight `Σ_f agree_f ? log₂(m_f/u_f) : log₂((1−m_f)/(1−u_f))`,
    * where each field's u-probability (chance agreement between two
    * RANDOM records) is estimated from the field's global value
    * distribution as `Σ_v (n_v/N)²` and the m-probability (agreement
    * given a true match) is a caller-supplied parameter. Output is the
    * weight table: one row per agreement pattern with its pair count
    * and weight — the thing a linkage deployment thresholds on, and at
    * most 2^|fields| rows regardless of corpus size.
    *
    * Scale contract: candidate generation is an equi-join on
    * `blockCol`, so pair count is Σ_b |b|² over block sizes — the
    * caller owns picking a selective blocking key (the standard FS
    * deployment shape); this operator never goes all-pairs across
    * blocks. u-probabilities are exact: Σ n_v² accumulates in
    * DECIMAL(38,0) (no long overflow at any corpus size), and the two
    * divisions by N run left-to-right in double, replayable in any
    * engine. Weights round at 6 — the group key survives a 1-ulp
    * cross-engine log₂ tail.
    */
  def fellegiSunterWeights(
      df: DataFrame,
      idCol: String,
      blockCol: String,
      fields: Seq[(String, Double)]): DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    require(fields.forall { case (_, m) => m > 0.0 && m < 1.0 },
      "m-probabilities must be in (0,1)")
    val base = df.select((col(idCol).as("__id") +: col(blockCol).as("__blk")
      +: fields.map { case (f, _) => col(f).as(s"__$f") }): _*)
    // one-row u-probability frame per field, all cross-broadcast
    val uFrames = fields.map { case (f, _) =>
      base.groupBy(col(s"__$f")).agg(count(lit(1)).as("__n"))
        .agg(
          (sum(col("__n").cast("decimal(38,0)") * col("__n")).cast("double")
            / sum(col("__n")).cast("double")
            / sum(col("__n")).cast("double")).as(s"__u_$f"))
    }
    val a = base.select((col("__blk") +: col("__id").as("__ida")
      +: fields.map { case (f, _) => col(s"__$f").as(s"__a_$f") }): _*)
    val b = base.select((col("__blk") +: col("__id").as("__idb")
      +: fields.map { case (f, _) => col(s"__$f").as(s"__b_$f") }): _*)
    val agreeCols = fields.map { case (f, _) =>
      (col(s"__a_$f") === col(s"__b_$f")).as(s"agree_$f")
    }
    val pairs = a.join(b, Seq("__blk"))
      .filter(col("__ida") < col("__idb"))
      .groupBy(agreeCols: _*)
      .agg(count(lit(1)).as("n_pairs"))
    val withU = uFrames.foldLeft(pairs)((acc, u) => acc.crossJoin(broadcast(u)))
    val weight = fields.map { case (f, m) =>
      when(col(s"agree_$f"),
        log2(lit(m) / col(s"__u_$f")))
        .otherwise(log2((lit(1.0) - lit(m)) / (lit(1.0) - col(s"__u_$f"))))
    }.reduce(_ + _)
    withU.select((fields.map { case (f, _) => col(s"agree_$f") }
      :+ col("n_pairs") :+ round(weight, 6).as("weight")): _*)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Materialize

/** Vertex-centrality over an edge list — the ranking companion to
  * [[Components.connectedComponents]]: components tell you WHICH docs
  * form a near-dup family / fraud ring, centrality tells you which
  * member is the hub (the canonical doc to keep, the account to
  * investigate first). Reference scope: the reference's pipeline ranks
  * entities only by flat aggregates (counts); this is the graph-shaped
  * extension a curation/fraud workload needs once edges exist.
  *
  * Power-iteration PageRank, expressed as plain relational algebra so
  * Catalyst plans every round as one equi-join + one hash aggregate:
  *
  *   - out-degrees: one `groupBy(src).count` on the edge list;
  *   - per round: contributions `pr/outdeg` routed along edges (hash
  *     join on src), summed per dst (hash aggregate), dangling mass
  *     (vertices with no out-edges) folded back uniformly via a 1-row
  *     broadcast;
  *   - iteration state is one (id, pr) table, lineage-cut per round
  *     with [[graft.Materialize.cut]] exactly like the components loop.
  *
  * Shuffle per round is O(|edges| + |vertices|) ids+doubles — never
  * adjacency materialization beyond the input edge list, no driver
  * collect; a fixed iteration count (the common 100 TB choice: ranks
  * stabilize in the order sense long before numeric convergence) keeps
  * the job's stage count static so AQE can plan it.
  *
  * Numeric parity discipline: per-round sums accumulate in
  * DECIMAL(30,18) (order-independent, engine-independent) and every
  * scalar step is a plain double expression, so the whole iteration
  * replays bit-for-bit in an external SQL engine (harness q140).
  */
object Graphs {

  /** @param vertices one row per vertex (`idCol` unique)
    * @param edges    directed edge list; rows whose src or dst is not
    *                 in `vertices` contribute nothing
    * @param iters    fixed number of power-iteration rounds
    * @param damping  damping factor d; pr' = (1-d)/N + d·(inflow +
    *                 danglingMass/N)
    * @return (idCol, pagerank) — one row per vertex; sums to 1 up to
    *         the per-round 1e-18 decimal quantization
    */
  def pageRank(
      vertices: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    val verts = vertices.select(col(idCol).as("__id"))
    // the edge list re-enters the plan every round; its lineage may be
    // an expensive candidate-generation pipeline (LSH kNN graph) —
    // materialize once, like the components loop does
    val e = Materialize.cut(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")))
    val deg = e.groupBy(col("__src")).agg(count(lit(1)).as("__od"))
    // 1 row, broadcast into every round — cut so the vertex-derivation
    // lineage isn't re-executed per round
    val nDf = Materialize.cut(verts.agg(count(lit(1)).as("__n")))
    val base = lit(1.0 - damping) // embedded as the same double literal the oracle uses
    var pr = Materialize.cut(
      verts.crossJoin(broadcast(nDf))
        .select(col("__id"), (lit(1.0) / col("__n")).as("__pr")))
    for (_ <- 1 to iters) {
      // dangling mass: total pr sitting on vertices with no out-edges,
      // redistributed uniformly (the standard teleport correction) — a
      // 1-row aggregate, broadcast back in-plan
      val dang = pr.join(deg.select(col("__src").as("__id")), Seq("__id"), "left_anti")
        .agg(coalesce(sum(col("__pr").cast(DecimalType(30, 18))).cast("double"),
          lit(0.0)).as("__dm"))
      val inflow = e
        .join(pr.select(col("__id").as("__src"), col("__pr")), Seq("__src"))
        .join(deg, Seq("__src"))
        .groupBy(col("__dst"))
        .agg(sum((col("__pr") / col("__od")).cast(DecimalType(30, 18)))
          .cast("double").as("__s"))
      pr = Materialize.cut(
        verts
          .join(inflow.select(col("__dst").as("__id"), col("__s")), Seq("__id"), "left")
          .crossJoin(broadcast(dang))
          .crossJoin(broadcast(nDf))
          .select(col("__id"),
            (base / col("__n") + lit(damping) *
              (coalesce(col("__s"), lit(0.0)) + col("__dm") / col("__n")))
              .as("__pr")))
    }
    pr.select(col("__id").as(idCol), col("__pr").as("pagerank"))
  }

  /** Personalized PageRank: teleport mass goes ONLY to the seed set
    * (uniformly), not to every vertex — the seed-expansion primitive
    * ("given these known-good docs / known-bad accounts, rank
    * everything by proximity"): curation uses it to grow a trusted
    * corpus from a seed list, fraud review to rank the neighborhood of
    * confirmed cases. Same per-round dataflow as [[pageRank]]
    * ({edge equi-join + hash aggregate + one-row broadcasts}, decimal
    * folds, [[graft.Materialize.cut]] per round, fixed rounds); only
    * the teleport target changes: base mass and dangling mass
    * redistribute over |seeds|, and the initial distribution is
    * uniform ON the seeds (non-seed vertices start at 0 and are
    * reachable only through edges).
    */
  def personalizedPageRank(
      vertices: DataFrame,
      idCol: String,
      seeds: DataFrame,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    val verts = vertices.select(col(idCol).as("__id"))
    val seed = Materialize.cut(
      seeds.select(col(idCol).as("__id")).distinct())
    val e = Materialize.cut(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")))
    val deg = e.groupBy(col("__src")).agg(count(lit(1)).as("__od"))
    val nsDf = seed.agg(count(lit(1)).as("__ns")) // 1 row, broadcast below
    val base = lit(1.0 - damping)
    var pr = Materialize.cut(
      verts.join(seed.withColumn("__isSeed", lit(1)), Seq("__id"), "left")
        .crossJoin(broadcast(nsDf))
        .select(col("__id"),
          when(col("__isSeed").isNotNull, lit(1.0) / col("__ns"))
            .otherwise(lit(0.0)).as("__pr")))
    for (_ <- 1 to iters) {
      val dang = pr.join(deg.select(col("__src").as("__id")), Seq("__id"), "left_anti")
        .agg(coalesce(sum(col("__pr").cast(DecimalType(30, 18))).cast("double"),
          lit(0.0)).as("__dm"))
      val inflow = e
        .join(pr.select(col("__id").as("__src"), col("__pr")), Seq("__src"))
        .join(deg, Seq("__src"))
        .groupBy(col("__dst"))
        .agg(sum((col("__pr") / col("__od")).cast(DecimalType(30, 18)))
          .cast("double").as("__s"))
      pr = Materialize.cut(
        verts
          .join(inflow.select(col("__dst").as("__id"), col("__s")), Seq("__id"), "left")
          .join(seed.withColumn("__isSeed", lit(1)), Seq("__id"), "left")
          .crossJoin(broadcast(dang))
          .crossJoin(broadcast(nsDf))
          .select(col("__id"),
            (lit(damping) * coalesce(col("__s"), lit(0.0))
              + when(col("__isSeed").isNotNull,
                  (base + lit(damping) * col("__dm")) / col("__ns"))
                .otherwise(lit(0.0))).as("__pr")))
    }
    pr.select(col("__id").as(idCol), col("__pr").as("ppr"))
  }

  /** Per-vertex triangle counts and local clustering coefficient over
    * an undirected edge list — the ring-density metric: in a fraud
    * graph, a vertex whose neighbors also link each other (coefficient
    * near 1) sits inside a collusion clique, while a high-degree vertex
    * with coefficient near 0 is a hub/mule pattern; in a near-dup
    * corpus it separates tight clone cliques from chain-shaped false
    * positives.
    *
    * Standard distributed shape: orient each edge low-id -> high-id
    * (kills duplicate counting AND bounds the join fan-out by the
    * smaller side's degree), self-join oriented edges on the low
    * endpoint to enumerate wedges, then one hash semi-join of wedge
    * closures against the edge set — two shuffles total, O(|wedges|)
    * intermediate rows, never adjacency lists in memory.
    *
    * @param edges undirected; duplicates and self-loops tolerated
    *              (deduped / dropped up front)
    * @return (idCol, degree, n_triangles, clustering_coeff) for every
    *         vertex of `vertices`; coefficient is null when degree < 2
    */
  def triangleStats(
      vertices: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val norm = Materialize.cut(
      edges.select(
        least(col(srcCol), col(dstCol)).as("__lo"),
        greatest(col(srcCol), col(dstCol)).as("__hi"))
        .filter(col("__lo") =!= col("__hi"))
        .distinct())
    val deg = norm.select(col("__lo").as("__id"))
      .unionByName(norm.select(col("__hi").as("__id")))
      .groupBy(col("__id")).agg(count(lit(1)).as("__deg"))
    // wedges around the low endpoint: (a<b), (a<c), b<c by ordering the
    // two partners — each triangle is generated exactly once as its
    // lowest-vertex wedge closed by the (b,c) edge
    val wedges = norm.select(col("__lo").as("__a"), col("__hi").as("__b"))
      .join(norm.select(col("__lo").as("__a"), col("__hi").as("__c")), Seq("__a"))
      .filter(col("__b") < col("__c"))
    val triangles = wedges
      .join(norm.select(col("__lo").as("__b"), col("__hi").as("__c")),
        Seq("__b", "__c"), "left_semi")
    val perVertex = triangles
      .select(explode(array(col("__a"), col("__b"), col("__c"))).as("__id"))
      .groupBy(col("__id")).agg(count(lit(1)).as("__tri"))
    vertices.select(col(idCol).as("__id"))
      .join(deg, Seq("__id"), "left")
      .join(perVertex, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("__deg"), lit(0L)).as("degree"),
        coalesce(col("__tri"), lit(0L)).as("n_triangles"),
        when(coalesce(col("__deg"), lit(0L)) >= 2,
          coalesce(col("__tri"), lit(0L)).cast("double") * 2.0 /
            (col("__deg") * (col("__deg") - 1)))
          .as("clustering_coeff"))
  }

  /** k-core membership via iterative peeling: repeatedly delete
    * vertices of degree < k (with their edges) — what survives is the
    * k-core, the maximal subgraph where everyone keeps ≥ k neighbors.
    * The densest-region extractor of fraud-ring and clone-family
    * analysis: a 2-core strips pendant chains off the near-dup graph,
    * leaving the cliques; higher k isolates collusion cores.
    *
    * `rounds` is FIXED (the [[pageRank]] contract): each round is one
    * degree aggregate + two semi-joins on the surviving vertex set,
    * lineage-cut per round, O(|edges|) shuffle — no driver loop
    * condition, so the stage graph is static. Peeling converges in few
    * rounds on real graphs (each round removes every currently-light
    * vertex at once); an unconverged run is still well-defined (the
    * round-r peel state) and the harness oracle replays the SAME r
    * rounds, so correctness is pinned regardless.
    *
    * @return (idCol, core_degree, in_kcore) for every vertex of
    *         `vertices`: degree within the round-r surviving subgraph
    *         (0 once peeled) and whether it still meets k.
    */
  def kCore(
      vertices: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      rounds: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var e = Materialize.cut(
      edges.select(
        least(col(srcCol), col(dstCol)).as("__lo"),
        greatest(col(srcCol), col(dstCol)).as("__hi"))
        .filter(col("__lo") =!= col("__hi"))
        .distinct())
    def degrees(ed: DataFrame): DataFrame =
      ed.select(col("__lo").as("__id"))
        .unionByName(ed.select(col("__hi").as("__id")))
        .groupBy(col("__id")).agg(count(lit(1)).as("__deg"))
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("__deg") >= k).select(col("__id"))
      e = Materialize.cut(
        e.join(keep.withColumnRenamed("__id", "__lo"), Seq("__lo"), "left_semi")
          .join(keep.withColumnRenamed("__id", "__hi"), Seq("__hi"), "left_semi"))
    }
    vertices.select(col(idCol).as("__id"))
      .join(degrees(e), Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("__deg"), lit(0L)).as("core_degree"),
        (coalesce(col("__deg"), lit(0L)) >= k).as("in_kcore"))
  }

  /** Corpus snapshot diff — classify every doc id across two corpus
    * snapshots by content fingerprint: `added` (only in `newDf`),
    * `removed` (only in `oldDf`), `changed` (both, different
    * fingerprint), `unchanged`. The continual-training primitive: an
    * incremental crawl refresh needs exactly this to decide what to
    * re-clean / re-dedup / re-embed instead of reprocessing 100 TB.
    *
    * One full-outer hash join on the id — both sides shuffle ids +
    * 128-bit fingerprints only, never document bodies.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    def fp(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as(s"__id_$side"),
        graft.functions.TextFunctions.fingerprint(col(textCol)).as(s"__fp_$side"))
    fp(oldDf, "old")
      .join(fp(newDf, "new"), col("__id_old") === col("__id_new"), "full_outer")
      .select(
        coalesce(col("__id_old"), col("__id_new")).as(idCol),
        when(col("__id_old").isNull, "added")
          .when(col("__id_new").isNull, "removed")
          .when(col("__fp_old") =!= col("__fp_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Degree distribution of an undirected edge list: one row per
    * observed degree with the vertex count — the first diagnostic on
    * any new graph (a power-law tail predicts hot-vertex skew in
    * every downstream join; see [[ScaleAudit.keySkewProfile]]).
    * Two hash aggregates (vertex degree, then degree histogram).
    */
  def degreeHistogram(
      edges: DataFrame, srcCol: String = "src", dstCol: String = "dst")
      : DataFrame =
    edges.select(col(srcCol).as("__v"), col(dstCol).as("__o"))
      .unionAll(edges.select(col(dstCol).as("__v"), col(srcCol).as("__o")))
      .distinct()
      .groupBy(col("__v")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_vertices"))

  /** Bounded-depth BFS from a seed set over an undirected edge list:
    * per seed, every vertex reachable in ≤ `maxHops` hops with its
    * hop distance (the MINIMUM number of edges; a vertex reached at
    * hop 1 is never re-labeled at hop 2). The workhorse for blast-
    * radius questions — "which documents sit within two near-dup hops
    * of this contaminated one", "which accounts are two transfers from
    * a flagged one".
    *
    * Per hop: one equi-join frontier⋈edges + one (seed, vertex)
    * dedup-aggregate against the visited set — O(frontier·degree)
    * shuffle, never adjacency², with lineage cut per round like the
    * components loop. `maxHops` is fixed (static stage count, AQE-
    * plannable); seeds travel WITH the frontier rows, so one pass
    * answers all seeds without a per-seed loop.
    */
  def bfsFromSeeds(
      edges: DataFrame, seeds: DataFrame, idCol: String,
      srcCol: String = "src", dstCol: String = "dst",
      maxHops: Int = 2): DataFrame = {
    require(maxHops >= 1 && maxHops <= 10, s"maxHops out of range: $maxHops")
    val und = edges.select(col(srcCol).as("__u"), col(dstCol).as("__v"))
      .unionAll(edges.select(col(dstCol).as("__u"), col(srcCol).as("__v")))
      .distinct()
    var visited = seeds.select(col(idCol).as("seed"))
      .withColumn("vertex", col("seed")).withColumn("hop", lit(0))
    var frontier = visited
    var h = 1
    while (h <= maxHops) {
      val next = frontier
        .join(und, col("vertex") === col("__u"))
        .select(col("seed"), col("__v").as("vertex"))
        .distinct()
        .join(visited.select(col("seed"), col("vertex")).as("vis"),
          Seq("seed", "vertex"), "left_anti")
        .withColumn("hop", lit(h))
      frontier = Materialize.cut(next)
      visited = Materialize.cut(visited.unionByName(frontier))
      h += 1
    }
    visited
  }

  /** Semi-supervised label propagation: seed labels spread along
    * edges for a fixed number of rounds — the cheap way to extend a
    * small human-labeled set over a big near-dup/kNN graph ("label
    * the cluster, not the document"). Seeds are CLAMPED (a labeled
    * vertex never changes); an unlabeled vertex adopts the most
    * common label among its labeled neighbors, ties broken by the
    * smallest label, so the result is deterministic under any
    * partitioning.
    *
    * `vertices` carries (idCol, labelCol) with NULL label = unlabeled.
    * Per round: one frontier⋈edges equi-join + one (vertex, label)
    * count aggregate + one rank — O(|edges|) shuffle, lineage-cut per
    * round like the components loop; `rounds` is fixed so the stage
    * count is static.
    */
  /** HITS hubs & authorities (Kleinberg 1999) on a directed edge list,
    * `iters` mutual-reinforcement rounds from a uniform hub vector with
    * L1 normalization (sums replayable exactly; an L2 norm would put a
    * sqrt inside every round). Round k: a ← Σ_in h / ‖·‖₁,
    * h ← Σ_out a / ‖·‖₁, every per-vertex score rounded at 12 and every
    * normalizer an exact decimal fold of those rounded doubles — the
    * [[pageRank]] discipline, so two engines iterate bit-identically.
    *
    * Shape per round: two equi-joins edge⋈score (shuffle on the vertex
    * keys) + two hash aggregates + a one-row broadcast normalizer. The
    * edge list is materialized once ([[Materialize.cut]]) so an
    * expensive edge lineage doesn't re-execute 2·iters times.
    *
    * Output: (vertex, side, score) — side 'hub' for sources, 'auth'
    * for sinks; a vertex appearing on both sides emits two rows.
    */
  def hits(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = Materialize.cut(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
        .distinct())
    def l1Normalize(scores: DataFrame, scoreCol: String): DataFrame = {
      val tot = scores.agg(
        sum(col(scoreCol).cast("decimal(38,12)")).cast("double").as("__t"))
      scores.crossJoin(broadcast(tot))
        .select(scores.columns.filter(_ != scoreCol).map(col) :+
          round(col(scoreCol) / col("__t"), 12).as(scoreCol): _*)
    }
    var hubs = Materialize.cut(l1Normalize(
      e.select(col("__src")).distinct().withColumn("__h", lit(1.0)), "__h"))
    var auths: DataFrame = null
    for (_ <- 1 to iters) {
      auths = Materialize.cut(l1Normalize(
        e.join(hubs, Seq("__src"))
          .groupBy(col("__dst"))
          .agg(sum(col("__h").cast("decimal(38,12)")).cast("double")
            .as("__a")), "__a"))
      hubs = Materialize.cut(l1Normalize(
        e.join(auths, Seq("__dst"))
          .groupBy(col("__src"))
          .agg(sum(col("__a").cast("decimal(38,12)")).cast("double")
            .as("__h")), "__h"))
    }
    // scores are already 12-dp from the last normalize; re-rounding at a
    // coarser scale would double-round and can flip a half-boundary
    // differently across engines (observed once in 600 rows at 10 dp)
    hubs.select(col("__src").as("vertex"), lit("hub").as("side"),
      col("__h").as("score"))
      .unionByName(
        auths.select(col("__dst").as("vertex"), lit("auth").as("side"),
          col("__a").as("score")))
  }

  def labelPropagation(
      vertices: DataFrame, idCol: String, labelCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 10, s"rounds out of range: $rounds")
    // materialize once: the undirected edge list re-enters the plan
    // every round, and its lineage may be an expensive candidate
    // pipeline (the minhash near-dup join) — uncut, each round's vote
    // aggregate re-paid the whole prefix
    val und = Materialize.cut(
      edges.select(col(srcCol).as("__u"), col(dstCol).as("__v"))
        .unionAll(edges.select(col(dstCol).as("__u"), col(srcCol).as("__v")))
        .distinct())
    val seeds = vertices.select(col(idCol).as("__id"),
      col(labelCol).as("__seed"))
    var cur = seeds.withColumn("__lbl", col("__seed"))
    var r = 0
    while (r < rounds) {
      val votes = und
        .join(cur.select(col("__id").as("__v"), col("__lbl").as("__nl")),
          Seq("__v"))
        .where(col("__nl").isNotNull)
        .groupBy(col("__u"), col("__nl"))
        .agg(count(lit(1)).as("__c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__u"))
        .orderBy(col("__c").desc, col("__nl"))
      val winner = votes
        .withColumn("__rk", row_number().over(w))
        .where(col("__rk") === 1)
        .select(col("__u").as("__id"), col("__nl").as("__win"))
      cur = Materialize.cut(
        cur.join(winner, Seq("__id"), "left")
          // clamp: seeds keep their label; others adopt the round's
          // winner, or keep last round's adoption when isolated
          .select(col("__id"), col("__seed"),
            coalesce(col("__seed"), col("__win"), col("__lbl")).as("__lbl")))
      r += 1
    }
    cur.select(col("__id").as(idCol), col("__seed").as("seed_label"),
      col("__lbl").as("label"))
  }

  /** One-level Louvain local moves — modularity-ASCENT community
    * detection, closing the gap between scoring a partition
    * ([[modularity]]) and producing one: where connected components
    * merge through chains and [[labelPropagation]] needs seeds, this
    * starts from singletons and lets each vertex adopt the candidate
    * community (a neighbor's, or its own) with maximal modularity gain.
    *
    * Gains compare as INTEGERS — joining community c scores
    *   s(v,c) = 2m·k_{v,c} − k_v·(tot_c − [c = c_v]·k_v)
    * (m = undirected edge count, k_{v,c} = edges from v into c,
    * k_v = degree, tot_c = summed degree of c's members; the bracket
    * removes v's own degree when evaluating "stay"), which is the
    * standard ΔQ numerator with the constant 1/2m² scale dropped — so
    * the argmax replays exactly in any engine, no doubles anywhere.
    * Ties break (score desc, community asc).
    *
    * Rounds are SYNCHRONOUS and parity-gated: in round r only vertices
    * with id % 2 == (r+1) % 2 may move, the standard two-coloring
    * guard parallel Louvain uses against the swap oscillation that
    * plain synchronous updates exhibit on symmetric graphs. Fixed
    * `rounds` (static stage graph, AQE-plannable), [[Materialize.cut]]
    * per round, per-round cost = two edge-sized equi-joins + hash
    * aggregates — the [[pageRank]] discipline. Isolated vertices keep
    * their singleton community. Scores are BIGINT: exact while
    * 2m·k_v < 2^63, i.e. any corpus this side of ~10^9 edges with
    * ~10^9-degree hubs; past that, lift to DECIMAL in both engines.
    *
    * `edges` holds each undirected edge ONCE as (id_a, id_b), no
    * self-loops. Output: (idCol, community) — labels are vertex ids.
    */
  def louvainOneLevel(
      vertices: DataFrame, idCol: String,
      edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 10, s"rounds out of range: $rounds")
    val und = Materialize.cut(
      edges.select(col("id_a").as("__u"), col("id_b").as("__v"),
          lit(1L).as("__w"))
        .unionAll(edges.select(col("id_b").as("__u"),
          col("id_a").as("__v"), lit(1L).as("__w"))))
    val deg = und.groupBy(col("__u"))
      .agg(sum(col("__w")).cast("long").as("__k"))
    // cut: mRow is broadcast into EVERY round's gain plan; uncut, its
    // lineage was re-executed once per round. Derived from the
    // MATERIALIZED und (each edge twice, __w = 1 → sum/2 = m, exact)
    // so the edge-derivation DAG — e.g. the minhash near-dup join —
    // is never paid a second time for the count
    val mRow = Materialize.cut(
      und.agg((sum(col("__w")) / lit(2L)).cast("long").as("__m")))
    louvainAscent(vertices.select(col(idCol).as("__id")), und, deg,
        mRow, rounds)
      .select(col("__id").as(idCol), col("__c").as("community"))
  }

  /** Weighted one-level Louvain ascent over a weighted undirected edge
    * list (`id_a`, `id_b`, `weight` — each edge once, SELF-LOOPS
    * allowed): the modularity-gain pass real (multi-level) Louvain
    * runs on its coarsened graphs. Same integer-exact gain
    *   s(v,c) = 2m·w_{v,c} − k_v·(tot_c − [c = c_v]·k_v)
    * as [[louvainOneLevel]], with m = total edge weight, w_{v,c} =
    * weight from v into c over NON-self edges (a self-loop travels
    * with its vertex and contributes the same internal mass wherever
    * v lands, so it cancels out of the argmax), and k_v = weighted
    * degree where a self-loop counts twice (so Σk = 2m, the standard
    * convention). Weights are integer counts on the coarsening path,
    * so every score stays BIGINT-exact; parity gating, tie-breaks,
    * per-round [[graft.Materialize.cut]] and the
    * two-equi-joins-plus-hash-aggregates round cost are all shared
    * with the unweighted pass through the same core.
    */
  def louvainOneLevelWeighted(
      vertices: DataFrame, idCol: String,
      edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 10, s"rounds out of range: $rounds")
    val nonSelf = edges.filter(col("id_a") =!= col("id_b"))
    val und = Materialize.cut(
      nonSelf.select(col("id_a").as("__u"), col("id_b").as("__v"),
          col("weight").cast("long").as("__w"))
        .unionAll(nonSelf.select(col("id_b").as("__u"),
          col("id_a").as("__v"), col("weight").cast("long").as("__w"))))
    val deg = und.select(col("__u"), col("__w"))
      .unionAll(edges.filter(col("id_a") === col("id_b"))
        .select(col("id_a").as("__u"),
          (col("weight") * 2).cast("long").as("__w")))
      .groupBy(col("__u")).agg(sum(col("__w")).cast("long").as("__k"))
    // cut for the same per-round broadcast reason as [[louvainOneLevel]]
    val mRow = Materialize.cut(
      edges.agg(sum(col("weight")).cast("long").as("__m")))
    louvainAscent(vertices.select(col(idCol).as("__id")), und, deg,
        mRow, rounds)
      .select(col("__id").as(idCol), col("__c").as("community"))
  }

  /** Incremental Louvain: fold a NEW-edge batch into a frozen
    * community assignment with LOCAL moves only — the community twin
    * of [[graft.operators.Components.incrementalComponents]], and the
    * missing piece between it and the full multi-level rebuild. Only
    * vertices TOUCHED by the batch (its endpoints; new vertices enter
    * as singletons) may move; they run `rounds` parity-gated
    * synchronous ascent rounds with the exact integer gain of
    * [[louvainOneLevel]], scored against the FULL updated graph
    * masses (degrees and m include the batch), while every untouched
    * vertex keeps its label. Q is therefore evaluated on the true
    * grown graph — moves that look good only on stale masses cannot
    * happen.
    *
    * Scale shape per batch: degree masses and m are one aggregate
    * over old + new edges (incrementally maintainable as old-deg +
    * batch-delta at a real deployment — the dataflow here recomputes
    * for oracle parity, same cost class); the per-round neighbor-
    * community aggregate reads ONLY edges incident to the movable
    * set (one semi-join, batch-degree-bounded), so round cost scales
    * with the batch's neighborhood, never the corpus graph. The
    * community mass table is community-cardinality-sized.
    */
  def incrementalLouvain(
      assign: DataFrame, idCol: String,
      oldEdges: DataFrame, newEdges: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 10, s"rounds out of range: $rounds")
    val all = oldEdges.select(col("id_a"), col("id_b"))
      .unionByName(newEdges.select(col("id_a"), col("id_b")))
    val und = Materialize.cut(
      all.select(col("id_a").as("__u"), col("id_b").as("__v"),
          lit(1L).as("__w"))
        .unionAll(all.select(col("id_b").as("__u"),
          col("id_a").as("__v"), lit(1L).as("__w"))))
    val deg = und.groupBy(col("__u"))
      .agg(sum(col("__w")).cast("long").as("__k"))
    // cut, and derived from the materialized und (sum __w / 2 = |all|,
    // exact) for the same per-round broadcast reason as
    // [[louvainOneLevel]] — the grown edge DAG is paid exactly once
    val mRow = Materialize.cut(
      und.agg((sum(col("__w")) / lit(2L)).cast("long").as("__m")))
    val movable = Materialize.cut(
      newEdges.select(col("id_a").as("__id"))
        .unionByName(newEdges.select(col("id_b").as("__id")))
        .distinct())
    val base = assign.select(col(idCol).as("__id"),
      col("community").cast("long").as("__c"))
    val entrants = movable.join(base, Seq("__id"), "leftanti")
      .select(col("__id"), col("__id").cast("long").as("__c"))
    var cur = Materialize.cut(base.unionByName(entrants))
    val undM = Materialize.cut(
      und.join(movable.select(col("__id").as("__u")), Seq("__u"),
        "leftsemi"))
    for (r <- 1 to rounds) {
      val tot = cur.join(deg, cur("__id") === deg("__u"), "left")
        .groupBy(col("__c"))
        .agg(sum(coalesce(col("__k"), lit(0L))).as("__tot"))
      val kvc = undM
        .join(cur.select(col("__id").as("__v"), col("__c").as("__nc")),
          Seq("__v"))
        .groupBy(col("__u"), col("__nc"))
        .agg(sum(col("__w")).cast("long").as("__kvc"))
        .select(col("__u").as("__id"), col("__nc").as("__cand"),
          col("__kvc"))
      val own = cur.join(movable, Seq("__id"), "leftsemi")
        .select(col("__id"), col("__c").as("__cand"), lit(0L).as("__kvc"))
      val cand = kvc.unionByName(own)
        .groupBy(col("__id"), col("__cand"))
        .agg(max(col("__kvc")).as("__kvc"))
      val scored = cand
        .join(cur, Seq("__id"))
        .join(deg.select(col("__u").as("__id"), col("__k")),
          Seq("__id"), "left")
        .join(tot.select(col("__c").as("__cand"), col("__tot")),
          Seq("__cand"))
        .crossJoin(broadcast(mRow))
        .withColumn("__kv", coalesce(col("__k"), lit(0L)))
        .withColumn("__s",
          lit(2L) * col("__m") * col("__kvc")
            - col("__kv") * (col("__tot")
              - when(col("__cand") === col("__c"), col("__kv"))
                .otherwise(lit(0L))))
      // argmax via one hash aggregate (round 13, the louvainAscent
      // rewrite): same (score desc, community asc) winner, no
      // window exchange+sort. Only MOVABLE ids appear in scored, so
      // the left join against cur stays (untouched vertices keep
      // their label through the coalesce).
      val winner = scored.groupBy(col("__id"))
        .agg(max(struct(col("__s"), (-col("__cand")).as("__negc")))
          .as("__b"))
        .select(col("__id"), (-col("__b.__negc")).as("__win"))
      cur = Materialize.cut(
        cur.join(winner, Seq("__id"), "left")
          .select(col("__id"),
            when(pmod(col("__id"), lit(2L)) === lit(((r + 1) % 2).toLong),
              coalesce(col("__win"), col("__c")))
              .otherwise(col("__c")).as("__c")))
    }
    cur.select(col("__id").as(idCol), col("__c").as("community"))
  }

  /** The shared parity-gated synchronous ascent loop. `und` holds each
    * non-self edge in BOTH directions as (__u, __v, __w); `deg` is the
    * weighted degree (__u, __k) INCLUDING self-loop mass; `mRow` the
    * one-row total edge weight (__m). See [[louvainOneLevel]] for the
    * round semantics.
    */
  private def louvainAscent(
      verts: DataFrame, und: DataFrame, deg: DataFrame,
      mRow: DataFrame, rounds: Int): DataFrame = {
    var cur = Materialize.cut(verts.withColumn("__c", col("__id")))
    for (r <- 1 to rounds) {
      val tot = cur.join(deg, cur("__id") === deg("__u"), "left")
        .groupBy(col("__c"))
        .agg(sum(coalesce(col("__k"), lit(0L))).as("__tot"))
      val kvc = und
        .join(cur.select(col("__id").as("__v"), col("__c").as("__nc")),
          Seq("__v"))
        .groupBy(col("__u"), col("__nc"))
        .agg(sum(col("__w")).cast("long").as("__kvc"))
        .select(col("__u").as("__id"), col("__nc").as("__cand"),
          col("__kvc"))
      val own = cur.select(col("__id"), col("__c").as("__cand"),
        lit(0L).as("__kvc"))
      val cand = kvc.unionByName(own)
        .groupBy(col("__id"), col("__cand"))
        .agg(max(col("__kvc")).as("__kvc"))
      val scored = cand
        .join(cur, Seq("__id"))
        .join(deg.select(col("__u").as("__id"), col("__k")),
          Seq("__id"), "left")
        .join(tot.select(col("__c").as("__cand"), col("__tot")),
          Seq("__cand"))
        .crossJoin(broadcast(mRow))
        .withColumn("__kv", coalesce(col("__k"), lit(0L)))
        .withColumn("__s",
          lit(2L) * col("__m") * col("__kvc")
            - col("__kv") * (col("__tot")
              - when(col("__cand") === col("__c"), col("__kv"))
                .otherwise(lit(0L))))
      // argmax via one hash aggregate (round 13): max over
      // struct(__s, -__cand) picks the same (score desc, community asc)
      // winner the old rank-1 window did, without the window's
      // exchange+sort — and because `own` guarantees every vertex a
      // candidate row carrying its current __c, the new assignment
      // falls out of the same aggregate with no join back against cur
      // (2 fewer stages per round).
      val agg = scored.groupBy(col("__id"))
        .agg(max(struct(col("__s"), (-col("__cand")).as("__negc")))
          .as("__b"),
          first(col("__c")).as("__c0")) // constant within the group
      cur = Materialize.cut(
        agg.select(col("__id"),
          when(pmod(col("__id"), lit(2L)) === lit(((r + 1) % 2).toLong),
            -col("__b.__negc"))
            .otherwise(col("__c0")).as("__c")))
    }
    cur
  }

  /** Graph coarsening by community — the step between Louvain levels:
    * each community becomes one super-vertex, and the weighted coarse
    * edge (c_a, c_b, weight) carries the COUNT of original edges
    * between the two communities (intra-community edges become
    * self-loops). Exactly two edge-sized equi-joins against the
    * assignment plus one hash aggregate; the coarse graph is
    * community-cardinality-sized, which is what makes the next level
    * cheap at 100 TB. Output keys are normalized (id_a <= id_b), each
    * coarse edge once.
    */
  def coarsenByCommunity(
      assign: DataFrame, idCol: String, communityCol: String,
      edges: DataFrame): DataFrame =
    edges.select(col("id_a"), col("id_b"))
      .join(assign.select(col(idCol).as("id_a"),
        col(communityCol).as("__ca")), Seq("id_a"))
      .join(assign.select(col(idCol).as("id_b"),
        col(communityCol).as("__cb")), Seq("id_b"))
      .select(least(col("__ca"), col("__cb")).as("id_a"),
        greatest(col("__ca"), col("__cb")).as("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).cast("long").as("weight"))

  /** Mutual-best modularity merge rounds over a weighted coarse graph
    * — the synchronous-SAFE coarse pass of [[louvainTwoLevel]]. Each
    * round, every community proposes the adjacent community with the
    * best positive merge gain
    *   Δ(4m²·Q) = 4m·w_AB − 2·tot_A·tot_B
    * (w_AB = inter-community weight, tot = weighted degree mass; all
    * BIGINT, exact while 2·tot_A·tot_B < 2^63), and ONLY mutual
    * proposals merge (label = the smaller). Accepted merges are
    * therefore pairwise-disjoint and each strictly positive, so Q is
    * provably non-decreasing — the property a synchronous
    * per-vertex ascent CANNOT give at the coarse level: after level 1
    * the surviving labels skew to one parity class (movers adopt the
    * other class's labels), the parity gate degenerates, every
    * super-vertex moves at once and chain/multi-merges overshoot
    * (observed: the resolution-limit ring drops from Q=0.65 to 0.61).
    * Matching-style coarsening is the standard remedy (heavy-edge
    * matching in multilevel partitioners). Ties break (gain desc,
    * pair-hash asc, partner asc) — the hash term de-synchronizes
    * proposal chains on equal-gain runs so a round matches many
    * disjoint pairs, not one.
    *
    * Per-round cost: one hash aggregate to the current community
    * graph, one pair-gain aggregate, a rank-1 window per community,
    * one self-join for mutuality — all community-cardinality-sized.
    * Output: (sv, community) — final community per input super-vertex.
    */
  def communityMergeRounds(
      superV: DataFrame, svCol: String,
      coarse: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 10, s"rounds out of range: $rounds")
    // cut for the same per-round broadcast reason as [[louvainOneLevel]]
    val mRow = Materialize.cut(
      coarse.agg(sum(col("weight")).cast("long").as("__m")))
    val degBase = coarse
      .select(col("id_a").as("__sv"),
        when(col("id_a") === col("id_b"), col("weight") * 2)
          .otherwise(col("weight")).cast("long").as("__d"))
      .unionAll(coarse.filter(col("id_a") =!= col("id_b"))
        .select(col("id_b").as("__sv"), col("weight").cast("long").as("__d")))
      .groupBy(col("__sv")).agg(sum(col("__d")).cast("long").as("__deg"))
    var cur = Materialize.cut(
      superV.select(col(svCol).as("__sv")).withColumn("__c", col("__sv")))
    for (_ <- 1 to rounds) {
      val tot = cur.join(degBase, Seq("__sv"), "left")
        .groupBy(col("__c"))
        .agg(sum(coalesce(col("__deg"), lit(0L))).as("__tot"))
      val w = coarse
        .join(cur.select(col("__sv").as("id_a"), col("__c").as("__ca")),
          Seq("id_a"))
        .join(cur.select(col("__sv").as("id_b"), col("__c").as("__cb")),
          Seq("id_b"))
        .filter(col("__ca") =!= col("__cb"))
        .select(least(col("__ca"), col("__cb")).as("__pa"),
          greatest(col("__ca"), col("__cb")).as("__pb"),
          col("weight"))
        .groupBy(col("__pa"), col("__pb"))
        .agg(sum(col("weight")).cast("long").as("__w"))
      val gains = w
        .join(tot.select(col("__c").as("__pa"), col("__tot").as("__ta")),
          Seq("__pa"))
        .join(tot.select(col("__c").as("__pb"), col("__tot").as("__tb")),
          Seq("__pb"))
        .crossJoin(broadcast(mRow))
        .withColumn("__g",
          lit(4L) * col("__m") * col("__w")
            - lit(2L) * col("__ta") * col("__tb"))
        .filter(col("__g") > 0L)
        .withColumn("__h", graft.functions.TextFunctions.md5Hash60(
          concat(col("__pa").cast("string"), lit("_"),
            col("__pb").cast("string"))))
      val directed = gains.select(col("__pa").as("__src"),
          col("__pb").as("__dst"), col("__g"), col("__h"))
        .unionAll(gains.select(col("__pb").as("__src"),
          col("__pa").as("__dst"), col("__g"), col("__h")))
      // rank-1 proposal via one hash aggregate (round 13): max over
      // struct(__g, -__h, -__dst) = the old (gain desc, hash asc,
      // partner asc) window winner, without the exchange+sort
      val best = directed.groupBy(col("__src"))
        .agg(max(struct(col("__g"), (-col("__h")).as("__nh"),
          (-col("__dst")).as("__nd"))).as("__b"))
        .select(col("__src"), (-col("__b.__nd")).as("__dst"))
      // mutual = (a->b) and (b->a) both rank-1; relabel the larger
      // endpoint to the smaller (the smaller maps to itself via the
      // left-join fallback below)
      val mutual = best
        .join(best.select(col("__dst").as("__src"),
          col("__src").as("__dst")), Seq("__src", "__dst"))
        .filter(col("__src") > col("__dst"))
        .select(col("__src").as("__from"), col("__dst").as("__to"))
      cur = Materialize.cut(
        cur.join(mutual.select(col("__from").as("__c"), col("__to")),
            Seq("__c"), "left")
          .select(col("__sv"),
            coalesce(col("__to"), col("__c")).as("__c")))
    }
    cur.select(col("__sv").as("sv"), col("__c").as("community"))
  }

  /** Two-level Louvain (Blondel et al. 2008's level recursion, fixed
    * at two levels for a static stage graph): a [[louvainOneLevel]]
    * ascent over the original graph, [[coarsenByCommunity]], then
    * [[communityMergeRounds]] over the weighted community super-graph,
    * with the coarse labels mapped back through the level-1
    * assignment. The coarse pass is where multi-level quality comes
    * from — whole communities merge at once, climbing steps a
    * vertex-at-a-time ascent cannot reach (the Fortunato-Barthelemy
    * resolution limit is the canonical case) — and because only
    * disjoint positive-gain mutual merges are accepted,
    * Q(two-level) >= Q(one-level) ALWAYS holds (spec-pinned on the
    * ring fixture where level 1 is provably stuck). Everything stays
    * id/label-sized after the level-1 joins; the level-2 graph is
    * communities², usually tiny.
    * Output: (idCol, community) — labels are level-1 community ids.
    */
  def louvainTwoLevel(
      vertices: DataFrame, idCol: String, edges: DataFrame,
      rounds1: Int, rounds2: Int): DataFrame = {
    // edges enters the plan three times (ascent und, ascent mRow,
    // coarsening) and its lineage may be an expensive candidate
    // pipeline (the minhash near-dup join) — materialize it once
    val e = Materialize.cut(edges)
    val l1 = Materialize.cut(
      louvainOneLevel(vertices, idCol, e, rounds1))
    val coarse = Materialize.cut(
      coarsenByCommunity(l1, idCol, "community", e))
    val superV = l1.select(col("community")).distinct()
    val merged = communityMergeRounds(superV, "community", coarse, rounds2)
    l1.select(col(idCol), col("community").as("sv"))
      .join(merged, Seq("sv"))
      .select(col(idCol), col("community"))
  }

  /** [[coarsenByCommunity]] for an already-WEIGHTED edge list: the
    * coarse edge SUMS the member edges' weights instead of counting
    * them — what level >= 3 of the recursion coarsens (its input is
    * the previous level's weighted coarse graph). Same Q-lossless
    * invariant, same two equi-joins + one hash aggregate.
    */
  def coarsenWeightedByCommunity(
      assign: DataFrame, idCol: String, communityCol: String,
      edges: DataFrame): DataFrame =
    edges.select(col("id_a"), col("id_b"), col("weight"))
      .join(assign.select(col(idCol).as("id_a"),
        col(communityCol).as("__ca")), Seq("id_a"))
      .join(assign.select(col(idCol).as("id_b"),
        col(communityCol).as("__cb")), Seq("id_b"))
      .select(least(col("__ca"), col("__cb")).as("id_a"),
        greatest(col("__ca"), col("__cb")).as("id_b"), col("weight"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("weight")).cast("long").as("weight"))

  /** Multi-level Louvain (the full Blondel et al. 2008 recursion,
    * bounded at 4 levels): level 1 is the vertex ascent, every level
    * after is coarsen + [[communityMergeRounds]] on the (weighted)
    * community graph, LOOPING WHILE THE COARSE GRAPH KEEPS SHRINKING —
    * deep community hierarchies (cliques of cliques of cliques) climb
    * one tier per level, and because each level's merges are disjoint
    * positive-gain mutual pairs on a Q-lossless coarsening,
    * Q(n levels) >= Q(n−1 levels) ALWAYS (spec-pinned on a 3-tier
    * fixture where two levels are provably stuck at tier 2).
    *
    * A level that merges nothing is a mutual-best fixpoint; its
    * coarsened graph is IDENTICAL, so every later level would also
    * merge nothing — the early stop skips provably-empty work (one
    * community-cardinality count per level decides it; the data plane
    * is untouched). Levels cost one coarsen + `rounds2` merge rounds
    * each, all community-cardinality-sized after level 1.
    * Output: (idCol, community) — labels are level-1 community ids.
    */
  def louvainLevels(
      vertices: DataFrame, idCol: String, edges: DataFrame,
      rounds1: Int, rounds2: Int, levels: Int): DataFrame = {
    require(levels >= 2 && levels <= 4,
      s"levels must be in [2,4], got $levels")
    // materialize the edge list once — see [[louvainTwoLevel]]
    val e = Materialize.cut(edges)
    var assign = Materialize.cut(
      louvainOneLevel(vertices, idCol, e, rounds1))
    var coarse = Materialize.cut(
      coarsenByCommunity(assign, idCol, "community", e))
    var lvl = 2
    var shrinking = true
    while (lvl <= levels && shrinking) {
      val superV = assign.select(col("community")).distinct()
      val nBefore = superV.count()
      val merged = Materialize.cut(
        communityMergeRounds(superV, "community", coarse, rounds2))
      val nAfter = merged.select(col("community")).distinct().count()
      assign = Materialize.cut(
        assign.select(col(idCol), col("community").as("sv"))
          .join(merged, Seq("sv"))
          .select(col(idCol), col("community")))
      shrinking = nAfter < nBefore
      if (lvl < levels && shrinking)
        coarse = Materialize.cut(coarsenWeightedByCommunity(
          merged, "sv", "community", coarse))
      lvl += 1
    }
    assign
  }

  /** Weighted Newman modularity of a vertex partition over a weighted
    * undirected edge list (`id_a`, `id_b`, `weight` — each edge once,
    * self-loops allowed): Q = (4m·Σw_c − Σd_c²)/4m² with m = total
    * edge weight, w_c = intra-community weight (self-loops count
    * fully), d_c = weighted degree mass (self-loops count twice) —
    * the same all-integer rearrangement as [[modularity]], so the
    * score reduces exactly and replays cross-engine. The defining
    * invariant (spec-pinned): scoring a partition of a
    * [[coarsenByCommunity]] super-graph equals scoring the expanded
    * partition on the ORIGINAL graph — coarsening is Q-lossless,
    * which is exactly why multi-level Louvain may optimize at the
    * coarse level at all. Output mirrors [[modularity]]:
    * (n_clusters, m_weight, intra_weight, q_modularity).
    */
  def modularityWeighted(
      assign: DataFrame, idCol: String, clusterCol: String,
      edges: DataFrame): DataFrame = {
    val labeled = edges.select(col("id_a"), col("id_b"), col("weight"))
      .join(assign.select(col(idCol).as("id_a"),
        col(clusterCol).as("__ca")), Seq("id_a"))
      .join(assign.select(col(idCol).as("id_b"),
        col(clusterCol).as("__cb")), Seq("id_b"))
    val counts = labeled.agg(
      sum(col("weight")).cast("long").as("m_weight"),
      sum(when(col("__ca") === col("__cb"), col("weight"))
        .otherwise(lit(0L))).cast("long").as("intra_weight"))
    val deg = labeled
      .select(col("__ca").as("__c"),
        when(col("id_a") === col("id_b"), col("weight") * 2)
          .otherwise(col("weight")).cast("long").as("__d"))
      .unionAll(labeled.filter(col("id_a") =!= col("id_b"))
        .select(col("__cb").as("__c"), col("weight").cast("long").as("__d")))
      .groupBy(col("__c")).agg(sum(col("__d")).cast("long").as("__dc"))
    val degSq = deg.agg(sum(col("__dc") * col("__dc")).cast("long")
      .as("__deg_sq"))
    val nClusters = assign.agg(
      countDistinct(col(clusterCol)).as("n_clusters"))
    counts.crossJoin(broadcast(degSq)).crossJoin(broadcast(nClusters))
      .select(col("n_clusters"), col("m_weight"), col("intra_weight"),
        (floor((lit(4L) * col("m_weight") * col("intra_weight")
            - col("__deg_sq")).cast("double")
          / (lit(4.0) * col("m_weight").cast("double")
            * col("m_weight").cast("double")) * 1e9) / 1e9)
          .as("q_modularity"))
  }

  /** Newman modularity of a given vertex partition over an undirected
    * edge list — the quality score for ANY clustering the pipeline
    * produced (connected components, label propagation, embedding
    * clusters): Q = Σ_c [e_c/m − (d_c/2m)²]. Rearranged to
    * Q = (4m·Σe_c − Σd_c²) / 4m², every aggregate is an INTEGER
    * (within-cluster edge count, squared per-cluster degree sums), so
    * the whole score reduces exactly and the only floating step is
    * one final fixed-form division — no per-cluster double summation
    * to go order-nondeterministic at 100 TB. One row out; the
    * shuffles are two edge-sized equi-joins against the assignment
    * plus cluster-keyed aggregates.
    *
    * `edges` must hold each undirected edge ONCE (id_a, id_b);
    * vertices missing from `assign` contribute nothing.
    */
  def modularity(
      assign: DataFrame, idCol: String, clusterCol: String,
      edges: DataFrame): DataFrame = {
    val ea = edges.select(col("id_a"), col("id_b"))
    val labeled = ea
      .join(assign.select(col(idCol).as("id_a"),
        col(clusterCol).as("__ca")), Seq("id_a"))
      .join(assign.select(col(idCol).as("id_b"),
        col(clusterCol).as("__cb")), Seq("id_b"))
    val counts = labeled.agg(
      count(lit(1)).as("m_edges"),
      sum(when(col("__ca") === col("__cb"), 1L).otherwise(0L))
        .as("intra_edges"))
    val degSq = labeled
      .select(col("id_a").as("__v"), col("__ca").as("__c"))
      .unionAll(labeled.select(col("id_b").as("__v"), col("__cb").as("__c")))
      .groupBy(col("__v"), col("__c")).agg(count(lit(1)).as("__deg"))
      .groupBy(col("__c")).agg(sum(col("__deg")).as("__dc"))
      .agg(sum(col("__dc") * col("__dc")).as("deg_sq_sum"))
    val nClusters = assign
      .agg(countDistinct(col(clusterCol)).as("n_clusters"))
    counts.crossJoin(degSq).crossJoin(nClusters)
      .select(col("n_clusters"), col("m_edges"), col("intra_edges"),
        (floor(
          (lit(4L) * col("m_edges") * col("intra_edges")
            - col("deg_sq_sum")).cast("double")
            / (lit(4.0) * col("m_edges").cast("double")
              * col("m_edges").cast("double")) * 1e9) / 1e9)
          .as("q_modularity"))
  }

  /** Deterministic hash-seeded uniform random walks — the DeepWalk /
    * node2vec corpus generator (Perozzi et al., KDD 2014),
    * derandomized so the walk tape replays exactly in any engine: walk
    * `w` standing at node `cur` on step `t` moves to the out-neighbor
    * `dst` minimizing the 60-bit md5 of "start:w:t:cur:dst" (ties by
    * dst) — a fixed uniform-ish choice per (walk, step, node) with no
    * `rand()` nondeterminism. Dead-end nodes simply stop emitting
    * (shorter walk), the standard truncated-walk semantic.
    *
    * Scale shape: walk starts are every distinct node x walksPerNode;
    * each of the FIXED `steps` rounds is one equi-join of the frontier
    * on the edge list's src plus one per-(start,walk) argmin — ids and
    * hashes only through the shuffle, [[graft.Materialize.cut]] per
    * round (bounded lineage, static stage graph). Frontier size is
    * monotone non-increasing, so cost is at most
    * steps x |nodes| x walksPerNode x avg out-degree.
    */
  def hashWalks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      walksPerNode: Int,
      steps: Int): DataFrame = {
    require(walksPerNode >= 1, s"walksPerNode must be >= 1, got $walksPerNode")
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val e = Materialize.cut(edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst")).distinct())
    val nodes = e.select(col("__src").as("__n"))
      .union(e.select(col("__dst").as("__n"))).distinct()
    var cur = nodes
      .select(col("__n").as("start"),
        explode(sequence(lit(0), lit(walksPerNode - 1))).as("walk_id"))
      .select(col("start"), col("walk_id").cast("long").as("walk_id"),
        lit(0L).as("step"), col("start").as("node"))
    val tape = Seq.newBuilder[DataFrame]
    tape += cur
    for (t <- 1 to steps) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("start"), col("walk_id")).orderBy(col("__h"), col("__dst"))
      cur = Materialize.cut(cur
        .join(e, cur("node") === e("__src"))
        .withColumn("__h", graft.functions.TextFunctions.md5Hash60(
          concat_ws(":", col("start"), col("walk_id"), lit(t),
            col("node"), col("__dst"))))
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("start"), col("walk_id"), lit(t.toLong).as("step"),
          col("__dst").as("node")))
      tape += cur
    }
    tape.result().reduce(_.unionByName(_))
  }

  /** HyperANF neighborhood function (Boldi, Rosa & Vigna, WWW 2011):
    * the approximate number of vertex pairs within distance t, for
    * t = 0..maxT, plus the effective diameter read off the curve — the
    * web-graph-scale answer to "how connected is this corpus graph"
    * (crawl reach, near-dup blast radius, fraud-ring span) when exact
    * all-pairs BFS is unthinkable.
    *
    * State per vertex is ONE 64-register HyperLogLog of the ball
    * B(v, t) — the same hash/bucket/rho/estimate math as
    * [[Sketches.hllDistinct]] (m = 64, 60-bit md5 item hash), kept as
    * (vertex, bucket, rank) rows. A round is pure relational algebra:
    * route neighbor registers along edges (one equi-join on the edge
    * list), then a register-wise `max` (one hash aggregate) — HLL
    * union IS per-bucket max, so B(v, t+1) = {v's ball} ∪ neighbors'
    * balls costs O(|E| · m) shuffled (id, byte) rows per round,
    * NEVER the exploded reachability pairs an exact computation would
    * materialize (that's the whole point: at 100 TB the t = 3 pair set
    * dwarfs the edge list; the register table stays |V| × 64 forever).
    * Lineage is cut per round ([[graft.Materialize.cut]]), rounds are
    * fixed, so the stage graph is static for AQE.
    *
    * Per-t totals fold per-vertex estimates through DECIMAL(30,18)
    * (order-independent) and floor-snap at 1e6, so the whole curve —
    * hash, registers, harmonic sums, linear-counting correction —
    * replays bit-for-bit in an external SQL engine (harness q383
    * replays it over exact bounded reachability CTEs).
    *
    * @param vertices one row per vertex (`idCol` unique)
    * @param edges    directed edges; pass both directions for an
    *                 undirected graph. Self-loops are dropped.
    * @param maxT     rounds (hops); the curve is t = 0..maxT
    * @param coverage effective-diameter threshold: the flagged t is
    *                 the smallest with nf(t) >= coverage * nf(maxT)
    * @return (t, nf, ratio, is_eff_diameter) — nf is the estimated
    *         count of pairs (v, u) with dist(v, u) <= t, summed over
    *         all vertices; exactly one row carries the flag
    */
  /** Seed ball registers: each vertex's ball starts as {v} — one
    * (vertex, bucket, rho) row from v's own 60-bit hash, exactly
    * [[Sketches]]' registerTable math.
    */
  /** Seed registers, PACKED (round 13): one array<int> of M slots per
    * vertex (slot = bucket, 0 = empty) instead of one row per (vertex,
    * bucket). Identical (bucket, rho) register content to the old row
    * form; the packing is what lets each round's edge join carry
    * |edges| rows instead of |edges| x M (the q383/q390 rounds were
    * ~16M joined rows at sf0.1, all but 1/64 of them re-routing
    * registers one at a time).
    */
  private def hllBallSeed(verts: DataFrame): DataFrame = {
    val h = graft.functions.TextFunctions.md5Hash60(col("__id").cast("string"))
    val w = expr(s"__h div ${Sketches.M.toLong}")
    Materialize.cut(verts
      .select(col("__id"), h.as("__h"))
      .select(col("__id"),
        pmod(col("__h"), lit(Sketches.M.toLong)).cast("int").as("__b"),
        when(w === 0L, lit(Sketches.WidthBits))
          .otherwise(lit(Sketches.WidthBits + 1) - length(bin(w)))
          .cast("int").as("__m"))
      .select(col("__id"),
        transform(sequence(lit(0), lit(Sketches.M - 1)),
          i => when(i === col("__b"), col("__m")).otherwise(lit(0)))
          .as("__regs")))
  }

  /** One HyperANF round: route neighbor register ARRAYS along edges,
    * merge by the element-wise-max aggregate
    * ([[graft.functions.RegMaxAgg]] — same union as the old per-bucket
    * groupBy/max), cut lineage.
    */
  private def hllBallRound(reg: DataFrame, e: DataFrame): DataFrame = {
    val fromNbr = e
      .join(reg.select(col("__id").as("__dst"), col("__regs")), Seq("__dst"))
      .select(col("__src").as("__id"), col("__regs"))
    Materialize.cut(reg.unionByName(fromNbr)
      .groupBy(col("__id"))
      .agg(graft.functions.Native.regMaxAgg(col("__regs"), Sketches.M)
        .as("__regs")))
  }

  /** Per-vertex ball-size estimate (__id, __est) from a packed register
    * table, with [[Sketches]]' shared small-range correction — used and
    * harmonic sum via [[graft.functions.RegStatsExpr]], identical to
    * the old per-row count + shiftleft sum.
    */
  private def hllBallEst(reg: DataFrame): DataFrame =
    Sketches.withEstimate(reg
      .select(col("__id"),
        graft.functions.Native.regStats(col("__regs")).as("__st"))
      .select(col("__id"), col("__st.used").as("used_registers"),
        col("__st.sum").as("__sum")))
      .select(col("__id"), col("__est"))

  def hyperAnf(
      vertices: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxT: Int = 3,
      coverage: Double = 0.9): DataFrame = {
    require(maxT >= 1 && maxT <= 8, s"maxT must be in [1,8], got $maxT")
    require(coverage > 0.0 && coverage <= 1.0,
      s"coverage must be in (0,1], got $coverage")
    val verts = vertices.select(col(idCol).as("__id")).distinct()
    val e = Materialize.cut(edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .filter(col("__src") =!= col("__dst"))
      .distinct())
    var reg = hllBallSeed(verts)
    // per-t total: per-vertex HLL estimate (shared small-range
    // correction), folded exactly, snapped once
    def nfAt(t: Int): DataFrame =
      hllBallEst(reg)
        .agg(sum(col("__est").cast(DecimalType(30, 18))).cast("double").as("__t"))
        .select(lit(t).as("t"), (floor(col("__t") * 1e6) / 1e6).as("nf"))
    val curve = Seq.newBuilder[DataFrame]
    curve += nfAt(0)
    for (t <- 1 to maxT) {
      reg = hllBallRound(reg, e)
      curve += nfAt(t)
    }
    val nfCurve = curve.result().reduce(_.unionByName(_))
    val last = nfCurve.filter(col("t") === maxT)
      .select(col("nf").as("__last")) // 1 row, broadcast below
    val ratioed = nfCurve.crossJoin(broadcast(last))
      .select(col("t"), col("nf"),
        (floor(col("nf") / col("__last") * 1e9) / 1e9).as("ratio"))
    // ratio(maxT) == 1.0 exactly, so the min() below always has a row
    val effT = ratioed.filter(col("ratio") >= coverage)
      .agg(min(col("t")).as("__eff")) // 1 row, broadcast below
    ratioed.crossJoin(broadcast(effT))
      .select(col("t"), col("nf"), col("ratio"),
        (col("t") === col("__eff")).as("is_eff_diameter"))
  }

  /** Harmonic centrality from the HyperANF ball sketches (Boldi &
    * Vigna's application of [[hyperAnf]]): per vertex,
    *
    *   HC(v) = Σ_{t=1..maxT} (|B(v,t)| − |B(v,t−1)|) / t
    *
    * — each newly-reached vertex contributes 1/distance, the
    * centrality that actually works on disconnected graphs (closeness
    * degenerates there) and the one web-scale ranking uses when exact
    * all-pairs BFS is unthinkable. Same register dataflow as
    * [[hyperAnf]] (edge join + register-wise max per round, |V| × 64
    * state forever); the per-round per-vertex estimates fold into the
    * running HC with one id-keyed join per round. Output snapped at
    * 1e6; the whole computation replays in SQL over exact
    * reachability (harness q390).
    *
    * @return (idCol, harmonic_centrality) — one row per vertex;
    *         isolated vertices score 0
    */
  def hyperAnfCentrality(
      vertices: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxT: Int = 3): DataFrame = {
    require(maxT >= 1 && maxT <= 8, s"maxT must be in [1,8], got $maxT")
    val verts = vertices.select(col(idCol).as("__id")).distinct()
    val e = Materialize.cut(edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .filter(col("__src") =!= col("__dst"))
      .distinct())
    var reg = hllBallSeed(verts)
    var acc = hllBallEst(reg)
      .select(col("__id"), col("__est").as("__prev"), lit(0.0).as("__hc"))
    for (t <- 1 to maxT) {
      reg = hllBallRound(reg, e)
      acc = Materialize.cut(acc
        .join(hllBallEst(reg), Seq("__id"))
        .select(col("__id"), col("__est").as("__prev"),
          (col("__hc") + (col("__est") - col("__prev")) / lit(t.toDouble))
            .as("__hc")))
    }
    acc.select(col("__id").as(idCol),
      (floor(col("__hc") * 1e6) / 1e6).as("harmonic_centrality"))
  }
}

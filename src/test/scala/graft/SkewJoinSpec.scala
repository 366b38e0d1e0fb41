package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0), // hot key
    (4L, "b", 1.0), (5L, "zz", 9.0)                    // zz: no dim row
  ).toDF("id", "k", "v")

  private def dim = Seq(("a", "Alpha"), ("b", "Beta"), ("c", "Gamma"))
    .toDF("k", "name")

  test("salted inner join equals the plain join for every salt count") {
    val plain = facts.join(dim, Seq("k")).select($"id", $"name")
    for (salts <- Seq(1, 2, 16)) {
      val salted = SkewJoin.saltedJoin(facts, dim, Seq("k"), $"id", salts)
        .select($"id", $"name")
      assert(plain.exceptAll(salted).count() === 0 &&
        salted.exceptAll(plain).count() === 0, s"salts=$salts")
    }
  }

  test("salted left join keeps unmatched rows exactly once") {
    val got = SkewJoin.saltedJoin(facts, dim, Seq("k"), $"id", salts = 4,
      joinType = "left")
    assert(got.count() === 5)
    val zz = got.filter($"k" === "zz").select($"name").collect()
    assert(zz.length === 1 && zz.head.isNullAt(0))
  }

  test("unsupported join types are rejected") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(facts, dim, Seq("k"), $"id", 4, joinType = "left_semi")
    }
  }

  test("the physical join keys include the salt") {
    val plan = SkewJoin.saltedJoin(facts, dim, Seq("k"), $"id", salts = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__graft_salt"))
  }

  test("bloomPrunedJoin equals the plain join at any fpp; nulls dropped") {
    val big = ((1 to 500).map(i => (Some(i.toLong % 50), s"r$i"))
      :+ (Option.empty[Long], "nullrow"))
      .toDF("k", "v")
    val small = Seq((3L, "a"), (7L, "b"), (3L, "c"), (44L, "d"))
      .toDF("k", "tag")
    val plain = big.join(small, Seq("k")).collect().map(_.toSeq).toSeq.sortBy(_.toString)
    // even a near-useless filter (fpp 0.5) must not change the answer
    for (fpp <- Seq(0.01, 0.5)) {
      val pruned = SkewJoin.bloomPrunedJoin(big, small, "k", fpp)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(pruned === plain, s"fpp=$fpp")
    }
    // the probe really is in the plan — on a local relation Catalyst
    // folds the filter into the scan at planning time, so check the
    // analyzed plan, and the executed plan of a non-foldable input
    val analyzed = SkewJoin.bloomPrunedJoin(big, small, "k", 0.01)
      .queryExecution.analyzed.toString
    assert(analyzed.contains("graft_bloom_might_contain"))
    // (ConvertToLocalRelation pre-evaluates filters over local
    // relations, so the runtime probe needs a file-backed input)
    val tmp = java.nio.file.Files.createTempDirectory("bloomspec").toString
    big.write.mode("overwrite").parquet(tmp)
    val executed = SkewJoin.bloomPrunedJoin(spark.read.parquet(tmp), small, "k", 0.01)
      .queryExecution.executedPlan.toString
    assert(executed.contains("graft_bloom_might_contain"))
  }

  test("bloomPrunedJoin drops its per-call temp function and honors " +
    "expectedItems") {
    val big = (1 to 100).map(i => (i.toLong % 10, s"r$i")).toDF("k", "v")
    val small = Seq((3L, "a"), (7L, "b")).toDF("k", "tag")
    def bloomFns: Int = spark.sessionState.functionRegistry.listFunction()
      .map(_.funcName).count(_.startsWith("graft_bloom_might_contain_"))
    val before = bloomFns
    val out = SkewJoin.bloomPrunedJoin(big, small, "k", 0.01,
      expectedItems = 2L)
    // registry is clean again — repeated calls no longer grow it
    assert(bloomFns === before)
    // ... but the probe expression is already bound into the plan
    assert(out.queryExecution.analyzed.toString
      .contains("graft_bloom_might_contain"))
    val plain = big.join(small, Seq("k")).collect()
      .map(_.toSeq).toSeq.sortBy(_.toString)
    assert(out.collect().map(_.toSeq).toSeq.sortBy(_.toString) === plain)
  }
}

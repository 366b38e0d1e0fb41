package graft

import org.apache.spark.sql.functions._

import graft.operators.Preference

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("two items: one MM round reaches the closed-form fixed point") {
    // A beats B 3 times, B beats A once. With K=2 and mean-1
    // normalization, wA + wB = 2 every round, so denom = n/2 and
    // w_A = 2a/n = 2*3/4 = 1.5 exactly — a fixed point the MM update
    // must hit after round 1 and hold through round 5.
    val duels = Seq(("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"))
      .toDF("winner", "loser")
    val got = Preference.bradleyTerry(duels, "winner", "loser", rounds = 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    assert(got("A")._1 === 3L && got("B")._1 === 1L)
    assert(got("A")._2 === 4L && got("B")._2 === 4L)
    assert(math.abs(got("A")._3 - 1.5) < 1e-6)
    assert(math.abs(got("B")._3 - 0.5) < 1e-6)
    assert(got("A")._4 === 1 && got("B")._4 === 2)
  }

  test("transitive strength orders items; ratings stay mean-1") {
    // A > B > C by win counts; D never wins
    val duels = Seq(
      ("A", "B"), ("A", "B"), ("A", "C"), ("A", "C"), ("A", "D"),
      ("B", "C"), ("B", "C"), ("B", "A"), ("B", "D"),
      ("C", "D"), ("C", "A")).toDF("winner", "loser")
    val rows = Preference.bradleyTerry(duels, "winner", "loser")
      .orderBy(col("rank")).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("A", "B", "C", "D"))
    // never-winning item is clamped near epsilon, strictly last
    assert(rows.last.getDouble(3) < rows(2).getDouble(3))
    assert(rows.last.getLong(1) === 0L)
    // mean-1 scale: ratings sum to ~K
    val s = rows.map(_.getDouble(3)).sum
    assert(math.abs(s - 4.0) < 1e-3)
  }

  test("winner == loser rows are rejected; nulls are dropped") {
    val duels = Seq(
      (Some("A"), Some("A")), (Some("A"), Some("B")),
      (None, Some("B")), (Some("B"), None))
      .toDF("winner", "loser")
    val rows = Preference.bradleyTerry(duels, "winner", "loser", rounds = 2)
      .collect()
    assert(rows.length === 2) // only the A>B duel counts
    assert(rows.map(_.getLong(2)).toSeq === Seq(1L, 1L))
  }

  test("orientation-summed match counts are symmetric") {
    val duels = Seq(("A", "B"), ("B", "A"), ("A", "B")).toDF("w", "l")
    val got = Preference.bradleyTerry(duels, "w", "l")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("A") === 3L && got("B") === 3L)
  }

  test("dpoPairs: best vs worst per group, gap computed") {
    val rs = Seq(
      (1L, 10L, "a", 0.2), (1L, 11L, "b", 0.9), (1L, 12L, "c", 0.5),
      (2L, 20L, "d", 1.0), (2L, 21L, "e", 3.0))
      .toDF("g", "id", "content", "score")
    val got = Preference.dpoPairs(rs, "g", "id", "content", "score")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getDouble(7))).toMap
    assert(got(1L) === ((11L, 10L, 0.7)))
    assert(got(2L) === ((21L, 20L, 2.0)))
  }

  test("dpoPairs: score ties break on id; all-tied and singleton " +
    "groups emit nothing") {
    val rs = Seq(
      (1L, 10L, "a", 0.5), (1L, 11L, "b", 0.5), (1L, 12L, "c", 0.5),
      (2L, 20L, "d", 7.0),
      (3L, 30L, "e", 0.1), (3L, 31L, "f", 0.1), (3L, 32L, "g", 0.4))
      .toDF("g", "id", "content", "score")
    val rows = Preference.dpoPairs(rs, "g", "id", "content", "score")
      .collect()
    // group 1 all-tied -> one row tops both windows -> dropped;
    // group 2 singleton -> dropped; group 3: chosen 32, rejected
    // ties 30/31 -> lower id 30
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 3L && r.getLong(1) === 32L
      && r.getLong(3) === 30L)
  }

  test("dpoPairs: null scores are excluded before ranking") {
    val rs = Seq(
      (1L, 10L, "a", Some(0.2)), (1L, 11L, "b", None),
      (1L, 12L, "c", Some(0.8)))
      .toDF("g", "id", "content", "score")
    val r = Preference.dpoPairs(rs, "g", "id", "content", "score")
      .collect().head
    assert(r.getLong(1) === 12L && r.getLong(3) === 10L)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val ranges = Seq(
    (0L, 99L, "A"),
    (100L, 199L, "B"),
    // gap 200-299
    (300L, 399L, "C")
  ).toDF("lb", "ub", "country")

  private val tx = Seq(
    (1L, 0L),    // exact lower bound -> A
    (2L, 99L),   // exact upper bound -> A
    (3L, 150L),  // interior -> B
    (4L, 250L),  // in gap -> miss
    (5L, 400L),  // beyond all -> miss
    (6L, 399L)   // exact last ub -> C
  ).toDF("id", "ip")

  test("broadcast range join: bound-inclusive matches, misses null") {
    val got = RangeJoin.rangeJoin(tx, ranges, "ip", "lb", "ub")
      .select($"id", $"country").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "A", 2L -> "A", 3L -> "B", 4L -> null, 5L -> null, 6L -> "C"))
  }

  test("bucketed range join equals broadcast range join") {
    val a = RangeJoin.rangeJoin(tx, ranges, "ip", "lb", "ub")
      .select($"id", $"country")
    val b = RangeJoin.bucketedRangeJoin(tx, ranges, "ip", "lb", "ub", shiftBits = 4)
      .select($"id", $"country")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("as-of backward picks greatest lb <= value, even past ub (merge_asof parity)") {
    val got = RangeJoin.asOfJoinBackward(tx, ranges, "ip", "lb", "id")
      .select($"id", $"country").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 250 as-of matches range starting at 100 (backward), 400 matches 300
    assert(got === Map(1L -> "A", 2L -> "A", 3L -> "B", 4L -> "B", 5L -> "C", 6L -> "C"))
  }

  test("as-of backward with overlapping ranges keeps exactly one match per row") {
    val overlapping = Seq((0L, 500L, "X"), (100L, 600L, "Y")).toDF("lb", "ub", "country")
    val got = RangeJoin.asOfJoinBackward(tx, overlapping, "ip", "lb", "id")
    assert(got.count() === tx.count())
    val m = got.select($"id", $"country").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(3L) === "Y" && m(1L) === "X") // greatest lb wins
  }

  test("as-of backward: duplicate left values each get their own match") {
    val dupTx = Seq((10L, 150L), (11L, 150L), (12L, 50L)).toDF("id", "ip")
    val got = RangeJoin.asOfJoinBackward(dupTx, ranges, "ip", "lb", "id")
      .select($"id", $"country").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(10L -> "B", 11L -> "B", 12L -> "A"))
  }

  test("asOfJoin backward direction equals asOfJoinBackward") {
    val a = RangeJoin.asOfJoinBackward(tx, ranges, "ip", "lb", "id")
      .select($"id", $"country")
    val b = RangeJoin.asOfJoin(tx, ranges, "ip", "lb", "id",
      direction = "backward").select($"id", $"country")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("asOfJoin forward picks smallest lb >= value; past-the-end misses") {
    val got = RangeJoin.asOfJoin(tx, ranges, "ip", "lb", "id",
      direction = "forward")
      .select($"id", $"country").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 0 -> A (lb 0), 99 -> B (lb 100), 150 -> C (lb 300), 250 -> C,
    // 400 -> none ahead, 399 -> none ahead except... lb 300 < 399 -> miss
    assert(got === Map(1L -> "A", 2L -> "B", 3L -> "C", 4L -> "C",
      5L -> null, 6L -> null))
  }

  test("asOfJoin nearest: closest lb wins, equidistant ties go backward") {
    val marks = Seq((0L, "lo"), (100L, "hi")).toDF("lb", "name")
    val probes = Seq((1L, 20L), (2L, 80L), (3L, 50L)).toDF("id", "v")
    val got = RangeJoin.asOfJoin(probes, marks, "v", "lb", "id",
      direction = "nearest")
      .select($"id", $"name").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 50 is equidistant from 0 and 100 -> backward (0, "lo") wins
    assert(got === Map(1L -> "lo", 2L -> "hi", 3L -> "lo"))
  }

  test("asOfJoin nearest: null left value gets the no-match null row, not an arbitrary mark") {
    val marks = Seq((0L, "lo"), (100L, "hi")).toDF("lb", "name")
    val probes = Seq((1L, Some(20L)), (2L, Option.empty[Long])).toDF("id", "v")
    val got = RangeJoin.asOfJoin(probes, marks, "v", "lb", "id",
      direction = "nearest")
      .select($"id", $"name").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === Map(1L -> Some("lo"), 2L -> None))
  }

  test("asOfJoin tolerance voids out-of-range matches to null") {
    val got = RangeJoin.asOfJoin(tx, ranges, "ip", "lb", "id",
      direction = "backward", tolerance = Some(60L))
      .select($"id", $"country").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // within 60 of its backward lb: 0 (dist 0) and 150 (dist 50); 99,
    // 250, 400, 399 sit 99-150 past their lb -> all voided
    assert(got === Map(1L -> "A", 2L -> null, 3L -> "B", 4L -> null,
      5L -> null, 6L -> null))
  }

  test("geolocate voids misses to Unknown sentinel (transform_data.py:38-43)") {
    val named = ranges.withColumnRenamed("lb", "lower_bound_ip_address_int")
      .withColumnRenamed("ub", "upper_bound_ip_address_int")
    val got = RangeJoin.geolocate(tx.withColumnRenamed("ip", "ip_address_int"), named)
      .select($"id", $"country").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(4L) === "Unknown" && got(5L) === "Unknown" && got(3L) === "B")
  }

  test("asOfJoinKeyed: per-entity backward match, no-feature rows keep " +
    "nulls, tie-break pins duplicate as-of times") {
    val left = Seq(
      (1L, "u1", 100L), (2L, "u1", 250L), (3L, "u2", 100L),
      (4L, "u3", 100L)) // u3 has no features at all
      .toDF("row_id", "k", "t")
    val right = Seq(
      ("u1", 50L, "a"), ("u1", 200L, "b"),
      ("u1", 300L, "future"), // after every u1 event: never matches
      ("u2", 100L, "x"), ("u2", 100L, "y")) // duplicate time: tie-break
      .toDF("k", "rt", "feat")
    val got = RangeJoin.asOfJoinKeyed(
      left, right, "k", "k", "t", "rt", "row_id",
      rightTieBreak = Seq("feat"))
      .select(col("row_id"), col("feat")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) === Some("a")) // only rt=50 <= 100
    assert(got(2L) === Some("b")) // rt=200 beats 50; 300 excluded
    assert(got(3L) === Some("x")) // duplicate rt=100 -> smaller feat
    assert(got(4L) === None) // entity with no features: null, not drop
  }
}

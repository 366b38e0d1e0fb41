package graft

import org.apache.spark.sql.functions._

import graft.operators.Merge

/** Merge.upsert / Merge.audit — CDC semantics on a literal snapshot. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val snapshot = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "name", "bal")

  // update 1, delete 2, insert 9, delete-missing 8 (no-op)
  private val delta = Seq(
    (1L, "a", 11.0, "U"), (2L, "b", 20.0, "D"),
    (9L, "z", 90.0, "I"), (8L, "x", 0.0, "D"))
    .toDF("k", "name", "bal", "op")

  test("upsert: update replaces, delete removes, insert appends, missing-delete no-ops") {
    val got = Merge.upsert(snapshot, delta, "k", "op")
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, "a", 11.0), (3L, "c", 30.0), (9L, "z", 90.0)))
  }

  test("audit counts classify every delta row against the snapshot") {
    val got = Merge.audit(snapshot, delta, "k", "op").collect().head
    assert(got.getAs[Long]("n_snapshot") === 3L)
    assert(got.getAs[Long]("n_delta") === 4L)
    assert(got.getAs[Long]("n_inserted") === 1L)
    assert(got.getAs[Long]("n_updated") === 1L)
    assert(got.getAs[Long]("n_deleted") === 1L) // the missing-key D doesn't count
    assert(got.getAs[Long]("n_result") === 3L)
  }
}

package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Referential-integrity audit: orphans and null keys are separate
  * counters, and a consistent pair reports clean.
  */
class ContractsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("referentialAudit: orphans vs null keys, clean pair reports zeros") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(8L), None)
      .toDF("fk")
    val r = Contracts.referentialAudit(child, "fk", parent, "pk", "child->parent")
      .collect().head
    assert(r.getString(0) === "child->parent")
    assert(r.getLong(1) === 6L)  // n_child counts every row incl. null key
    assert(r.getLong(2) === 1L)  // one null key
    assert(r.getLong(3) === 2L)  // 9 and 8 are orphans
    val clean = Contracts.referentialAudit(
      Seq(1L, 2L).toDF("fk"), "fk", parent, "pk", "ok").collect().head
    assert((clean.getLong(1), clean.getLong(2), clean.getLong(3)) === ((2L, 0L, 0L)))
  }

  test("sequenceGapAudit: missing = span - distinct, dupes = rows - distinct") {
    val df = Seq(1L, 2L, 2L, 5L, 7L).toDF("id")
    val r = Contracts.sequenceGapAudit(df, "id", "events-dense").collect().head
    assert(r.getString(0) === "events-dense")
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) === ((5L, 4L, 1L, 7L)))
    assert(r.getLong(5) === 3L) // 3, 4, 6 missing
    assert(r.getLong(6) === 1L) // one duplicate
  }

  test("referentialAudit: duplicate parent keys never inflate the child count") {
    val parent = Seq(1L, 1L, 1L, 2L).toDF("pk")
    val child = Seq(1L, 1L, 2L, 3L).toDF("fk")
    val r = Contracts.referentialAudit(child, "fk", parent, "pk", "dup-parent")
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((4L, 0L, 1L)))
  }
}

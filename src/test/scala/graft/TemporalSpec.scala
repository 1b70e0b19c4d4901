package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.operators.Temporal

/** Pins the as-of join contract (prior-or-equal visibility, equal-ts
  * largest-rid tie-break, left-outer coalescing, same-row struct carry)
  * and the range-count boundaries (inclusive lower, EXCLUSIVE upper,
  * bin-boundary crossing).
  */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf: prior-or-equal match, equal-ts right ties -> max rid, no-match coalesced") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 101L), // equal-ts purchase visible
      (1L, ts("2024-01-01 12:00:00"), 102L), // picks the later purchase
      (1L, ts("2024-01-01 09:00:00"), 103L), // before any purchase
      (2L, ts("2024-01-01 10:00:00"), 104L)  // other user: no purchases
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 201L, 5.0), // two purchases at the
      (1L, ts("2024-01-01 10:00:00"), 202L, 7.0), //   same ts: 202 wins
      (1L, ts("2024-01-01 11:00:00"), 203L, 9.0)
    ).toDF("k", "ts", "rid", "pay")
    val out = Temporal.asOf(left, right).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out(101L) == ((202L, 0L, 7.0)))             // <=, max-rid tie
    assert(out(102L) == ((203L, 3600000000L, 9.0)))    // latest prior
    assert(out(103L) == ((-1L, -1L, 0.0)))             // nothing prior
    assert(out(104L) == ((-1L, -1L, 0.0)))             // key never matches
  }

  test("asOf: carried rid/ts/pay come from the same right row (NULL pay)") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 12:00:00"), 101L)).toDF("k", "ts", "lid")
    // latest purchase has NULL pay; an earlier one has pay — a per-column
    // last(ignoreNulls) would stitch (rid of row 2, pay of row 1)
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 201L, Some(5.0)),
      (1L, ts("2024-01-01 11:00:00"), 202L, None: Option[Double])
    ).toDF("k", "ts", "rid", "pay")
    val r = Temporal.asOf(left, right).collect().head
    assert(r.getLong(2) == 202L)
    assert(r.getDouble(4) == 0.0) // that row's pay was NULL -> coalesced
  }

  test("rangeCount: inclusive lower, exclusive upper, bin-crossing window") {
    import spark.implicits._
    val W = 3600000000L // 1h in us
    val left = Seq((1L, ts("2024-01-01 10:30:00"), 101L)).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00")), // exactly lus - W: INCLUDED
      (1L, ts("2024-01-01 09:29:59")), // just before the window: out
      (1L, ts("2024-01-01 09:45:00")), // previous bin, in window
      (1L, ts("2024-01-01 10:15:00")), // same bin, in window
      (1L, ts("2024-01-01 10:30:00")), // exactly lus: EXCLUDED
      (2L, ts("2024-01-01 10:15:00"))  // other key
    ).toDF("k", "ts")
    val out = Temporal.rangeCount(left, right, W).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(101L -> 3L))
    // zero-match left rows still appear
    val none = Temporal.rangeCount(
      Seq((9L, ts("2024-01-01 10:00:00"), 42L)).toDF("k", "ts", "lid"),
      right, W).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(none.toSeq == Seq((42L, 0L)))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for: the as-of join and the
  * bounded range-count. Both are implemented as EQUI-join/window plans —
  * the naive formulation of either is a `ts <= ts` inequality join, which
  * Spark can only execute as BroadcastNestedLoop/cartesian and which
  * explodes quadratically per key; these shapes are what make the
  * semantics survive a 100 TB event log.
  *
  * The reference pipeline has no temporal joins (SURVEY.md §2.3: "none are
  * range/as-of joins") — these are beyond-inventory operators for the
  * training-data/eventlog side, in the kdb/QuestDB ASOF JOIN and Flink
  * interval-join tradition.
  */
object Temporal {

  /** As-of join: for every left row, the LATEST right row of the same key
    * with `right.ts <= left.ts` (prior-or-equal), left-outer. The classic
    * point-in-time lookup ("state of the user's last purchase when this
    * click happened") that a pair of `groupBy`s cannot express and an
    * inequality join cannot survive.
    *
    * Plan shape: tag both sides, UNION, ONE key-partitioned window ordered
    * by (ts, side, right_id) carrying the last right-side struct forward
    * (`last(..., ignoreNulls)` over UNBOUNDED PRECEDING..CURRENT ROW — a
    * running accumulator, not a buffered frame), then keep left rows. One
    * shuffle on the key, linear work, no join explosion: a user with 10^6
    * events costs one sorted partition pass regardless of the click ×
    * purchase product.
    *
    * Determinism at ties: right rows sort BEFORE left rows at equal ts (so
    * an equal-timestamp right row IS visible, the `<=` contract), and among
    * equal-ts right rows the LARGEST right_id wins (ascending right_id
    * order, last carried). The carried (right_id, right ts, payload) is ONE
    * struct, so all matched fields come from the same right row even when
    * the payload is NULL.
    *
    * Contracts: left = (k, ts, lid) with lid UNIQUE (the Spark side would
    * happily match duplicate-lid rows independently, but the SQL mirror's
    * per-lid window pools them — same contract as [[rangeCount]]);
    * right = (k, ts, rid, pay); k and ts non-null (filter upstream: a NULL
    * key is its own window partition and a NULL ts sorts first, neither is
    * a meaningful match); rid >= 0 — part of the right-side contract (the
    * non-negative-operand convention, like the div-based binning note in
    * [[rangeCount]]): the no-match sentinel below is rid = -1, so a signed
    * hashed rid of -1 would silently collide with it;
    * output = (lid, k, rid, gap_us, pay) with no-match rows coalesced to
    * (rid = -1, gap_us = -1, pay = 0.0) so the result is NULL-free for
    * cross-engine hashing.
    */
  def asOf(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("k"), col("ts"), lit(1).as("side"),
      col("lid"), lit(null).cast("long").as("rid"),
      lit(null).cast("double").as("pay"))
    val r = right.select(col("k"), col("ts"), lit(0).as("side"),
      lit(null).cast("long").as("lid"), col("rid"), col("pay"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ts").asc, col("side").asc, col("rid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("m",
        last(when(col("side") === 0,
          struct(col("rid"), col("ts").as("rts"), col("pay"))),
          ignoreNulls = true).over(w))
    carried.filter(col("side") === 1)
      .select(col("lid"), col("k"),
        coalesce(col("m.rid"), lit(-1L)).as("rid"),
        coalesce(epochUs(col("ts")) - epochUs(col("m.rts")),
          lit(-1L)).as("gap_us"),
        coalesce(col("m.pay"), lit(0.0)).as("pay"))
  }

  /** Microseconds since epoch for TIMESTAMP or TIMESTAMP_NTZ columns.
    * Parquet event logs read as NTZ, which `unix_micros` refuses; the cast
    * interprets the wall clock in the session zone — every graft main pins
    * `spark.sql.session.timeZone` to UTC, making this exactly DuckDB's
    * `epoch_us`. (Gaps and range predicates subtract two casts, so even a
    * non-UTC session only drifts across a DST boundary of that zone.)
    */
  private def epochUs(ts: org.apache.spark.sql.Column) =
    unix_micros(ts.cast("timestamp"))

  /** DuckDB mirror of [[asOf]] (explicit derivation rather than DuckDB's
    * native ASOF JOIN, whose tie order among equal-ts right rows is not
    * specified — this pins max ts then max rid, the [[asOf]] contract).
    * `leftSel`/`rightSel` are subqueries yielding (k, ts, lid) and
    * (k, ts, rid, pay).
    */
  def asOfSql(leftSel: String, rightSel: String): String =
    s"""WITH l AS ($leftSel),
       |r AS ($rightSel),
       |j AS (SELECT l.lid, r.rid, epoch_us(l.ts) - epoch_us(r.ts) AS gap_us,
       |        r.pay,
       |        row_number() OVER (PARTITION BY l.lid
       |          ORDER BY r.ts DESC, r.rid DESC) AS rn
       |      FROM l JOIN r ON r.k = l.k AND r.ts <= l.ts)
       |SELECT l.lid, l.k,
       |  coalesce(j.rid, -1) AS rid,
       |  coalesce(j.gap_us, -1) AS gap_us,
       |  coalesce(j.pay, 0.0) AS pay
       |FROM l LEFT JOIN (SELECT * FROM j WHERE rn = 1) j ON j.lid = l.lid""".stripMargin

  /** Bounded range-count: for every left row, the number of right rows of
    * the same key with `left.ts - window <= right.ts < left.ts` (the
    * Flink interval-join / "clicks in the hour before each purchase"
    * feature). Implemented as a BUCKETED equi-join: right rows land in
    * `floor(ts / window)` bins, each left row probes exactly its own and
    * the previous bin (a window of width W overlaps at most 2 W-aligned
    * bins), then the exact range predicate filters. Candidate blowup is a
    * FIXED ×2, the join is a plain hash equi-join on (k, bin) — versus
    * the inequality join's per-key quadratic product, this is the
    * difference between a shuffle and a cartesian at log scale.
    *
    * Contracts: left = (k, ts, lid) with lid UNIQUE — a HARD precondition:
    * the final step is a left join from the un-deduplicated left spine, so
    * duplicate lids would emit N identical rows (each carrying the merged
    * total) while the SQL mirror's GROUP BY l.lid emits one — the engines
    * diverge on row count if the contract is violated; right = (k, ts);
    * timestamps post-epoch — the
    * bin arithmetic uses `div`, which truncates toward zero, so NEGATIVE
    * epoch micros would bin one off (Spark `div` truncates where DuckDB
    * `//` floors; they only agree on non-negative operands, the same
    * reason every integer mirror in this repo keeps its operands
    * non-negative). `windowUs` in microseconds, > 0.
    * Output (lid, n_in_window), zeros included.
    */
  def rangeCount(left: DataFrame, right: DataFrame,
      windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be > 0, got $windowUs")
    val l = left.select(col("k"), epochUs(col("ts")).as("lus"),
      col("lid"))
    val r = right.select(col("k"), epochUs(col("ts")).as("rus"))
      .withColumn("bin", expr(s"rus div $windowUs"))
    // each left row probes bins floor((lus-W)/W)..floor(lus/W) = 2 bins
    val probes = l.select(col("k"), col("lus"), col("lid"),
      explode(array(expr(s"lus div $windowUs"),
        expr(s"lus div $windowUs - 1"))).as("bin"))
    val hits = probes.join(r, Seq("k", "bin"))
      .filter(col("rus") >= col("lus") - windowUs && col("rus") < col("lus"))
      .groupBy(col("lid")).agg(count(lit(1)).as("n_in_window"))
    l.select(col("lid")).join(hits, Seq("lid"), "left")
      .select(col("lid"),
        coalesce(col("n_in_window"), lit(0L)).as("n_in_window"))
  }

  /** DuckDB mirror of [[rangeCount]] — the direct inequality formulation
    * (fine at oracle scale; the Spark side's bucketing is the point of the
    * operator, and output equality is the check).
    */
  def rangeCountSql(leftSel: String, rightSel: String,
      windowUs: Long): String =
    s"""WITH l AS ($leftSel),
       |r AS ($rightSel)
       |SELECT l.lid, CAST(count(r.k) AS BIGINT) AS n_in_window
       |FROM l LEFT JOIN r ON r.k = l.k
       |  AND epoch_us(r.ts) >= epoch_us(l.ts) - $windowUs
       |  AND epoch_us(r.ts) < epoch_us(l.ts)
       |GROUP BY l.lid""".stripMargin
}

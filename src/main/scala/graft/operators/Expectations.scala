package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative DATA CONTRACT checks — the expectation suite a
  * pipeline runs against every ingested snapshot before anything
  * downstream trusts it: null-rate bounds, key uniqueness, value
  * ranges, accepted-value sets, referential integrity.
  *
  * Scale shape: ALL scalar checks compile into ONE aggregate over a
  * single scan (each check is one codegen'd conditional-sum
  * expression; the 1-row result unpivots into per-check report
  * rows), plus one left-anti join per referential check (dim side
  * broadcast when it fits). A 100 TB contract run therefore costs
  * one pass over the fact table however many scalar expectations it
  * declares — never a scan per check.
  *
  * Violation rates are exact integer micros (⌊10⁶·violations/rows⌋),
  * so a report row is `(check_name, violations, n_rows, rate_micros,
  * threshold_micros, pass)` and an oracle restates it verbatim.
  */
object Expectations {

  sealed trait Check { def name: String; def thresholdMicros: Long }
  /** Null fraction of `column` must stay ≤ threshold. */
  final case class NotNull(column: String, thresholdMicros: Long = 0L)
      extends Check { val name = s"not_null:$column" }
  /** Non-null values of `column` must be distinct. */
  final case class Unique(column: String, thresholdMicros: Long = 0L)
      extends Check { val name = s"unique:$column" }
  /** Values outside [lo, hi] count as violations. */
  final case class InRange(column: String, lo: Double, hi: Double,
      thresholdMicros: Long = 0L)
      extends Check { val name = s"range:$column:$lo-$hi" }
  /** Values outside the accepted set count as violations. */
  final case class AcceptedValues(column: String, values: Seq[String],
      thresholdMicros: Long = 0L)
      extends Check { val name = s"accepted:$column" }
  /** Fact keys absent from the dimension count as violations. */
  final case class RefIntegrity(column: String, dim: DataFrame,
      dimColumn: String, thresholdMicros: Long = 0L)
      extends Check { val name = s"fk:$column" }

  /** Run the suite; one report row per check, ordered by check name. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val scalar = checks.zipWithIndex.collect {
      case (c: NotNull, i) =>
        (c, i, sum(col(c.column).isNull.cast("long")).as(s"__m$i"))
      case (c: Unique, i) =>
        (c, i, (count(col(c.column)) - countDistinct(col(c.column)))
          .as(s"__m$i"))
      case (c: InRange, i) =>
        (c, i, sum((col(c.column) < lit(c.lo) || col(c.column) > lit(c.hi))
          .cast("long")).as(s"__m$i"))
      case (c: AcceptedValues, i) =>
        (c, i, sum((!col(c.column).isin(c.values: _*)).cast("long"))
          .as(s"__m$i"))
    }
    val refs = checks.collect { case c: RefIntegrity => c }

    val report = if (scalar.nonEmpty) {
      val aggExprs = count(lit(1)).as("__n") +: scalar.map(_._3)
      val aggRow = df.agg(aggExprs.head, aggExprs.tail: _*)
      val entries = scalar.map { case (c, i, _) =>
        struct(lit(c.name).as("check_name"),
          coalesce(col(s"__m$i"), lit(0L)).as("violations"),
          lit(c.thresholdMicros).as("threshold_micros"))
      }
      Some(aggRow.select(col("__n"), explode(array(entries: _*)).as("__c"))
        .select(col("__c.check_name").as("check_name"),
          col("__c.violations").as("violations"),
          col("__n").as("n_rows"),
          col("__c.threshold_micros").as("threshold_micros")))
    } else None

    val refReports = refs.map { c =>
      val orphans = df
        .join(broadcast(c.dim.select(col(c.dimColumn).as("__dk")).distinct()),
          col(c.column) === col("__dk"), "left_anti")
        .agg(count(lit(1)).as("violations"))
      val total = df.agg(count(lit(1)).as("n_rows"))
      orphans.crossJoin(total)
        .select(lit(c.name).as("check_name"), col("violations"), col("n_rows"),
          lit(c.thresholdMicros).as("threshold_micros"))
    }

    (report.toSeq ++ refReports)
      .reduce(_ unionByName _)
      .select(col("check_name"), col("violations"), col("n_rows"),
        floor(col("violations") * lit(1000000L) / col("n_rows"))
          .cast("long").as("rate_micros"),
        col("threshold_micros"),
        (floor(col("violations") * lit(1000000L) / col("n_rows"))
          .cast("long") <= col("threshold_micros")).as("pass"))
  }
}

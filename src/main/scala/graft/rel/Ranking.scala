package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed global ranking — the scale-safe replacement for
  * `row_number().over(Window.orderBy(...))` with no partitionBy, which
  * funnels every row through ONE task (the textbook 100×-scale killer,
  * flagged in VERDICT.md r1 "What's wrong" #3).
  *
  * Two-phase plan:
  *  1. range-repartition on the sort key (so partition p holds a
  *     contiguous key range, all of them in parallel),
  *  2. partition-local row_number,
  *  3. per-partition row counts → prefix-sum offsets (nParts rows — a
  *     driver-size aggregate, broadcast back),
  *  4. global rank = local rank + partition offset.
  *
  * The sort columns MUST form a total order (include a unique tiebreaker)
  * or ranks are nondeterministic — both at scale and in the single-task
  * window this replaces.
  */
object Ranking {

  /** Adds `rankCol` = 1-based global rank by `sort` order. */
  def globalRank(df: DataFrame, sort: Seq[Column], rankCol: String,
                 nParts: Int = 0): DataFrame = {
    val parts = if (nParts > 0) nParts
      else df.sparkSession.sparkContext.defaultParallelism
    val parted = df.repartitionByRange(parts, sort: _*)
      .withColumn("__pid", spark_partition_id())
    val local = parted.withColumn("__lrk",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(sort: _*)))
    // nParts rows — the only global window left runs over a partition-count
    // sized table, not the data
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(rankCol, (col("__off") + col("__lrk")).cast("long"))
      .drop("__pid", "__lrk", "__off")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}

/** Plan-shape regression over EVERY registered query (VERDICT r3 next-round
  * #8): for each SparkEntry.queries entry, the optimized/physical plan must
  * contain
  *  - no CartesianProduct (both-sides-big cross join — the 100×-scale
  *    killer; broadcast nested-loop against a tiny broadcast side is
  *    allowed, e.g. the knn probe joins),
  *  - no partition-unbounded Window over DATA (empty partitionSpec is
  *    allowed only for the two-phase Ranking.globalRank offsets window,
  *    whose input is the __pid count aggregate — bounded by partition
  *    count, not rows),
  *  - no literal-array plan blowup (plan size stays O(1) in data/block
  *    count — a bounded tree string).
  */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-planshape-spec")
    .withExtensions(new GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private val dir = "/root/testdata/sf0.001"

  /** globalRank's offsets window: empty partitionSpec whose subtree
    * aggregates on the synthetic __pid — input is partition-count sized. */
  private def isBoundedOffsetsWindow(w: LWindow): Boolean =
    w.child.collectFirst {
      case a: Aggregate if a.groupingExpressions.exists(
        _.references.exists(_.name == "__pid")) => a
    }.isDefined

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"plan shape: $name") {
      try {
        // materialize the shared stage caches first (ctx tables, builder
        // indexes): the steady-state plan reads InMemoryRelations — the
        // same shape a production run has after its stage tables persist.
        // Without this, the inspected tree is the one-off cold lineage of
        // the whole pipeline and its LENGTH measures pipeline complexity,
        // not the per-row blowup this spec guards against.
        fn(spark, dir).count()
        val df = fn(spark, dir)
        val opt = df.queryExecution.optimizedPlan
        // 1. no cartesian product anywhere in the physical plan
        val phys = df.queryExecution.executedPlan.toString
        assert(!phys.contains("CartesianProduct"),
          s"$name: CartesianProduct in the physical plan")
        // 2. every empty-partitionSpec window is the bounded offsets one
        val unbounded = opt.collect {
          case w: LWindow if w.partitionSpec.isEmpty &&
            !isBoundedOffsetsWindow(w) => w
        }
        assert(unbounded.isEmpty,
          s"$name: partition-unbounded window over data:\n" +
            unbounded.map(_.simpleString(120)).mkString("\n"))
        // 3. no literal-array blowup: a per-row/per-block literal list
        // (the r2 sim_cosine_pairs bug: explode(array(lit, lit, …×N)))
        // prints as ONE enormous expression line, while legitimate deep
        // lineage is many moderate lines — so bound the longest LINE, not
        // the tree size (cached stage tables re-print their whole lineage
        // in both the logical and physical tree strings).
        val widest = (opt.treeString + "\n" + phys).linesIterator
          .map(_.length).max
        assert(widest < 20000, s"$name: a plan line is $widest chars wide")
      } finally CacheRegistry.release()
    }
  }
}

package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the operator registries of each package. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.rel.Relational.aggPricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.rel.Relational.queries ++ graft.kg.KgQueries.queries ++
      graft.text.TextOps.queries ++ graft.sim.SimOps.queries ++
      graft.mm.MultiModal.queries ++ graft.streaming.StreamOps.queries ++
      graft.pdf.PdfOps.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB. Queries
    * over sfDir tables reference the driver-registered views directly;
    * queries over engine-internal tables reference the base dumps
    * (`__BASE__`/`__OUT__` are expanded to absolute paths by graft.Verify
    * — see Verify.scala). */
  def oracleSql: Map[String, String] =
    graft.rel.Relational.oracleSql ++ graft.text.TextOps.oracleSql ++
      graft.sim.SimOps.oracleSql ++ graft.kg.KgQueries.oracleSql ++
      graft.mm.MultiModal.oracleSql ++ graft.streaming.StreamOps.oracleSql ++
      graft.pdf.PdfOps.oracleSql

  /** Engine-internal tables dumped by graft.Verify under the `<outDir>.base`
    * sibling dir as oracle inputs (stage tables, signatures, versions). */
  def baseTables: Map[String, (SparkSession, String) => DataFrame] =
    graft.kg.KgQueries.baseTables ++ graft.text.TextOps.baseTables ++
      graft.mm.MultiModal.baseTables ++ graft.pdf.PdfOps.baseTables
}

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
      graft.mm.MultiModal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops (the kg_*
    * queries run over the synthetic KG corpus, not the sfDir tables —
    * their semantics are oracle-tested in ScalaTest instead). */
  def oracleSql: Map[String, String] =
    graft.rel.Relational.oracleSql ++ graft.text.TextOps.oracleSql ++
      graft.sim.SimOps.oracleSql
}

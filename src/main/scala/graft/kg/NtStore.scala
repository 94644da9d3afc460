package graft.kg

import graft.model.Triple
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** N-Triples source/sink — the ingest inverse of the reference's dump.nt
  * teardown (documentrepository.py:1813-1883 writes; a rebuild re-loads
  * the dump into the store). Text lines are embarrassingly parallel:
  * `spark.read.textFile` splits the file, `Triple.fromNt` runs per line —
  * no shuffle until the caller aggregates. */
object NtStore {

  def read(spark: SparkSession, path: String, graph: String = ""): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).flatMap(Triple.fromNt(_, graph)).toDF()
  }

  def write(triples: Dataset[Triple], path: String): Unit = {
    val spark = triples.sparkSession
    import spark.implicits._
    triples.map(Triple.toNt).write.mode("overwrite").text(path)
  }
}

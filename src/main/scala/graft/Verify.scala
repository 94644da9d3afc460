package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Base-table dumps: queries over engine-internal tables (the KG pipeline's
  * triples/docs/linked tables, the mm feature tables, signature tables)
  * have no counterpart in sfDir, so their oracle SQL could never run —
  * round 1 left them `no_oracle`. We dump those tables as parquet under
  * the sibling dir `<outDir>.base/<name>` (NOT under outDir — the driver
  * comparator enumerates outDir subdirs as query outputs, ADVICE r2) and
  * template the oracle SQL: `__BASE__` expands to
  * that absolute path and `__OUT__` to outDir itself (DuckDB reads them via
  * read_parquet, no view registration needed). The oracle then re-derives
  * each query's RELATIONAL logic (joins, closures, aggregations, windows)
  * independently in SQL — per-row parse semantics stay covered by the
  * ScalaTest P/R oracles (ground truth generated independently of the
  * parser, Corpus.scala) and the sha256 input invariant. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Base dumps live in a SIBLING directory, not under outDir: the
    // driver's comparator enumerates outDir subdirectories as query
    // outputs, and a `_base` entry shows up as a spurious no_oracle row
    // (ADVICE r2). Oracle SQL reaches them via the __BASE__ template.
    val baseDir = new java.io.File(outDir).getAbsolutePath + ".base"
    // a failed base dump must fail LOUDLY (VERDICT r3 hygiene): every
    // oracle reading __BASE__/<name> would otherwise compare against
    // stale parquet from a previous run and report a silent mismatch (or
    // worse, a silent match). Dump everything, then exit non-zero.
    val baseFailures = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.baseTables.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$baseDir/$name")
      catch { case e: Throwable =>
        baseFailures += name
        System.err.println(s"[verify] base $name FAILED: ${e.getMessage}")
      }
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        // clear the target FIRST: when outDir is reused (local loops), a
        // failing query must show up as MISSING in the compare, not pass
        // silently against its previous run's parquet. Inside the try so
        // an undeletable file fails THIS query, not the whole run.
        val target = Paths.get(s"$outDir/$name")
        if (Files.exists(target)) {
          val walk = Files.walk(target)
          try {
            import scala.jdk.CollectionConverters._
            walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
          } finally walk.close()
        }
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // builder-local caches die with their query (VERDICT r2 #5)
      finally CacheRegistry.release()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val absOut = new java.io.File(outDir).getAbsolutePath
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        val sql = v.replace("__BASE__", baseDir).replace("__OUT__", absOut)
        s"${q(k)}: ${q(sql)}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (baseFailures.nonEmpty) {
      System.err.println(
        s"[verify] ${baseFailures.size} base dump(s) failed: " +
        baseFailures.mkString(", "))
      sys.exit(2)
    }
  }
}

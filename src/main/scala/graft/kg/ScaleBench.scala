package graft.kg
import org.apache.spark.sql.SparkSession
/** Standalone N-vs-4N KG scaling measurement with warm JVM + per-stage
  * timings (used to produce BENCH_SCALING.md evidence). */
object ScaleBench {
  /** Per-session tmpfs scratch dir for shuffle/spill files. */
  private def localDir(): String = {
    val base = new java.io.File("/dev/shm/graft-local")
    base.mkdirs()
    java.nio.file.Files.createTempDirectory(base.toPath, "s").toString
  }

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"graft-scale-$cpus")
      .withExtensions(new graft.GraftExtensions)
      // FIXED shuffle partition count at every level: with cpus-derived
      // partitioning the two levels run DIFFERENT plans (different task
      // and output-file counts) and the comparison measures plan size,
      // not parallelism. 24 = 6× the widest level's cores.
      .config("spark.sql.shuffle.partitions", "24")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      // shuffle/spill files on tmpfs: with >1 thread the default /tmp
      // (disk) shuffle dir writeback-stalls the materialize stage — the
      // same disk-noise source BENCH_SCALING.md documents for stage
      // tables, but on the shuffle path
      .config("spark.local.dir", localDir())
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(60000L)
    val levels = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(4, 16)
    for (cpus <- levels) {
      val s = session(cpus)
      // tmpfs work dir: the measurement targets the compute path, and
      // /tmp-disk writeback stalls were the dominant run-to-run noise
      val base = new java.io.File("/dev/shm/graft-scale")
      base.mkdirs()
      val wd = java.nio.file.Files.createTempDirectory(base.toPath, s"c$cpus").toString
      KgPipeline.runSynthetic(s, KgPipeline.Conf(workDir = wd + "w",
        n = math.max(1000, n / 8), seed = 42L, runId = "warm"))
      // input materialized untimed (see graft.Bench.kgRun)
      import s.implicits._
      KgPipeline.synthesizeInput(s, n, 42L).write.parquet(wd + "in")
      val input = s.read.parquet(wd + "in").as[graft.model.SourceFile]
      val meter = ConcurrencyMeter.attach(s.sparkContext)
      val r = KgPipeline.run(s, KgPipeline.Conf(workDir = wd,
        n = n, seed = 42L, runId = "meas"), input,
        KgPipeline.sameAsEdges(s, n), KgPipeline.curatedTriples(s, n))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wd))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wd + "w"))
      println(f"cpus=$cpus n=$n triples=${r.tripleCount} sec=${r.durationSec}%.2f tps=${r.triplesPerSec}%.0f busy=${meter.taskSec / r.durationSec}%.1f cpu=${meter.cpuSec / r.durationSec}%.1f")
      println("  stages: " + r.stageSec.toSeq.sortBy(_._1)
        .map { case (k, v) => f"$k=$v%.1f" }.mkString(" "))
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1) — SEPARATE from the
  * frozen graft.Bench: per-query noop-sink isolation, formatted-plan dumps,
  * KG-pipeline stage timings, and a single-threaded micro-profile of the
  * stage-P row function. Never used by the driver; numbers are cited in
  * OPTIMIZATION_r06.md only.
  *
  * Usage:
  *   runMain graft.BenchExtra parse [nDocs]         — per-phase parse profile
  *   runMain graft.BenchExtra pipeline [n] [cpus]   — stage timings
  *   runMain graft.BenchExtra noop <query> [query2 ...]  — noop-sink timing
  *   runMain graft.BenchExtra explain <outDir> [query ...] — plan dumps
  */
object BenchExtra {

  /** Mirror of the frozen Bench.session(): same shuffle/AQE/split shape so
    * measured numbers transfer 1:1. */
  private def session(cpus: Int, fixedShuffle: Option[Int] = None): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        fixedShuffle.map(_.toString).getOrElse((cpus * 3).toString))
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        fixedShuffle.isEmpty.toString)
      .config("spark.sql.files.maxPartitionBytes",
        if (fixedShuffle.isDefined) "16m" else "128m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", {
        val b = new java.io.File("/dev/shm/graft-local"); b.mkdirs()
        java.nio.file.Files.createTempDirectory(b.toPath, "x").toString
      })
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Single-threaded per-phase profile of the parse row function over a
    * synthetic corpus slice (same generator as the bench's KG pipeline). */
  private def parseProfile(nDocs: Int): Unit = {
    val docs = (0L until nDocs.toLong)
      .map(i => graft.kg.Corpus.doc(42L, i, nDocs.toLong).src).toArray
    def pass(label: String): Unit = {
      var tGen, tFsm, tHeader, tSections, tMentions, tXml, tSha = 0.0
      var nTriples, nMentions = 0L
      def timed[T](f: => T, add: Double => Unit): T = {
        val t0 = System.nanoTime(); val r = f
        add((System.nanoTime() - t0) / 1e9); r
      }
      for (src <- docs) {
        val basefileGuess = src.path.replaceAll("^.*/", "")
          .replaceAll("\\..*$", "").replaceAll("\\D", "") match {
          case "" => "0"; case s => s
        }
        val graph = s"${graft.kg.EntityDict.base}/dataset/${src.repo}"
        val tree = timed(graft.parse.RfcParser.parse(src.content, basefileGuess),
          tFsm += _)
        val kids = tree.children
        val header = kids.head.text.getOrElse("")
        var body = tree.copy(children = kids.drop(2)
          .filterNot(c => c.tag == "PreambleSection" &&
            c.attr("title").contains("Table of Contents")))
        val basefile = graft.parse.RfcDoc.rfcNumFromHeader(header)
          .getOrElse(basefileGuess)
        val uri = graft.kg.Coin.rfcUri(basefile)
        val (cleaned, _) = graft.parse.RfcDoc.cleanupBody(body)
        body = cleaned
        val ht = timed(graft.parse.RfcDoc.headerTriples(header, uri, graph, basefile),
          tHeader += _)
        val st = timed(graft.parse.RfcDoc.sectionTriples(body, uri, graph, basefile),
          tSections += _)
        nTriples += ht.size + st.size
        val docId = s"${src.repo}/${src.path}@${src.commit}"
        val ms = timed(graft.parse.RfcDoc.collectMentions(body, src, docId, uri),
          tMentions += _)
        nMentions += ms.size
        timed(graft.parse.TreeNode.toXml(body), tXml += _)
        timed(graft.parse.RfcDoc.sha256Hex(src.content), tSha += _)
      }
      val total = tFsm + tHeader + tSections + tMentions + tXml + tSha
      println(f"[$label] docs=$nDocs triples=$nTriples mentions=$nMentions " +
        f"fsm=$tFsm%.2fs header=$tHeader%.3fs sections=$tSections%.3fs " +
        f"mentions=$tMentions%.2fs toXml=$tXml%.2fs sha=$tSha%.2fs " +
        f"total=$total%.2fs (${total * 1e6 / nDocs}%.0f us/doc)")
    }
    pass("warm1"); pass("warm2"); pass("hot")
  }

  private def pipelineProfile(n: Long, cpus: Int): Unit = {
    import org.apache.spark.sql.SparkSession
    val s = session(cpus, fixedShuffle = Some(24))
    try {
      import s.implicits._
      // input pre-materialized to parquet UNTIMED, exactly like Bench.kgRun
      def inputPath(nn: Long): String = {
        val base = new java.io.File("/dev/shm/graft-bench"); base.mkdirs()
        val p = java.nio.file.Files
          .createTempDirectory(base.toPath, s"input$nn").toString
        graft.kg.KgPipeline.synthesizeInput(s, nn, 42L).write
          .mode("overwrite").parquet(p)
        p
      }
      def once(tag: String, nn: Long, ip: String): graft.kg.KgPipeline.Summary = {
        val base = new java.io.File("/dev/shm/graft-bench"); base.mkdirs()
        val wd = java.nio.file.Files
          .createTempDirectory(base.toPath, tag).toString
        val input = s.read.parquet(ip).as[graft.model.SourceFile]
        val sameAs = graft.kg.KgPipeline.sameAsEdges(s, nn)
        val curated = graft.kg.KgPipeline.curatedTriples(s, nn)
        val conf = graft.kg.KgPipeline.Conf(workDir = s"$wd/out", n = nn,
          seed = 42L, runId = s"extra-$tag",
          broadcastDict = sys.env.getOrElse("SPARK_GRAFT_BCAST", "true").toBoolean)
        val sum = graft.kg.KgPipeline.run(s, conf, input, sameAs, curated)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wd))
        sum
      }
      val warmN = math.max(1000L, n / 8)
      val warmIp = inputPath(warmN)
      once("warm", warmN, warmIp)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warmIp))
      val ip = inputPath(n)
      val sum = once("main", n, ip)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ip))
      println(f"pipeline n=$n cpus=$cpus wall=${sum.durationSec}%.1fs " +
        f"triples=${sum.tripleCount} tps=${sum.triplesPerSec}%.0f")
      println("stages: " + sum.stageSec.toSeq.sortBy(-_._2)
        .map { case (k, v) => f"$k=$v%.1fs" }.mkString(" "))
    } finally s.stop()
  }

  private def noopTime(queries: Seq[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = session(cpus)
    try {
      val reg = SparkEntry.queries
      for (q <- queries; fn <- reg.get(q)) {
        // one warm pass, two timed — mirror of the frozen bench discipline
        def one(): Double = {
          val t0 = System.nanoTime()
          fn(s, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          CacheRegistry.release()
          dt
        }
        s.sparkContext.setJobDescription(s"noop:$q")
        one()
        val (a, b) = (one(), one())
        println(f"$q%-28s noop min=${math.min(a, b)}%.3fs  (p1=$a%.3f p2=$b%.3f)")
      }
    } finally s.stop()
  }

  /** Count-based timing — the SAME action the frozen bench grades, so
    * numbers transfer 1:1 (one warm pass, min of two timed). */
  private def countTime(queries: Seq[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = session(cpus)
    try {
      val reg = SparkEntry.queries
      def one(q: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        fn(s, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        CacheRegistry.release()
        dt
      }
      for (q <- queries; fn <- reg.get(q)) {
        s.sparkContext.setJobDescription(s"time:$q")
        one(q, fn)
        val (a, b) = (one(q, fn), one(q, fn))
        println(f"$q%-28s count min=${math.min(a, b)}%.3fs  (p1=$a%.3f p2=$b%.3f)")
      }
    } finally s.stop()
  }

  private def explainDump(outDir: String, queries: Seq[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = session(cpus)
    try {
      new java.io.File(outDir).mkdirs()
      val reg = SparkEntry.queries
      val names = if (queries.nonEmpty) queries else reg.keys.toSeq.sorted
      for (q <- names; fn <- reg.get(q)) {
        try {
          val plan = fn(s, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/$q.txt"),
            plan.getBytes("UTF-8"))
          println(s"wrote $outDir/$q.txt")
        } catch {
          case e: Throwable => println(s"EXPLAIN FAILED $q: ${e.getMessage}")
        } finally CacheRegistry.release()
      }
    } finally s.stop()
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "parse" :: rest =>
      parseProfile(rest.headOption.map(_.toInt).getOrElse(3000))
    case "pipeline" :: rest =>
      val n = rest.headOption.map(_.toLong).getOrElse(50000L)
      val cpus = rest.lift(1).map(_.toInt).getOrElse(4)
      pipelineProfile(n, cpus)
    case "noop" :: qs if qs.nonEmpty => noopTime(qs)
    case "time" :: qs if qs.nonEmpty => countTime(qs)
    case "explain" :: out :: qs => explainDump(out, qs)
    case _ =>
      System.err.println("usage: parse [n] | pipeline [n] [cpus] | " +
        "noop <q>... | explain <dir> [q...]")
  }
}

package graft.kg

import graft.model.{SourceFile, Triple, Vocab}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end KG-construction pipeline driver (the spark-submit entry the
  * north_rule asks for): parse → link → canonicalize → materialize over the
  * Iceberg-shaped input, each stage persisted as a table under `workDir`,
  * lineage committed after stage data (write-audit-publish order,
  * SURVEY.md §7.5), resumable via the lineage/docs anti-join.
  *
  * The storage format string is isolated here: locally "parquet"; on a real
  * cluster `format=iceberg` is a drop-in (SURVEY.md §7.5 — no Iceberg jars
  * in this sandbox).
  */
object KgPipeline {

  final case class Conf(
      workDir: String,
      n: Long = 1000,
      seed: Long = 42L,
      format: String = "parquet",
      resume: Boolean = false,
      broadcastDict: Boolean = true,
      salt: Int = 8,
      runId: String = "run0")

  final case class Summary(
      inputRows: Long,
      parsedRows: Long,
      failedRows: Long,
      tripleCount: Long,
      mentionCount: Long,
      linkCount: Long,
      durationSec: Double,
      stageSec: Map[String, Double] = Map.empty) {
    def triplesPerSec: Double =
      if (durationSec > 0) tripleCount / durationSec else 0.0
  }

  /** Synthesize the input table on executors — the corpus is a pure
    * function of (seed, i, n), so no driver-side materialization. */
  def synthesizeInput(spark: SparkSession, n: Long, seed: Long,
                      partitions: Int = 0): Dataset[SourceFile] = {
    import spark.implicits._
    // 8x overdecomposition: parse tasks are seconds-long, and coarse
    // partitions make the stage straggler-bound (one slow task = one core
    // idle fleet). Small tasks also give AQE real statistics to work with.
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism * 8
    spark.range(0, n, 1, parts).map(i => Corpus.doc(seed, i, n).src)
  }

  /** Ground-truth triples for the synthesized corpus (P/R oracle). */
  def groundTruth(spark: SparkSession, n: Long, seed: Long): Dataset[Triple] = {
    import spark.implicits._
    val docTruth = spark.range(0, n, 1,
        spark.sparkContext.defaultParallelism)
      .flatMap(i => Corpus.doc(seed, i, n).truth)
    val (_, aliasTruth) = Corpus.aliasTriples(seed, n)
    docTruth.union(spark.createDataset(aliasTruth))
  }

  /** Component representative: prefer the MINTED forms — canonical /rfc/
    * URIs and this engine's own /sfs/ space (a law's rinfo owl:sameAs
    * equivalent must fold INTO the minted act URI, not absorb it) — else
    * lexicographic min. Output only rows that actually change
    * (uri != canon) to keep the rewrite broadcast small.
    *
    * Fast path: the CC output only holds ALIASED vertices (tiny relative
    * to the corpus), so below the same driver byte budget the CC itself
    * uses, the rep pick runs driver-side — one collect instead of a
    * groupBy + join + filter job chain (the chain is driver-serial fixed
    * cost at bench scale). Above budget the distributed shape is
    * unchanged. Both paths produce identical rows (asserted in KgSpec). */
  /** Driver-side rep pick over (uri, minLabelComp) pairs — the exact
    * semantics of the distributed branch below (rank tier, then min
    * string; identity rows dropped). */
  def canonMapLocal(rows: Seq[(String, String)]): Seq[(String, String)] = {
    def rk(uri: String): Int =
      if (uri.contains("/rfc/") ||
        uri.startsWith(s"${EntityDict.base}/sfs/")) 0 else 1
    val rep = rows.groupBy(_._2).map { case (comp, members) =>
      comp -> members.map(_._1).minBy(u => (rk(u), u))
    }
    rows.collect { case (uri, comp) if rep(comp) != uri => (uri, rep(comp)) }
  }

  def canonMap(cc: DataFrame,
               localByteBudget: Long = Cc.LocalByteBudget): DataFrame = {
    val spark = cc.sparkSession
    if (Cc.fitsDriverBudget(cc, "uri", "canon", localByteBudget)) {
      import spark.implicits._
      val rows = cc.select("uri", "canon").as[(String, String)].collect()
      Cc.parallelizePairs(spark, canonMapLocal(rows.toSeq))
    } else {
      val ranked = cc.withColumn("rk",
        when(col("uri").contains("/rfc/") ||
          col("uri").startsWith(s"${EntityDict.base}/sfs/"), lit(0))
          .otherwise(lit(1)))
      ranked.groupBy(col("canon").as("comp"))
        .agg(min(struct(col("rk"), col("uri"))).as("rep"))
        .select(col("comp"), col("rep.uri").as("repUri"))
        .join(cc, col("canon") === col("comp"))
        .select(col("uri"), col("repUri").as("canon"))
        .filter(col("uri") =!= col("canon"))
    }
  }

  /** Run all stages over `input`. Pass `sameAsEdges`/`curated` for the
    * canonicalization inputs (curated alias metadata, sameas.n3 role). */
  def run(spark: SparkSession, conf: Conf, input: Dataset[SourceFile],
          sameAs: DataFrame, curated: DataFrame,
          patches: Option[DataFrame] = None): Summary = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val fmt = conf.format
    val wd = conf.workDir
    val stageSec = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[T](name: String)(f: => T): T = {
      val s = System.nanoTime()
      val r = f
      stageSec.synchronized {
        stageSec(name) = stageSec.getOrElse(name, 0.0) + (System.nanoTime() - s) / 1e9
      }
      r
    }
    // Independent same-stage writes are submitted as CONCURRENT Spark jobs
    // (local scheduler interleaves their tasks): a small write's tail tasks
    // no longer leave the rest of the cores idle.
    import scala.concurrent.{Await, ExecutionContext, Future, blocking}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    def inParallel(fs: (() => Unit)*): Unit =
      Await.result(Future.sequence(fs.map(f => Future(blocking(f())))), Duration.Inf)

    def path(t: String) = s"$wd/$t"
    def write(df: DataFrame, t: String, partitioned: Boolean = false): Unit = {
      val w = df.write.mode("overwrite").format(fmt)
      (if (partitioned) w.partitionBy("repo", "lang") else w).save(path(t))
    }
    def read(t: String): DataFrame = spark.read.format(fmt).load(path(t))
    // Row count of a just-written stage table. For a parquet table with a
    // bounded file count the parquet footers carry the EXACT row counts —
    // summing them driver-side replaces a full count() job (each count is
    // ~constant driver-serial latency that the 4N scaling level pays
    // disproportionately). Falls back to a distributed count() for other
    // formats or once the file count could make driver listing itself the
    // bottleneck (the 100 TB posture: production tables count via write
    // metrics / manifest stats, which this stands in for).
    def tableRowCount(t: String): Long = {
      if (fmt != "parquet") return read(t).count()
      try {
        val hconf = spark.sessionState.newHadoopConf()
        val root = new org.apache.hadoop.fs.Path(path(t))
        val fs = root.getFileSystem(hconf)
        val it = fs.listFiles(root, true)
        val files = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.hadoop.fs.LocatedFileStatus]
        while (it.hasNext) {
          val f = it.next()
          if (f.getPath.getName.endsWith(".parquet")) files += f
        }
        if (files.size > 2048) read(t).count()
        else {
          // footer reads are independent metadata I/O — fan them out on a
          // driver pool so the cost is ~constant instead of
          // files × per-footer latency (driver-serial time is exactly
          // what the 4N scaling level cannot amortize)
          import scala.concurrent.{Await, ExecutionContext, Future, blocking}
          import scala.concurrent.duration.Duration
          implicit val ec: ExecutionContext = ExecutionContext.global
          val sums = files.grouped(math.max(1, files.size / 16)).toSeq.map {
            grp => Future(blocking(grp.iterator.map { f =>
              val r = org.apache.parquet.hadoop.ParquetFileReader.open(
                org.apache.parquet.hadoop.util.HadoopInputFile
                  .fromStatus(f, hconf))
              try r.getRecordCount finally r.close()
            }.sum))
          }
          Await.result(Future.sequence(sums), Duration.Inf).sum
        }
      } catch { case _: Exception => read(t).count() }
    }

    // ---- stage P (with resume: skip rows already parsed with same sha)
    val toParse: Dataset[SourceFile] =
      if (conf.resume && new java.io.File(s"${path("docs")}/_SUCCESS").exists())
        KgStages.pending(input, read("docs"))
      else input
    // In a fresh run inputRows is derived from parsed+failed below — a
    // separate count() would re-run the corpus generator for nothing. In
    // resume mode the pending-set size IS the interesting number (how much
    // work was actually left) and the anti-join is cheap, so count it.
    val pendingRows =
      if (conf.resume) timed("p0_pending_count")(toParse.count()) else -1L

    // patch_if_needed before parse (documentrepository.py:1355-1404):
    // applied patches and conflicts are audited in their own stage table
    val (parseInput, patchedCache) = patches match {
      case None => (toParse, None)
      case Some(pt) =>
        val patched = KgStages.patchStage(toParse, pt).persist()
        timed("p0_patches")(
          patched.filter(col("patchDesc").isNotNull ||
              col("patchError").isNotNull)
            .select("repo", "path", "patchDesc", "patchError")
            .write.mode(if (conf.resume) "append" else "overwrite")
            .format(fmt).save(path("patches")))
        (patched.map(_.toSourceFile), Some(patched))
    }

    val parsed = KgStages.parseStage(parseInput)
    // persist the exploded outputs; ParseOut itself is transient
    val parsedPersisted = parsed.persist()
    val mode = if (conf.resume) "append" else "overwrite"
    def writeMode(df: DataFrame, t: String, partitioned: Boolean = false): Unit = {
      val w = df.write.mode(mode).format(fmt)
      (if (partitioned) w.partitionBy("repo", "lang") else w).save(path(t))
    }
    // first write materializes the persisted ParseOut; everything else in
    // stage P (remaining tables + lineage-after-docs, write-audit-publish
    // order preserved: lineage only reads the already-committed docs table)
    // runs as concurrent jobs against the cache
    timed("p1_parse_docs")(writeMode(KgStages.docsDf(parsedPersisted), "docs"))
    // The C stage depends only on the doc_triples table (p2), so it
    // launches AS SOON AS that commit lands, overlapping the p3/p5 tail
    // instead of waiting for the whole P wave — its driver-serial pieces
    // (the local CC/canon solve) back-fill cores the P tail leaves idle.
    var parsedRows = 0L
    var failedRows = 0L
    inParallel(
      () => {
        timed("p2_doc_triples")(writeMode(KgStages.docTriplesDf(parsedPersisted), "doc_triples"))
        timed("c1_cc") {
          // curated edges + the parse-minted owl:sameAs equivalents
          val allEdges = sameAs.toDF("src", "dst").unionByName(
            read("doc_triples").filter(col("pred") === Vocab.OWL_SAMEAS &&
                !col("objIsLiteral"))
              .select(col("subj").as("src"), col("obj").as("dst")))
          // ONE driver gate for CC + canon: below the byte budget the
          // whole C stage runs driver-side off a single collect (4 Spark
          // jobs: probe ×2, collect, canon write) instead of gating CC
          // and canon separately (7-8 jobs of driver-serial latency —
          // the 4N level's scaling killer). Above budget: the unchanged
          // distributed path.
          val e0 = allEdges.toDF("src", "dst")
            .filter(col("src") =!= col("dst")).persist()
          try {
            val canonDf =
              if (Cc.fitsDriverBudget(e0, "src", "dst", Cc.LocalByteBudget)) {
                val pairs = e0.collect().map(r => (r.getString(0), r.getString(1)))
                Cc.parallelizePairs(spark,
                  canonMapLocal(Cc.localComponentPairs(pairs)))
              } else canonMap(Cc.distributedComponents(e0))
            write(canonDf, "canon")
          } finally e0.unpersist(blocking = false)
        }
      },
      () => timed("p3_mentions")(writeMode(KgStages.mentionsDf(parsedPersisted), "mentions")),
      () => timed("p4_failures")(writeMode(KgStages.failuresDf(parsedPersisted), "failures")),
      () => timed("p5_lineage")(KgStages.lineageDf(read("docs"), "parse", conf.runId)
        .write.mode("append").format(fmt).save(path("lineage"))))
    parsedPersisted.unpersist()
    patchedCache.foreach(_.unpersist())

    val docTriples0 = read("doc_triples")
    val mentions = read("mentions")
    // counts are parquet-footer sums (sub-second) — after the wave so the
    // failures table exists
    parsedRows = timed("p6_counts")(tableRowCount("docs"))
    failedRows = timed("p6_counts")(tableRowCount("failures"))
    // fuzzy label upgrade of publisher literals (ratio >= 0.8)
    val docTriples = KgStages.fuzzyUpgrade(docTriples0,
      EntityDict.publishers, Seq(Vocab.dcterms("publisher")))

    // ---- stages L and M, overlapped. The former linked cache (mention ×
    // dictionary join persisted, then aggregated three ways) is gone:
    // link_triples is a pure mention dedup (it never used `resolved`),
    // deps aggregates mentions FIRST and joins the dictionary once, and
    // skeleton anti-joins the deps targets — one broadcast build instead
    // of the full joined cache. deps/skeleton do not feed materialize, so
    // they run concurrently with the m1 write and back-fill its serial
    // phases (output commit, stage tails).
    inParallel(
      () => {
        timed("l1_link_triples")(write(KgStages.linkTriplesDf(mentions), "link_triples"))
        val finalTriples = KgStages.materialize(
          docTriples, read("link_triples"), curated, read("canon"))
        timed("m1_materialize")(write(finalTriples, "triples", partitioned = true))
      },
      () => {
        val dict = KgStages.entityDictionary(docTriples0)
        timed("l2_deps")(write(
          KgStages.depsFromMentions(mentions, dict,
            broadcastDict = conf.broadcastDict), "deps"))
        timed("l3_skeleton")(write(KgStages.skeletonFromMentions(mentions,
          read("deps").select(col("target"))), "skeleton"))
      })
    val out = read("triples")
    // materialize-stage lineage fold: xxhash64, not sha2 — the fold only
    // needs order-independent stability, and crypto hashing 10^6+ triples
    // per run was a measured fixed cost (input-content sha256 stays
    // cryptographic in the parse lineage, where input_hint requires it)
    var tripleCount = 0L
    var mentionCount = 0L
    var linkCount = 0L
    // lineage-after-triples plus the summary counts are all independent
    // reads of already-committed tables → one concurrent wave
    inParallel(
      () => timed("m2_lineage")(KgStages.lineageDf(
        out.withColumn("sha256", lower(hex(xxhash64(
          col("subj"), col("pred"), col("obj"), col("graph"))))),
        "materialize", conf.runId)
        .write.mode("append").format(fmt).save(path("lineage"))),
      () => { tripleCount = timed("m3_counts")(tableRowCount("triples")) },
      () => { mentionCount = timed("m3_counts")(tableRowCount("mentions")) },
      () => { linkCount = timed("m3_counts")(tableRowCount("link_triples")) })
    val inputRows =
      if (conf.resume) pendingRows else parsedRows + failedRows
    Summary(inputRows, parsedRows, failedRows, tripleCount, mentionCount,
      linkCount, (System.nanoTime() - t0) / 1e9, stageSec.toMap)
  }

  /** Mixed-family input: n RFC text files plus n/4 markdown READMEs plus
    * n/4 HTML pages plus n/4 Swedish statutes — DocParsers path dispatch
    * (first-wins composite semantics) runs inside the driver-verified
    * pipeline, not only in family specs, and the law family's structure
    * sub-resources (#K..P.. sections, SfsParser) flow through linking,
    * deps and the annotations isPartOf closure alongside rfc #S sections.
    * Executor-generated like synthesizeInput. */
  def synthesizeMixedInput(spark: SparkSession, n: Long,
                           seed: Long): Dataset[SourceFile] = {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val rfc = spark.range(0, n, 1, par * 8).map(i => Corpus.doc(seed, i, n).src)
    val md = spark.range(0, n / 4, 1, par)
      .map(i => Corpus.mdDoc(seed, i, n).src)
    val html = spark.range(0, n / 4, 1, par)
      .map(i => Corpus.htmlDoc(seed, i, n).src)
    val law = spark.range(0, n / 4, 1, par)
      .map(i => Corpus.lawDoc(seed, i, n / 4).src)
    val dv = spark.range(0, n / 8, 1, par)
      .map(i => Corpus.dvDoc(seed, i, n / 8, n / 4).src)
    val w3c = spark.range(0, n / 8, 1, par)
      .map(i => Corpus.w3cDoc(seed, i).src)
    val wiki = spark
      .range(0, Corpus.wikiCategoryLabels.length.toLong, 1, par)
      .map(i => Corpus.wikiDoc(i).src)
    val eu = spark.range(0, Corpus.EuActN.toLong, 1, par)
      .map(i => Corpus.euDoc(i).src)
    rfc.union(md).union(html).union(law).union(dv).union(w3c)
      .union(wiki).union(eu)
  }

  /** Swedish-law corpus (the LawRef family), executor-generated like the
    * other families. */
  def synthesizeLawInput(spark: SparkSession, m: Long,
                         seed: Long): Dataset[SourceFile] = {
    import spark.implicits._
    spark.range(0, m, 1, spark.sparkContext.defaultParallelism)
      .map(i => Corpus.lawDoc(seed, i, m).src)
  }

  /** Curated sameAs edges, generated ON EXECUTORS (pure function of the
    * index, like synthesizeInput — a driver-side Vector contradicts the
    * 10^12-file scale argument and shipped 1.3 MiB tasks in round 1). */
  def sameAsEdges(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .flatMap(i => Corpus.sameAsEdgesFor(i)).toDF("src", "dst")
  }

  /** Curated alias-subject triples, executor-generated (see sameAsEdges). */
  def curatedTriples(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .flatMap(i => Corpus.aliasTriplesFor(i).map(_._1)).toDF()
  }

  /** Convenience: synthesize-and-run (bench + tests). */
  def runSynthetic(spark: SparkSession, conf: Conf): Summary =
    run(spark, conf, synthesizeInput(spark, conf.n, conf.seed),
      sameAsEdges(spark, conf.n), curatedTriples(spark, conf.n))

  def main(args: Array[String]): Unit = {
    val opts = args.grouped(2).collect { case Array(k, v) => k -> v }.toMap
    val conf = Conf(
      workDir = opts.getOrElse("--work-dir", "/tmp/graft-kg"),
      n = opts.getOrElse("--n", "1000").toLong,
      seed = opts.getOrElse("--seed", "42").toLong,
      format = opts.getOrElse("--format", "parquet"),
      resume = opts.getOrElse("--resume", "false").toBoolean,
      broadcastDict = opts.getOrElse("--broadcast-dict", "true").toBoolean,
      salt = opts.getOrElse("--salt", "8").toInt,
      runId = opts.getOrElse("--run-id", "run0"))
    // optional curated patch table: parquet with (repo, path, patch, desc)
    val patchDir = opts.get("--patch-dir")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-kg-pipeline")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = run(spark, conf, synthesizeInput(spark, conf.n, conf.seed),
      sameAsEdges(spark, conf.n), curatedTriples(spark, conf.n),
      patchDir.map(spark.read.parquet))
    println(f"""{"inputRows":${s.inputRows},"parsed":${s.parsedRows},""" +
      f""""failed":${s.failedRows},"triples":${s.tripleCount},""" +
      f""""mentions":${s.mentionCount},"links":${s.linkCount},""" +
      f""""sec":${s.durationSec}%.2f,"triplesPerSec":${s.triplesPerSec}%.1f}""")
    System.err.println("stage timings: " + s.stageSec.toSeq.sortBy(_._1)
      .map { case (k, v) => f"$k=$v%.1fs" }.mkString(" "))
    spark.stop()
  }
}

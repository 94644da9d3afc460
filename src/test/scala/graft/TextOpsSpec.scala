package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import graft.text.TextOps

/** Semantic tests for the training-data text operators. Runs on the
  * driver-generated sf0.001/sf0.01 documents tables. */
class TextOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-text-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private val dir = "/root/testdata/sf0.01"

  test("hash64 is stable across runs (pinned values)") {
    // pinned: if these change, every signature-based table silently shifts
    val h1 = TextOps.hash64("hello world", 0x5eed)
    val h2 = TextOps.hash64("hello world", 0x5eed)
    assert(h1 == h2)
    assert(TextOps.hash64("hello world", 1) != h1) // seed matters
    assert(TextOps.hash64("hello worlds", 0x5eed) != h1)
  }

  test("exact jaccard pairs and minhash-LSH pairs agree (recall 1.0 here)") {
    val exact = TextOps.ngramJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = TextOps.minhashLshPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(exact == lsh,
      s"LSH missed ${(exact -- lsh).size}, invented ${(lsh -- exact).size}")
  }

  test("simhash pairs: hamming bound respected; near-dups overlap jaccard pairs") {
    val sim = TextOps.simhashPairs(spark, dir, 3).collect()
    assert(sim.forall(_.getInt(2) <= 3))
    val simSet = sim.map(r => (r.getLong(0), r.getLong(1))).toSet
    val jac = TextOps.ngramJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    info(s"simhash pairs=${simSet.size} jaccard pairs=${jac.size} " +
      s"overlap=${(simSet & jac).size}")
    // 0.9-jaccard doc pairs have near-identical token multisets -> tiny
    // simhash hamming; require the majority of planted dups to be found
    assert((simSet & jac).size * 2 >= jac.size,
      s"simhash found ${(simSet & jac).size} of ${jac.size} planted dups")
  }

  test("fingerprints: deterministic, bounded by token count, dup-sensitive") {
    val a = TextOps.fingerprints(spark, dir).collect()
    val b = TextOps.fingerprints(spark, dir).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.forall(_.getInt(1) >= 0))
    // near-identical docs share most fingerprints -> equal digests are
    // possible but not required; just require nonempty + stable schema
    assert(a.length == 500)
  }

  test("quality + lang-id shapes") {
    val q = TextOps.qualityScore(spark, dir).collect()
    assert(q.length == 500)
    assert(q.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    val l = TextOps.langId(spark, dir).collect()
    assert(l.map(_.getLong(2)).sum == 500)
  }

  test("repetition signals: planted repeats flag, clean prose does not") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-rep").toString
    val repeated = (("spam spam spam line\n\n" * 10) +
      "one unique closing line\n").trim
    val clean = "alpha beta gamma\n\ndelta epsilon zeta\n\neta theta iota"
    // the empty and one-token docs must not crash the 2-gram slice;
    // they simply contribute no rows (same as the oracle's len(w) >= 2)
    Seq((1L, repeated, "en"), (2L, clean, "en"), (3L, "", "en"),
        (4L, "solo", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    try {
      val rows = TextOps.repetitionSignals(spark, tmp).collect()
        .map(r => r.getLong(0) -> r).toMap
      assert(!rows.contains(3L) && !rows.contains(4L))
      val rep = rows(1L)
      assert(rep.getDouble(rep.fieldIndex("dup_line_frac")) > 0.8)
      assert(rep.getString(rep.fieldIndex("top_2gram")) == "spam spam")
      assert(rep.getDouble(rep.fieldIndex("top_2gram_frac")) > 0.20)
      assert(rep.getBoolean(rep.fieldIndex("flagged")))
      val cl = rows(2L)
      assert(cl.getDouble(cl.fieldIndex("dup_line_frac")) == 0.0)
      assert(cl.getDouble(cl.fieldIndex("dup_para_frac")) == 0.0)
      assert(!cl.getBoolean(cl.fieldIndex("flagged")))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("sequence packing: capacity invariant holds on the sharded path") {
    val capacity = 2048
    val packed = TextOps.packSequences(spark, dir, capacity, shards = 8)
      .collect()
    assert(packed.length == 500) // every doc assigned exactly once
    // fill per (lang, shard, bin) respects capacity unless a single
    // oversized doc occupies the bin alone
    packed.groupBy(r => (r.getString(0), r.getInt(1), r.getInt(4)))
      .foreach { case (key, rows) =>
        val fill = rows.map(_.getInt(3)).sum
        assert(fill <= capacity || rows.length == 1, s"$key fill=$fill")
      }
    // greedy invariant: consecutive bins within a shard could not merge
    packed.groupBy(r => (r.getString(0), r.getInt(1))).foreach {
      case (_, rows) =>
        val byBin = rows.sortBy(_.getLong(2)).groupBy(_.getInt(4))
          .toSeq.sortBy(_._1)
        byBin.sliding(2).foreach {
          case Seq((_, a), (_, b)) =>
            assert(a.map(_.getInt(3)).sum + b.head.getInt(3) > capacity)
          case _ => ()
        }
    }
  }

  test("df cap drops one pathological hot key, keeps healthy postings") {
    import spark.implicits._
    // one shingle in 1000 docs would contribute ~500k candidate pairs;
    // the cap removes exactly it and nothing else
    val postings = ((1 to 1000).map(i => (i.toLong, "the same boilerplate")) ++
      Seq((1L, "a rare shingle"), (2L, "a rare shingle"))).toDF("doc_id", "shingle")
    val capped = TextOps.capDf(postings, Seq("shingle"), maxDf = 100)
    assert(capped.filter($"shingle" === "the same boilerplate").count() == 0)
    assert(capped.filter($"shingle" === "a rare shingle").count() == 2)
    // candidate pairs from the capped index are bounded: 1 pair, not ~500k
    val pairs = capped.as("a").join(capped.as("b"),
      $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
    assert(pairs.count() == 1)
    // default cap is a no-op on the healthy corpus: identical pair output
    val full = TextOps.ngramJaccardPairs(spark, dir, maxDf = Int.MaxValue)
      .collect().map(_.toString).toSet
    val defd = TextOps.ngramJaccardPairs(spark, dir).collect()
      .map(_.toString).toSet
    assert(full == defd)
  }

  test("bloom dedup: no false negatives, fp within budget, deterministic") {
    import org.apache.spark.sql.functions._
    val got = TextOps.bloomDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
    val priorH = d.filter(col("doc_id") % 4 =!= 0)
      .select("h").collect().map(_.getString(0)).toSet
    val exact = d.filter(col("doc_id") % 4 === 0 || col("doc_id") % 10 === 1)
      .collect()
      .map(r => r.getLong(0) -> priorH.contains(r.getString(1))).toMap
    assert(got.keySet == exact.keySet && got.nonEmpty)
    // a true duplicate can never probe novel
    exact.foreach { case (id, seen) => if (seen) assert(got(id)) }
    // dup pairs exist across the split in this corpus
    assert(exact.values.exists(identity))
    // false-positive count within ~3x the 3% fpp budget
    val novel = exact.count(!_._2)
    val fps = exact.count { case (id, seen) => !seen && got(id) }
    assert(fps <= math.max(3, (0.09 * novel).toInt),
      s"$fps false positives over $novel novel docs")
    assert(TextOps.bloomDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap == got)
  }

  test("bloom dedup: sharded path (budget gate flipped) keeps fn=0 " +
       "and the fp budget") {
    import org.apache.spark.sql.functions._
    // a 1-byte budget forces the sharded build no matter the history
    // size — the gate the r4 verdict asked to be flippable by spec
    val sharded = TextOps.bloomDedup(spark, dir, broadcastByteBudget = 1L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
    val priorH = d.filter(col("doc_id") % 4 =!= 0)
      .select("h").collect().map(_.getString(0)).toSet
    val exact = d.filter(col("doc_id") % 4 === 0 || col("doc_id") % 10 === 1)
      .collect()
      .map(r => r.getLong(0) -> priorH.contains(r.getString(1))).toMap
    assert(sharded.keySet == exact.keySet && sharded.nonEmpty)
    // sharding can never lose a true duplicate
    exact.foreach { case (id, seen) => if (seen) assert(sharded(id),
      s"sharded filter false-negative on doc $id") }
    assert(exact.values.exists(identity))
    val novel = exact.count(!_._2)
    val fps = exact.count { case (id, seen) => !seen && sharded(id) }
    assert(fps <= math.max(3, (0.09 * novel).toInt),
      s"$fps false positives over $novel novel docs (sharded)")
    // deterministic: shard build + cogroup probe is order-insensitive
    assert(TextOps.bloomDedup(spark, dir, broadcastByteBudget = 1L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap == sharded)
  }

  test("jsonl export: parseable round-trip, fields intact") {
    import org.apache.spark.sql.functions._
    val out = TextOps.jsonlExport(spark, dir)
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val back = out.select(
        from_json(col("jsonl"),
          org.apache.spark.sql.types.StructType(
            schema.fields.sortBy(f =>
              Seq("doc_id", "lang", "source", "n_chars", "text")
                .indexOf(f.name)))).as("d"))
      .select("d.doc_id", "d.text", "d.lang", "d.source", "d.n_chars")
    val orig = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
    // one compact object per line, no raw newlines inside
    out.collect().foreach { r =>
      val s = r.getString(1)
      assert(s.startsWith("{\"doc_id\":") && !s.contains("\n"))
    }
  }

  test("tfidf top-k: exact against a local recompute") {
    val rows = TextOps.tfidfTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val tf = texts.map { case (id, t) =>
      id -> t.trim.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.toMap
    val n = texts.length
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size).toMap
    val expected = tf.flatMap { case (id, counts) =>
      counts.toSeq.map { case (term, c) =>
        val idfMicro = math.round(
          math.log((n + 1.0) / (df(term) + 1.0)) * 1e6)
        (id, term, c, c * idfMicro)
      }.sortBy { case (_, term, _, m) => (-m, term) }
        .take(5).zipWithIndex.map { case ((_, term, c, m), i) =>
          (id, i + 1, term, c,
            BigDecimal(m).bigDecimal.movePointLeft(6)
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue)
        }
    }.toSeq.sortBy(r => (r._1, r._2))
    assert(rows.toSeq == expected)
  }

  test("lr quality: deterministic training, sane scores") {
    val rows = TextOps.lrQuality(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2),
        r.getBoolean(3)))
    assert(rows.length == 500)
    rows.foreach { case (_, s, y, pred) =>
      assert(s >= 0.0 && s <= 1.0)
      assert(y == 0 || y == 1)
      assert(pred == (s >= 0.5))
    }
    // the weights actually moved off the origin (scores not all 0.5)
    assert(rows.map(_._2).distinct.length > 1)
    assert(rows.exists(_._2 != 0.5))
    // labels match the heuristic flag the classifier distills
    val flags = TextOps.qualityScore(spark, dir)
      .select("doc_id", "low_quality").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    rows.foreach { case (id, _, y, _) => assert((y == 1) == flags(id)) }
    // 3 full-batch GD steps descend the logloss vs the w=0 start (ln 2)
    def ll(p: Double, y: Int): Double = {
      val q = math.min(math.max(p, 1e-6), 1 - 1e-6)
      -(y * math.log(q) + (1 - y) * math.log(1 - q))
    }
    val loss = rows.map { case (_, s, y, _) => ll(s, y) }.sum / rows.length
    assert(loss < math.log(2.0), s"logloss $loss did not descend")
    // deterministic across runs
    assert(TextOps.lrQuality(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      rows.map(r => (r._1, r._2)).toSeq)
  }

  test("ppl buckets: exact per-language terciles of the LM score") {
    val rows = TextOps.pplBuckets(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getInt(3), r.getString(4)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, _, b, n) =>
      b >= 1 && b <= 3 &&
        n == Seq("head", "middle", "tail")(b - 1) })
    // recompute ntile(3) locally under the same (score, id) total order
    rows.groupBy(_._2).foreach { case (_, members) =>
      val sorted = members.sortBy(m => (m._3, m._1))
      val n = sorted.length
      sorted.zipWithIndex.foreach { case (m, i) =>
        // SQL ntile: first (n mod 3) buckets get ceil(n/3), rest floor
        val big = n % 3
        val cap = n / 3 + 1
        val expected =
          if (big == 0) i / math.max(1, n / 3) + 1
          else if (i < big * cap) i / cap + 1
          else big + (i - big * cap) / (n / 3) + 1
        assert(m._4 == math.min(expected, 3),
          s"doc ${m._1}: bucket ${m._4} != $expected (n=$n, i=$i)")
      }
    }
  }

  test("pii redact: planted spans are counted and masked, none survive") {
    val rows = TextOps.piiRedact(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(rows.length == 500)
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    val phone = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}".r
    val ip = "([0-9]{1,3}\\.){3}[0-9]{1,3}".r
    rows.foreach { case (id, ne, np, ni, red) =>
      if (id % 5 == 0) assert(ne >= 1 && red.contains("<EMAIL>"))
      if (id % 7 == 0) assert(np >= 1 && red.contains("<PHONE>"))
      if (id % 11 == 0) assert(ni >= 1 && red.contains("<IP>"))
      assert(email.findFirstIn(red).isEmpty, s"doc $id leaks an email")
      assert(phone.findFirstIn(red).isEmpty, s"doc $id leaks a phone")
      assert(ip.findFirstIn(red).isEmpty, s"doc $id leaks an ip")
    }
  }

  test("span dedup: first occurrence survives, reassembly is ordered") {
    val rows = TextOps.spanDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(rows.size == 500)
    // block accounting: kept <= total, and the corpus' exact-duplicate
    // documents guarantee some losses
    assert(rows.values.forall { case (nb, nk, _) => nk <= nb && nb > 0 })
    assert(rows.values.exists { case (nb, nk, _) => nk < nb })
    // a document whose every block is globally first keeps its full
    // text verbatim (blocks rejoin with single spaces)
    val docsDf = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val fullyKept = rows.collect {
      case (id, (nb, nk, txt)) if nb == nk => (id, txt)
    }
    assert(fullyKept.nonEmpty)
    fullyKept.foreach { case (id, txt) => assert(txt == docsDf(id)) }
    // and an exact-duplicate pair: the later doc loses ALL its blocks
    val dupLoser = rows.collect {
      case (id, (nb, nk, txt)) if nk == 0 => (id, txt)
    }
    dupLoser.foreach { case (_, txt) => assert(txt == "") }
  }

  test("c4 filters: tripwires fire on planted docs, kept pages end in a terminator") {
    val res = TextOps.c4Filters(spark, dir).collect()
    assert(res.length == 500)
    res.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Boolean]("has_lorem") == (id % 31 == 0))
      assert(r.getAs[Boolean]("has_brace") == (id % 17 == 0))
      val kept = r.getAs[Boolean]("kept")
      assert(kept == (r.getAs[Long]("n_sentences") >= 3 &&
        id % 31 != 0 && id % 17 != 0))
      if (kept) {
        val cleaned = r.getAs[String]("cleaned")
        assert(cleaned.endsWith("."), s"doc $id cleaned ends: ...${cleaned.takeRight(10)}")
        // retained text = complete 10-word sentences only
        assert(cleaned.split("\\. ").forall(_.split(" ").length == 10))
      } else assert(r.getAs[String]("cleaned") == null)
    }
    assert(res.count(_.getAs[Boolean]("kept")) > 0)
    assert(res.count(!_.getAs[Boolean]("kept")) > 0)
  }

  test("url filter: exact and subdomain blocklist hits, others pass") {
    val res = TextOps.urlFilter(spark, dir).collect()
    assert(res.length == 500)
    res.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val blocked = r.getAs[Boolean]("blocked")
      id % 13 match {
        case 0 => assert(blocked &&
          r.getAs[String]("matched_entry") == "spam.example.com" &&
          r.getAs[String]("category") == "adult")
        case 1 => assert(blocked && // subdomain suffix match
          r.getAs[String]("host") == "shop.spam.example.com" &&
          r.getAs[String]("matched_entry") == "spam.example.com")
        case 2 => assert(blocked &&
          r.getAs[String]("category") == "ads")
        case _ => assert(!blocked &&
          r.getAs[String]("matched_entry") == null)
      }
      assert(r.getAs[String]("url") ==
        s"https://${r.getAs[String]("host")}/doc/$id")
    }
  }

  test("bm25: AND semantics, dense ranks, local brute-force re-scoring agrees") {
    val terms = Seq("join", "vector")
    val res = TextOps.bm25Search(spark, dir, terms).collect()
    assert(res.nonEmpty)
    // dense 1-based ranks, ES pagination
    assert(res.map(_.getAs[Long]("rk")).toSeq == (1L to res.length).toSeq)
    assert(res.forall(r =>
      r.getAs[Int]("page") == math.ceil(r.getAs[Long]("rk") / 10.0).toInt))
    // brute-force BM25 on the driver from the raw text (same JVM ln, so
    // scores must agree EXACTLY, not just approximately)
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> "\\S+".r.findAllIn(r.getString(1).trim).toSeq)
    val n = corpus.length
    val avgdl = corpus.map(_._2.length.toLong).sum.toDouble / n
    val df = terms.map(t =>
      t -> corpus.count(_._2.contains(t))).toMap
    val idfMicro = terms.map(t => t -> math.round(
      math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) * 1e6)).toMap
    // math.round rounds half-up like Spark's round; recompute exactly
    val idfM = terms.map(t => t -> math.round(
      math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) * 1e6).toDouble).toMap
    val expected = corpus.flatMap { case (id, toks) =>
      val tfs = terms.map(t => t -> toks.count(_ == t).toLong)
      if (tfs.exists(_._2 == 0L)) None else {
        val dl = toks.length
        val score = tfs.map { case (t, tf) =>
          math.round(idfM(t) * tf * (TextOps.Bm25K1 + 1.0) /
            (tf + TextOps.Bm25K1 * (1.0 - TextOps.Bm25B +
              TextOps.Bm25B * dl / avgdl)))
        }.sum
        Some((id, dl, score))
      }
    }.sortBy { case (id, _, s) => (-s, id) }
    assert(idfMicro == idfM.map { case (k, v) => k -> v.toLong })
    assert(res.length == expected.length)
    res.zip(expected).foreach { case (r, (id, dl, scoreMicro)) =>
      assert(r.getAs[Long]("doc_id") == id)
      assert(r.getAs[Int]("dl") == dl)
      assert(r.getAs[Double]("score") ==
        BigDecimal(scoreMicro / 1e6).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("snippets: fragments window the term, second fragment past the first") {
    val term = "customer"
    val res = TextOps.searchSnippets(spark, dir, term).collect()
    assert(res.nonEmpty)
    assert(res.map(_.getAs[Long]("rk")).toSeq == (1L to res.length).toSeq)
    res.foreach { r =>
      assert(r.getAs[Long]("n_hits") >= 1L)
      val f1 = r.getAs[String]("frag1")
      assert(f1.length <= 150 && f1.contains(term))
      Option(r.getAs[String]("frag2")).foreach { f2 =>
        assert(f2.length <= 150 && f2.contains(term))
      }
    }
    // ranked by hit count (ties by doc_id): non-increasing n_hits
    val hits = res.map(_.getAs[Long]("n_hits"))
    assert(hits.zip(hits.tail).forall { case (a, b) => a >= b })
  }
}

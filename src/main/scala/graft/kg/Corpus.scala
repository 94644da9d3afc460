package graft.kg

import graft.model.{SourceFile, Triple, Vocab}

/** Deterministic synthetic corpus generator.
  *
  * Produces the Iceberg-shaped input table (repo, path, commit, lang,
  * content) of BASELINE.json's input_hint: RFC-like plain-text documents in
  * the shapes recognized by the reference parser
  * (/root/reference/ferenda/sources/tech/rfc.py:133-452 — header block,
  * centered title, preamble sections, numbered sections, `o  ` list items,
  * pagebreak lines with \f, embedded citations per
  * /root/reference/ferenda/citationpatterns.py:16-36).
  *
  * Each document is generated from a per-doc splitmix64 stream seeded by
  * (seed, index) only, so generation is order-independent and can run on
  * executors via `spark.range(n).map(i => Corpus.doc(seed, i, n))` — the
  * corpus never has to exist on the driver, which is what makes the
  * 10^12-file scale claim honest.
  *
  * Alongside every document the generator emits the GROUND-TRUTH triples
  * the reference implementation would distill from it (the role of ferenda's
  * golden distilled .ttl fixtures, /root/reference/ferenda/testutil.py:
  * 648-668). The P/R>=0.95 gate (BASELINE.json) is scored against these.
  * Ground truth is produced from the *generation plan*, not by running our
  * parser — the two sides are independent by construction.
  *
  * Skew: repo assignment is deliberately pathological — ~35% of all files
  * land in one mega-repo (north_rule: "AQE skew handling for pathological
  * mega-repos"); the rest spread over ~40 long-tail repos.
  */
object Corpus {

  // ------------------------------------------------------------------ PRNG
  /** splitmix64 — public-domain mixing constants (Steele et al.). */
  final class Rng(seed0: Long) {
    private var state = seed0
    def nextLong(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    /** uniform in [0, n) */
    def nextInt(n: Int): Int = (Math.floorMod(nextLong(), n.toLong)).toInt
    def nextBool(p: Double): Boolean = (nextInt(10000) / 10000.0) < p
    def pick[T](xs: IndexedSeq[T]): T = xs(nextInt(xs.length))
  }

  // ------------------------------------------------------- vocabulary pools
  private val words = Vector(
    "packet", "stream", "session", "token", "header", "payload", "route",
    "gateway", "proxy", "cache", "digest", "handshake", "cipher", "frame",
    "socket", "buffer", "lease", "registry", "binding", "option", "flag",
    "window", "segment", "octet", "label", "prefix", "scope", "policy",
    "timer", "retry", "probe", "origin", "relay", "anchor", "zone")
  private val verbs = Vector(
    "defines", "updates", "describes", "specifies", "extends", "clarifies",
    "deprecates", "introduces", "documents", "standardizes")
  private val titleWords = Vector(
    "Mechanism", "Extension", "Protocol", "Format", "Profile", "Framework",
    "Procedure", "Scheme", "Registry", "Considerations")
  private val surnames = Vector(
    "Fielding", "Berners-Lee", "Mockapetris", "Postel", "Bradner", "Crocker",
    "Rosenberg", "Schulzrinne", "Rekhter", "Deering", "Hinden", "Droms")
  private val initials = "ABCDEFGHJKLMNPRSTW"
  private val monthNames = Vector("January", "February", "March", "April",
    "May", "June", "July", "August", "September", "October", "November",
    "December")
  private val sectionTitles = Vector(
    "Introduction", "Terminology", "Protocol Overview", "Message Format",
    "Error Handling", "Security Considerations", "IANA Considerations",
    "Operational Notes", "Deployment", "Examples")
  /** publisher header lines; some are deliberate typos/variants of the
    * canonical labels in EntityDict.publishers so the fuzzy (Jaccard/ratio)
    * linking path is exercised (documentrepository.py:539-545 cutoff 0.8). */
  private val publisherLines = Vector(
    "Internet Engineering Task Force (IETF)",    // exact
    "Internet Engineering Task Force",           // exact (short form)
    "Network Working Group",                     // exact
    "Internet Engineering Task Force (IETF)",    // weight the common one
    "Internet Enginering Task Force (IETF)",     // typo -> fuzzy
    "Network Working Group ")                    // trailing space -> fuzzy
  private val categories = Vector(
    "Standards Track", "Informational", "Experimental",
    "Best Current Practice", "Historic")
  private val langs = Vector("en", "en", "en", "en", "en", "en", "sv", "de")
  /** Accented title lead-words for sv/de docs — exercises the
    * locale-collated TOC sort (reference sorts with locale.strxfrm under
    * collate_locale, documentrepository.py:2924-2932, 193-195): under ICU
    * sv collation å/ä/ö sort AFTER z; binary/ASCII sorts them before 'a'
    * of the next codepage. Mixed with plain words so orders interleave. */
  private val svTitleWords = Vector(
    "Ängsmark", "Översikt", "Åtkomst", "Zon", "Älv", "Avtal", "Önskemål",
    "Ordning", "Ärende", "Villkor")
  private val deTitleWords = Vector(
    "Übertragung", "Größe", "Ämter", "Zugriff", "Öffnung", "Ablauf")
  private val urls = Vector(
    "http://example.com/registry/params",
    "https://example.net/spec/v2",
    "http://example.org/archive/notes.txt")

  final val megaRepo = "repo-mega"
  final val nTailRepos = 40

  /** canonical RFC number for document index i (stable, collision-free). */
  def rfcNum(i: Long): Long = 1000L + i

  // ------------------------------------------------------------- structures
  /** Everything generated for one document: the input row plus the triples
    * the reference would distill (post-canonicalization form uses canonical
    * RFC URIs throughout — citations always format to the canonical URI). */
  final case class GenDoc(src: SourceFile, truth: Vector[Triple])

  /** Curated owl:sameAs edges contributed by document i (empty for most;
    * the role of the reference's curated sameas.n3,
    * /root/reference/ferenda/sources/legal/eu/res/extra/sameas.n3:42-77):
    * every 7th document also has 1-2 legacy alias URIs chained
    * alias2 -> alias1 -> canonical, exercising multi-hop CC.
    * Pure function of i — generated ON EXECUTORS via
    * `spark.range(n).flatMap(sameAsEdgesFor)`, never as a driver Vector
    * (a 10^12-file corpus has 10^11 alias edges). */
  def sameAsEdgesFor(i: Long): Seq[(String, String)] =
    if (i % 7 != 0) Nil
    else {
      val canon = EntityDict.canonicalRfcUri(rfcNum(i).toString)
      val a1 = s"${EntityDict.base}/legacy/rfc${rfcNum(i)}"
      val head = (a1, canon)
      if (i % 21 == 0)
        Seq(head, (s"${EntityDict.base}/old/ietf-doc-${rfcNum(i)}", a1))
      else Seq(head)
    }

  /** Driver-side collection for small-n tests. */
  def sameAsEdges(seed: Long, n: Long): Vector[(String, String)] =
    (0L until n).flatMap(sameAsEdgesFor).toVector

  /** Curated metadata of document i published under its alias URI (what
    * canonicalization must fold into the canonical graph): (raw triple,
    * ground-truth triple with the canonical subject). Pure function of i —
    * executor-generable like [[sameAsEdgesFor]]. */
  def aliasTriplesFor(i: Long): Seq[(Triple, Triple)] =
    if (i % 7 != 0) Nil
    else {
      val g = s"${EntityDict.base}/dataset/curated"
      val canon = EntityDict.canonicalRfcUri(rfcNum(i).toString)
      val alias = s"${EntityDict.base}/legacy/rfc${rfcNum(i)}"
      val t = Triple.lit(alias, Vocab.SKOS_ALT, s"Legacy RFC ${rfcNum(i)}", g)
      Seq((t, t.copy(subj = canon)))
    }

  /** Driver-side collection for small-n tests. */
  def aliasTriples(seed: Long, n: Long): (Vector[Triple], Vector[Triple]) = {
    val pairs = (0L until n).flatMap(aliasTriplesFor)
    (pairs.map(_._1).toVector, pairs.map(_._2).toVector)
  }

  // ---------------------------------------------------- version history
  /** One archived version of a source file (list_versions/archive axis,
    * /root/reference/ferenda/documentstore.py:622-693, 787-825). */
  final case class VersionRow(repo: String, path: String, commit: String,
      seq: Int, sha256: String, committedAt: String)

  /** Deterministic version history for document i: 1-3 commits per file,
    * seq ascending (highest = current), committedAt an ISO date monotone
    * in seq (the store's archive timestamps — temporal as-of resolution,
    * documentstore.py:622-693). Pure function of (seed, i, n) —
    * executor-generable. sha256 differs per version (content changed). */
  def versionsFor(seed: Long, i: Long, n: Long): Seq[VersionRow] = {
    val r = new Rng(seed ^ (i * 0xd6e8feb86659fd93L) ^ 0x8febc10735a2b9edL)
    val d = doc(seed, i, n)
    val nVersions = 1 + r.nextInt(3)
    val epochDay = 18262L + (i * 13 % 1000) // 2020-01-01 + per-file offset
    (0 until nVersions).map { v =>
      val commit =
        if (v == nVersions - 1) d.src.commit // latest = the corpus commit
        else f"c${r.nextLong() & 0xffffffffL}%08x"
      val sha =
        if (v == nVersions - 1)
          graft.parse.RfcDoc.sha256Hex(d.src.content)
        else f"${r.nextLong()}%016x${r.nextLong()}%016x" +
          f"${r.nextLong()}%016x${r.nextLong()}%016x"
      val committedAt =
        java.time.LocalDate.ofEpochDay(epochDay + v * 90L).toString
      VersionRow(d.src.repo, d.src.path, commit, v, sha, committedAt)
    }
  }

  // ----------------------------------------------------------- doc assembly
  private def wrap(text: String, indent: String, width: Int = 69): String = {
    val sb = new StringBuilder
    var line = new StringBuilder(indent)
    for (w <- text.split(" ")) {
      if (line.length + w.length + 1 > width && line.length > indent.length) {
        sb.append(line).append('\n'); line = new StringBuilder(indent)
      }
      if (line.length > indent.length) line.append(' ')
      line.append(w)
    }
    sb.append(line).toString
  }

  private def sentence(r: Rng): String = {
    val n = 6 + r.nextInt(8)
    val ws = (0 until n).map(_ => r.pick(words))
    s"The ${ws.head} ${r.pick(verbs)} the ${ws.tail.mkString(" ")}."
  }

  /** One embedded citation; returns (text fragment, target URI). */
  private def citation(r: Rng, selfNum: Long, n: Long): (String, String) = {
    val target = rfcNum(Math.floorMod(r.nextLong(), n))
    r.nextInt(4) match {
      case 0 => (s"RFC $target", EntityDict.canonicalRfcUri(target.toString))
      case 1 => (s"[RFC$target]", EntityDict.canonicalRfcUri(target.toString))
      case 2 =>
        val sec = s"${1 + r.nextInt(5)}.${1 + r.nextInt(4)}"
        (s"section $sec of RFC $target",
          EntityDict.canonicalRfcUri(target.toString) + s"#S$sec")
      case _ =>
        val u = r.pick(urls)
        (s"see $u", u)
    }
  }

  // ------------------------------------------------------- eulaw citations
  private val euInstitutions = Vector(
    "rådets", "Europaparlamentets och rådets", "kommissionens")
  private val euMonths = Vector("januari", "februari", "mars", "april",
    "maj", "juni", "juli", "augusti", "september", "oktober", "november",
    "december")

  /** CELEX number, computed INDEPENDENTLY of the parser (the GT side of
    * the P/R oracle): sector 3, 4-digit year, L=direktiv / R=förordning,
    * 4-digit act number. */
  private def celexOf(year4: Int, ord: Int, direktiv: Boolean): String =
    f"3$year4%04d${if (direktiv) "L" else "R"}$ord%04d"

  /** One Swedish EU-law citation (the reference's stock eulaw grammar
    * shapes, citationpatterns.py:40-70): returns (text fragment, ground-
    * truth target URI). Forms: article-in-act, act alone, bare article
    * (doc-relative). */
  private def euCitation(r: Rng, docUri: String): (String, String) = {
    val inst = r.pick(euInstitutions)
    val direktiv = r.nextBool(0.6)
    val year4 = 1960 + r.nextInt(64)
    val ord = 1 + r.nextInt(2000)
    val day = 1 + r.nextInt(28)
    val month = r.pick(euMonths)
    // two-digit rendering only where the 1958-epoch expansion is lossless
    val yearTxt =
      if (year4 < 2000 && r.nextBool(0.5)) f"${year4 % 100}%02d"
      else year4.toString
    val actTxt =
      if (direktiv) s"$inst direktiv $yearTxt/$ord/EG av den $day $month $year4"
      else s"$inst förordning (EG) nr $ord/$yearTxt av den $day $month $year4"
    val actUri = s"${EntityDict.base}/celex/${celexOf(year4, ord, direktiv)}"
    r.nextInt(3) match {
      case 0 =>
        val art = 1 + r.nextInt(90)
        val sub = if (r.nextBool(0.4)) s".${1 + r.nextInt(9)}" else ""
        (s"artikel $art$sub i $actTxt", s"$actUri#A$art$sub")
      case 1 => (actTxt, actUri)
      case _ =>
        val art = 1 + r.nextInt(90)
        (s"artikel $art", s"$docUri#A$art")
    }
  }

  /** Generate document index i of a corpus of n. Pure function of
    * (seed, i, n). */
  def doc(seed: Long, i: Long, n: Long): GenDoc = {
    val r = new Rng(seed ^ (i * 0x9e3779b97f4a7c15L) ^ 0x6a09e667f3bcc908L)
    val num = rfcNum(i)
    val basefile = num.toString
    val uri = EntityDict.canonicalRfcUri(basefile)
    val repo =
      if (r.nextBool(0.35)) megaRepo else s"repo-${r.nextInt(nTailRepos)}"
    val lang = r.pick(langs)
    val graph = s"${EntityDict.base}/dataset/$repo"
    val truth = Vector.newBuilder[Triple]

    // ---- header block
    val publisher = r.pick(publisherLines)
    val category = r.pick(categories)
    val nAuthors = 1 + r.nextInt(3)
    val authors = (0 until nAuthors).map { _ =>
      s"${initials(r.nextInt(initials.length))}. ${r.pick(surnames)}"
    }
    val month = r.pick(monthNames)
    val yr = 1990 + r.nextInt(35)
    val updates: Seq[Long] =
      if (i > 0 && r.nextBool(0.4))
        Seq(rfcNum(Math.floorMod(r.nextLong(), i))) else Seq.empty
    val obsoletes: Seq[Long] =
      if (i > 1 && r.nextBool(0.25))
        Seq(rfcNum(Math.floorMod(r.nextLong(), i))) else Seq.empty
    val hasIssn = r.nextBool(0.7)
    val bcp: Option[Int] = if (r.nextBool(0.1)) Some(10 + r.nextInt(90)) else None

    val leftLines = Vector.newBuilder[String]
    leftLines += publisher.trim
    leftLines += s"Request for Comments: $num"
    updates.foreach(u => leftLines += s"Updates: $u")
    obsoletes.foreach(o => leftLines += s"Obsoletes: $o")
    bcp.foreach(b => leftLines += s"BCP: $b")
    leftLines += s"Category: $category"
    if (hasIssn) leftLines += "ISSN: 2070-1721"
    val rightLines = authors.toVector :+ s"$month $yr"
    val lls = leftLines.result()
    val headerWidth = 72
    val headerLines = (0 until math.max(lls.size, rightLines.size)).map { k =>
      val l = if (k < lls.size) lls(k) else ""
      val rgt = if (k < rightLines.size) rightLines(k) else ""
      if (rgt.isEmpty) l
      else l + (" " * math.max(3, headerWidth - l.length - rgt.length)) + rgt
    }
    val header = headerLines.mkString("\n")

    // header ground truth (mirrors rfc.py:550-644 semantics)
    val pubUri = EntityDict.lookup(EntityDict.publishers, publisher.trim)
    pubUri match {
      case Some(p) => truth += Triple.uri(uri, Vocab.dcterms("publisher"), p, graph)
      case None => truth += Triple.lit(uri, Vocab.dcterms("publisher"), publisher.trim, graph)
    }
    truth += Triple.lit(uri, Vocab.dcterms("identifier"), s"RFC $num", graph)
    truth += Triple.uri(uri, Vocab.dcterms("subject"),
      EntityDict.categories(category), graph)
    if (hasIssn) truth += Triple.lit(uri, Vocab.dcterms("issn"), "2070-1721", graph)
    updates.foreach(u => truth += Triple.uri(uri, Vocab.rfc("updates"),
      EntityDict.canonicalRfcUri(u.toString), graph))
    obsoletes.foreach(o => truth += Triple.uri(uri, Vocab.rfc("obsoletes"),
      EntityDict.canonicalRfcUri(o.toString), graph))
    bcp.foreach(b => truth += Triple.lit(uri, Vocab.rfc("bcpnumber"), b.toString, graph))
    authors.foreach(a => truth += Triple.lit(uri, Vocab.dcterms("creator"), a, graph))
    truth += Triple.lit(uri, Vocab.dcterms("issued"),
      f"$yr-${monthNames.indexOf(month) + 1}%02d", graph,
      datatype = Some(Vocab.xsd("gYearMonth")))
    truth += Triple.uri(uri, Vocab.RDF_TYPE,
      if (bcp.isDefined) Vocab.rfc("BCP") else Vocab.rfc("RFC"), graph)

    // ---- title (sv/de docs lead with an accented word — see svTitleWords)
    val titleLead =
      if (lang == "sv") r.pick(svTitleWords) + " "
      else if (lang == "de") r.pick(deTitleWords) + " "
      else ""
    val title = s"$titleLead${r.pick(titleWords)} for ${r.pick(words).capitalize} " +
      s"${r.pick(words).capitalize} ${r.pick(titleWords)}"
    val shortTitle = title.split(" ").take(2).mkString(" ")
    truth += Triple.lit(uri, Vocab.dcterms("title"), title, graph, lang = Some("en"))
    truth += Triple.lit(uri, Vocab.bibo("shortTitle"), shortTitle, graph, lang = Some("en"))

    val body = new StringBuilder
    body.append(header).append("\n\n\n")
    body.append(wrap(title, " " * math.max(1, (72 - title.length) / 2))).append("\n\n")

    // ---- abstract (no citations kept here to keep GT assembly simple:
    //      citations go in numbered sections below)
    body.append("Abstract\n\n")
    body.append(wrap(sentence(r) + " " + sentence(r), "   ")).append("\n\n")
    body.append("Status of This Memo\n\n")
    body.append(wrap(s"This document is ${if (bcp.isDefined) "a Best Current Practice" else "a product of the community"}. " + sentence(r), "   ")).append("\n\n")

    // ---- table of contents (dropped by the pipeline; must emit nothing)
    body.append("Table of Contents\n\n")
    val nSections = 2 + r.nextInt(4)
    val secTitles = (0 until nSections).map(k =>
      if (k == nSections - 1) "Security Considerations"
      else r.pick(sectionTitles))
    secTitles.zipWithIndex.foreach { case (t, k) =>
      body.append(f"   ${k + 1}. $t%-40s ..................... ${k + 2}\n")
    }
    body.append("\n")

    // ---- numbered sections with citations, lists, pagebreaks
    var pageNo = 1
    for (k <- 0 until nSections) {
      val ord = (k + 1).toString
      val st = secTitles(k)
      val secUri = s"$uri#S$ord"
      body.append(s"$ord.  $st\n\n")
      truth += Triple.uri(secUri, Vocab.RDF_TYPE, Vocab.bibo("DocumentPart"), graph)
      truth += Triple.uri(secUri, Vocab.dcterms("isPartOf"), uri, graph)
      truth += Triple.lit(secUri, Vocab.dcterms("title"), st, graph, lang = Some("en"))
      truth += Triple.lit(secUri, Vocab.dcterms("identifier"),
        s"RFC $basefile, section $ord", graph)

      // paragraph with 1-2 citations
      val nCits = 1 + r.nextInt(2)
      val cits = (0 until nCits).map(_ => citation(r, num, n))
      val para = sentence(r) + " " +
        cits.map { case (txt, _) => s"As discussed in $txt, ${sentence(r).toLowerCase}" }
          .mkString(" ") + " " + sentence(r)
      body.append(wrap(para, "   ")).append("\n\n")
      cits.foreach { case (_, target) =>
        truth += Triple.uri(secUri, Vocab.dcterms("references"), target, graph)
      }

      // sv docs carry one Swedish EU-law citation in their first section
      // (exercises the stock eulaw grammar, citationpatterns.py:40-70)
      if (lang == "sv" && k == 0) {
        val (etxt, etgt) = euCitation(r, uri)
        body.append(wrap(s"Kraven följer även av $etxt enligt gällande rätt.",
          "   ")).append("\n\n")
        truth += Triple.uri(secUri, Vocab.dcterms("references"), etgt, graph)
      }

      // optional unordered list
      if (r.nextBool(0.4)) {
        val items = 2 + r.nextInt(3)
        for (_ <- 0 until items)
          body.append(wrap(sentence(r), "      ").replaceFirst("^      ", "   o  "))
            .append("\n\n")
      }

      // optional subsection with one citation
      if (r.nextBool(0.5)) {
        val sord = s"$ord.1"
        val stitle = r.pick(sectionTitles)
        val subUri = s"$uri#S$sord"
        body.append(s"$sord.  $stitle\n\n")
        truth += Triple.uri(subUri, Vocab.RDF_TYPE, Vocab.bibo("DocumentPart"), graph)
        truth += Triple.uri(subUri, Vocab.dcterms("isPartOf"), secUri, graph)
        truth += Triple.lit(subUri, Vocab.dcterms("title"), stitle, graph, lang = Some("en"))
        truth += Triple.lit(subUri, Vocab.dcterms("identifier"),
          s"RFC $basefile, section $sord", graph)
        val (ctxt, ctgt) = citation(r, num, n)
        body.append(wrap(s"${sentence(r)} Compare with $ctxt for details.", "   "))
          .append("\n\n")
        truth += Triple.uri(subUri, Vocab.dcterms("references"), ctgt, graph)
      }

      // pagebreak between sections (carries the short title)
      if (k < nSections - 1) {
        body.append(f"${authors.head.split(' ').last}%-24s$category%-34s[Page $pageNo]\n")
        body.append("\f\n")
        body.append(f"RFC $num%-20s$shortTitle%-30s$month $yr\n\n")
        pageNo += 1
      }
    }

    val content = body.toString
    val path = s"doc/rfc/rfc$num.txt"
    val commit = f"c${(seed ^ i) & 0xffffffffL}%08x"
    GenDoc(SourceFile(repo, path, commit, lang, content), truth.result())
  }

  /** Driver-side corpus for tests (small n). */
  def gen(seed: Long, n: Int): Vector[GenDoc] =
    (0L until n.toLong).map(doc(seed, _, n.toLong)).toVector

  // ----------------------------------------------------- html family
  /** HTML document i of a mixed corpus whose RFC half has n docs. The
    * shape exercises the reference's soup-based content extraction
    * (soup_from_basefile → parse_content_selector "body" →
    * parse_filter_selectors dropping nav/footer,
    * documentrepository.py:1222-1249): nav and footer carry
    * citation-SHAPED text that must produce NO mentions, pre is kept but
    * masked from the citation scan. Pure function of (seed, i, n). */
  def htmlDoc(seed: Long, i: Long, n: Long): GenDoc = {
    val r = new Rng(seed ^ (i * 0xa0761d6478bd642fL) ^ 0x589965cc75374cc3L)
    val repo = if (r.nextBool(0.3)) megaRepo else s"repo-${r.nextInt(nTailRepos)}"
    val lang = "en"
    val graph = s"${EntityDict.base}/dataset/$repo"
    val stem = s"page-$i"
    val path = s"site/$stem.html"
    // must mint identically to HtmlDoc.mintUri (slug on both parts)
    val uri = s"${EntityDict.base}/doc/${EntityDict.slug(repo)}/${EntityDict.slug(stem)}"
    val truth = Vector.newBuilder[Triple]

    val title = s"${r.pick(titleWords)} ${r.pick(words).capitalize} Pages"
    truth += Triple.uri(uri, Vocab.RDF_TYPE, Vocab.rfc("Webdoc"), graph)
    truth += Triple.lit(uri, Vocab.dcterms("title"), title, graph, lang = Some("en"))
    truth += Triple.lit(uri, Vocab.dcterms("identifier"), stem, graph)

    val b = new StringBuilder
    b.append("<html>\n<head><title>").append(title).append("</title></head>\n<body>\n")
    // nav: citation-shaped but filtered out pre-parse → no ground truth
    b.append(s"<nav><p>Start | RFC ${rfcNum(r.nextInt(n.toInt))} | ")
      .append(s"section 9 of RFC ${rfcNum(r.nextInt(n.toInt))}</p></nav>\n")
    b.append(s"<h1>$title</h1>\n")
    // intro paragraph: citation attributed to the DOC itself
    val (it, itgt) = citation(r, 0, n)
    b.append(s"<p>${sentence(r)} Refer to $it for details.</p>\n")
    truth += Triple.uri(uri, Vocab.dcterms("references"), itgt, graph)

    val nSections = 1 + r.nextInt(3)
    for (k <- 1 to nSections) {
      val st = r.pick(sectionTitles)
      val secUri = s"$uri#S$k"
      b.append(s"<h2>$st</h2>\n")
      truth += Triple.uri(secUri, Vocab.RDF_TYPE, Vocab.bibo("DocumentPart"), graph)
      truth += Triple.uri(secUri, Vocab.dcterms("isPartOf"), uri, graph)
      truth += Triple.lit(secUri, Vocab.dcterms("title"), st, graph, lang = Some("en"))
      val (ct, ctgt) = citation(r, 0, n)
      b.append(s"<p>${sentence(r)} As defined by $ct, ${sentence(r).toLowerCase}</p>\n")
      truth += Triple.uri(secUri, Vocab.dcterms("references"), ctgt, graph)
      if (r.nextBool(0.5)) // pre kept in the tree but masked from scanning
        b.append(s"<pre>GET /spec HTTP/1.1\nsee RFC 9999 and RFC 1</pre>\n")
      if (r.nextBool(0.4))
        b.append(s"<ul><li>${sentence(r)}</li><li>${sentence(r)}</li></ul>\n")
    }
    b.append(s"<footer><p>Archived copy of [RFC${rfcNum(r.nextInt(n.toInt))}]</p></footer>\n")
    b.append("</body>\n</html>\n")
    val commit = f"h${(seed ^ i) & 0xffffffffL}%08x"
    GenDoc(SourceFile(repo, path, commit, lang, b.toString), truth.result())
  }

  // ------------------------------------------------------ w3c family
  private val w3cTopics = Vector("Page Visibility", "XML Signatures",
    "Web Storage", "Media Queries", "Service Workers", "Web Components",
    "Pointer Events", "Timing Control")
  private val w3cSectionTitles = Vector("Introduction", "Conformance",
    "Terminology", "Processing Model", "Security Considerations",
    "Privacy Considerations", "The Interface", "Examples")

  /** W3C Recommendation document i — a W3Standards-shaped HTML page:
    * filtered div.head (carrying the "W3C Recommendation <date>" header
    * the metadata step must still see), a filtered div.toc, the fixed
    * preamble headings, and numbered h2/h3 sections. Pure function of
    * (seed, i). */
  def w3cDoc(seed: Long, i: Long): GenDoc = {
    val r = new Rng(seed ^ (i * 0x60bee2bee120fc15L) ^ 0x1d8e4e27c47d124fL)
    val repo = "w3c"
    val lang = "en"
    val graph = s"${EntityDict.base}/dataset/$repo"
    val stem = s"tr-$i"
    val path = s"w3c/$stem.html"
    val uri = s"${EntityDict.base}/res/w3c/$stem"
    val onto = "http://example.org/ontology/w3c/"
    val title = s"${r.pick(w3cTopics)} Level ${1 + r.nextInt(3)}"
    val day = 1 + r.nextInt(28)
    val monthName = Vector("January", "February", "March", "April", "May",
      "June", "July", "August", "September", "October", "November",
      "December")((i % 12).toInt)
    val year = 2010 + r.nextInt(10)

    val truth = Vector.newBuilder[Triple]
    truth += Triple.uri(uri, Vocab.RDF_TYPE, onto + "Recommendation", graph)
    truth += Triple.lit(uri, Vocab.dcterms("title"), title, graph,
      lang = Some(lang))
    truth += Triple.lit(uri, Vocab.dcterms("identifier"), stem, graph)
    truth += Triple(uri, Vocab.dcterms("issued"),
      f"$year-${(i % 12) + 1}%02d-$day%02d", objIsLiteral = true,
      Some(Vocab.xsd("date")), None, graph)
    truth += Triple.uri(uri, Vocab.dcterms("publisher"),
      s"${EntityDict.base}/ext/w3c", graph)

    val b = new StringBuilder
    b.append(s"<html>\n<head><title>$title</title></head>\n<body>\n")
    b.append(s"""<div class="head"><h2>W3C Recommendation """)
    b.append(s"$day $monthName $year</h2></div>\n")
    b.append(s"<h2>Abstract</h2>\n<p>${sentence(r)}</p>\n")
    truth += Triple.uri(s"$uri#PS1", Vocab.RDF_TYPE,
      Vocab.bibo("DocumentPart"), graph)
    truth += Triple.lit(s"$uri#PS1", Vocab.dcterms("title"), "Abstract",
      graph, lang = Some(lang))
    b.append("""<div class="toc"><p>1 Introduction.....2</p></div>""")
    b.append("\n")
    val nSections = 2 + r.nextInt(3)
    for (k <- 1 to nSections) {
      val st = w3cSectionTitles((i + k).toInt % w3cSectionTitles.length)
      b.append(s"<h2>$k $st</h2>\n<p>${sentence(r)}</p>\n")
      truth += Triple.uri(s"$uri#S$k", Vocab.RDF_TYPE,
        Vocab.bibo("DocumentPart"), graph)
      truth += Triple.lit(s"$uri#S$k", Vocab.dcterms("title"), st, graph,
        lang = Some(lang))
      truth += Triple.lit(s"$uri#S$k", Vocab.bibo("chapter"),
        k.toString, graph)
      if ((i + k) % 2 == 0) {
        b.append(s"<h3>$k.1 Details</h3>\n<p>${sentence(r)}</p>\n")
        truth += Triple.uri(s"$uri#S$k.1", Vocab.RDF_TYPE,
          Vocab.bibo("DocumentPart"), graph)
        truth += Triple.lit(s"$uri#S$k.1", Vocab.dcterms("title"),
          "Details", graph, lang = Some(lang))
        truth += Triple.lit(s"$uri#S$k.1", Vocab.bibo("chapter"),
          s"$k.1", graph)
      }
    }
    b.append("</body>\n</html>\n")
    val commit = f"w${(seed ^ (i * 17)) & 0xffffffffL}%08x"
    GenDoc(SourceFile(repo, path, commit, lang, b.toString), truth.result())
  }

  // --------------------------------------------------- eu acts family
  /** The owned EU-act catalog: celex ids in the law family's citation
    * space. A law doc's EU citation draws from this catalog part of the
    * time, so EuActRef mentions resolve against owned entities (the
    * eurlex.py metadata slice) and kg_deps gains eu-family edges. */
  final val EuActN = 24

  /** (celex, direktiv?, year, serial) of catalog act k. */
  def euActOf(k: Int): (String, Boolean, Int, Int) = {
    val direktiv = k % 2 == 0
    val ey = 1980 + (k % 15) * 2 // within the law-citation year window
    val en = if (direktiv) 10 + k else 200 + 7 * k
    (f"3${ey}${if (direktiv) "L" else "R"}$en%04d", direktiv, ey, en)
  }

  def euActTitle(k: Int): String = {
    val (_, direktiv, ey, en) = euActOf(k)
    val yTxt = f"${ey % 100}%02d"
    if (direktiv) s"Rådets direktiv $yTxt/$en/EEG om ämne ${k % 50}"
    else s"Kommissionens förordning (EEG) nr $en/$yTxt om ämne ${k % 50}"
  }

  def euDoc(k: Long): GenDoc = {
    val (celex, _, _, _) = euActOf(k.toInt)
    val graph = s"${EntityDict.base}/dataset/eurlex"
    val text = s"${euActTitle(k.toInt)}\n\nCELEX: $celex\n\n" +
      s"Denna rättsakt innehåller bestämmelser om ämne ${k % 50}.\n"
    GenDoc(SourceFile("eurlex", s"eu/$celex.eu", f"e$k%08x", "sv", text),
      Vector.empty)
  }

  // ----------------------------------------------------- wiki family
  /** Keyword-description wiki pages: one mediawiki export page per RFC
    * category keyword (the wiki repo describes the keyword hub — the
    * reference's MediaWiki/Keyword pairing). Deterministic text; the
    * description XMLLiteral is replayed verbatim by the
    * kg_keyword_entities oracle. */
  val wikiCategoryLabels: Vector[String] =
    EntityDict.categories.keys.toVector.sorted

  def wikiDoc(i: Long): GenDoc = {
    val label = wikiCategoryLabels(i.toInt % wikiCategoryLabels.length)
    val other = wikiCategoryLabels(((i + 1) % wikiCategoryLabels.length).toInt)
    val uri = EntityDict.categories(label)
    val graph = s"${EntityDict.base}/dataset/wiki"
    val text = s"'''$label''' är en kategori för tekniska dokument. " +
      s"Se även [[$other]]."
    val xml = s"<page><title>$label</title><revision>" +
      s"<text>$text</text></revision></page>"
    GenDoc(SourceFile("wiki", s"wiki/${EntityDict.slug(label)}.wiki.xml",
      f"k${i}%08x", "sv", xml), Vector.empty)
  }

  /** The wiki family's parser conf: keyword URIs are the category
    * entity URIs. */
  val wikiConf: graft.parse.WikiDoc.Conf = graft.parse.WikiDoc.Conf(
    uriFor = Some(title => EntityDict.categories.getOrElse(title,
      graft.parse.WikiDoc.keywordUri(s"${EntityDict.base}/begrepp/",
        title))))

  // ------------------------------------------------- markdown family
  /** Markdown README document i of a mixed corpus whose RFC half has n
    * docs (citations target that RFC space, exercising cross-family
    * linking). Pure function of (seed, i, n). */
  def mdDoc(seed: Long, i: Long, n: Long): GenDoc = {
    val r = new Rng(seed ^ (i * 0xc2b2ae3d27d4eb4fL) ^ 0x2545f4914f6cdd1dL)
    val repo = if (r.nextBool(0.3)) megaRepo else s"repo-${r.nextInt(nTailRepos)}"
    val lang = "en"
    val graph = s"${EntityDict.base}/dataset/$repo"
    val stem = s"readme-$i"
    val path = s"docs/$stem.md"
    // must mint identically to MdDoc.mintUri (slug applied to both parts)
    val uri = s"${EntityDict.base}/doc/${EntityDict.slug(repo)}/${EntityDict.slug(stem)}"
    val truth = Vector.newBuilder[Triple]

    val title = s"${r.pick(titleWords)} ${r.pick(words).capitalize} Guide"
    truth += Triple.uri(uri, Vocab.RDF_TYPE, Vocab.rfc("Readme"), graph)
    truth += Triple.lit(uri, Vocab.dcterms("title"), title, graph, lang = Some("en"))
    truth += Triple.lit(uri, Vocab.dcterms("identifier"), stem, graph)

    val body = new StringBuilder
    body.append(s"# $title\n\n")
    body.append(sentence(r)).append("\n\n")

    val nSections = 1 + r.nextInt(3)
    for (k <- 1 to nSections) {
      val st = r.pick(sectionTitles)
      val secUri = s"$uri#S$k"
      body.append(s"## $st\n\n")
      truth += Triple.uri(secUri, Vocab.RDF_TYPE, Vocab.bibo("DocumentPart"), graph)
      truth += Triple.uri(secUri, Vocab.dcterms("isPartOf"), uri, graph)
      truth += Triple.lit(secUri, Vocab.dcterms("title"), st, graph, lang = Some("en"))

      val (ctxt, ctgt) = citation(r, 0, n)
      body.append(wrap(s"${sentence(r)} Refer to $ctxt for the protocol details.", ""))
        .append("\n\n")
      truth += Triple.uri(secUri, Vocab.dcterms("references"), ctgt, graph)

      // code fence containing citation-SHAPED text that must NOT be scanned
      if (r.nextBool(0.6)) {
        body.append("```scala\n// see RFC 9999 and section 1.2 of RFC 1\nval x = 1\n```\n\n")
      }
      if (r.nextBool(0.5))
        body.append(s"- ${sentence(r)}\n\n")
    }
    val commit = f"m${(seed ^ i) & 0xffffffffL}%08x"
    GenDoc(SourceFile(repo, path, commit, lang, body.toString), truth.result())
  }

  // ------------------------------------------------- sv-law family
  /** Fourth document family: Swedish statute text with SFS-style
    * citations, exercising the stateful dictionary-driven LawRef parser
    * (the reference's LegalRef flagship, legalref.py) — including the
    * per-document anaphora ("4 § samma lag") and in-document name
    * learning that no stateless grammar can resolve. Ground truth is
    * generated INDEPENDENTLY of the parser from the same template
    * variables (the P/R oracle pattern of the other three families). */
  final val lawStemsA = Vector("exempel", "garanti", "trafik", "skatte",
    "miljö", "arbets", "bostads", "försäkrings", "aktie", "data", "energi",
    "fiske", "jakt", "skol", "tull", "vatten", "väg", "post")
  final val lawStemsB = Vector("", "tillsyns", "register", "avgifts",
    "kontroll", "stöd", "säkerhets", "ansvars")
  final val lawNameSuffixes = Vector("lagen", "förordningen", "kungörelsen")

  /** Hard cap on the law corpus: name combinations are unique below it. */
  final val MaxLaws: Long =
    (lawStemsA.size * lawStemsB.size * lawNameSuffixes.size).toLong // 432

  /** SFS id of corpus law j (unique for j < MaxLaws). */
  def sfsIdOf(j: Long): String = s"${1950 + (j % 70)}:${100 + j}"

  /** Unique Swedish-shaped law name of corpus law j ("trafikstödslagen"
    * style) — always suffix-bearing so the LawRef named-law word
    * recognizer fires on it. */
  def lawNameOf(j: Long): String = {
    require(j < MaxLaws, s"law corpus capped at $MaxLaws names")
    val a = lawStemsA((j % lawStemsA.size).toInt)
    val b = lawStemsB(((j / lawStemsA.size) % lawStemsB.size).toInt)
    val s = lawNameSuffixes(((j / (lawStemsA.size * lawStemsB.size))
      % lawNameSuffixes.size).toInt)
    s"$a$b$s"
  }

  /** The named-law dictionary over the first m corpus laws (normalized
    * name → SFS id) — the role of the reference's rdfs:label graph
    * injected into LegalRef (legalref.py:258-266). Pure function of m. */
  def lawDictionary(m: Long): Map[String, String] =
    (0L until math.min(m, MaxLaws)).map { j =>
      graft.parse.LawRef.normalizeLawName(lawNameOf(j)) -> sfsIdOf(j)
    }.toMap

  /** KORTLAGRUM abbreviation of corpus law j ("MBL" style, unique) —
    * the role of the reference's dcterms:alternate labels
    * (legalref.py:268-281). */
  def lawAbbrevOf(j: Long): String =
    s"${('A' + (j / 26) % 26).toChar}${('A' + j % 26).toChar}L"

  /** Abbreviation dictionary over the first m corpus laws. */
  def lawAbbrevs(m: Long): Map[String, String] =
    (0L until math.min(m, MaxLaws)).map(j => lawAbbrevOf(j) -> sfsIdOf(j))
      .toMap

  private val svWords = Vector("verksamheten", "ansvar", "villkor",
    "beslut", "prövning", "ansökan", "avgift", "tillsyn", "beräkning",
    "underlag", "uppgifter", "myndigheten", "ersättning")
  private def svSentence(r: Rng): String = {
    val n = 3 + r.nextInt(4)
    val ws = (0 until n).map(_ => r.pick(svWords))
    s"${ws.head.capitalize} avser ${ws.tail.mkString(" och ")} i ärendet."
  }

  // ------------------------------------------------- dv (referat) family
  private val dvCities = Vector("Örebro", "Malmö", "Uppsala", "Lund",
    "Gävle", "Kalmar", "Borås", "Luleå")
  private val dvSurnames = Vector("Berg", "Ek", "Holm", "Lind", "Sund",
    "Dahl", "Falk", "Palm")
  private val dvInitials = Vector("T.O.", "B.A.", "K.B.", "H.N.", "S.W.",
    "M.J.", "I.C.", "C.A.")
  private val svMonths = Vector("januari", "februari", "mars", "april",
    "maj", "juni", "juli", "augusti", "september", "oktober", "november",
    "december")

  /** NJA id of referat i (unique year/page pairs). */
  def njaIdOf(i: Long): (Int, Long) = ((1981 + (i % 40)).toInt, 1 + i)

  /** Court-verdict referat i of an m-referat corpus citing laws from an
    * mLaws-law corpus. Pure function of (seed, i, m, mLaws): NJA-shaped
    * text in the wording patterns DvParser's matcher table recognizes
    * (tingsrätt åklagar-instans → TR dom/domskäl/domslut → HD revision
    * instans → optional betänkande → HD dom → HD:s avgörande → endmeta),
    * carrying statute/NJA/prop citations with section-anchored ground
    * truth, exactly like the statute family. */
  def dvDoc(seed: Long, i: Long, m: Long, mLaws: Long): GenDoc = {
    val r = new Rng(seed ^ (i * 0x9e3779b97f4a7c15L) ^ 0x2545f4914f6cdd1dL)
    val (year, page) = njaIdOf(i)
    val repo = s"dv-${i % 2}"
    val lang = "sv"
    val basefile = s"HDO/B${100 + i}-${year % 100}"
    val path = s"dv/$basefile.dom"
    val graph = s"${EntityDict.base}/dataset/$repo"
    val uri = s"${EntityDict.base}/dom/nja/${year}s$page"
    val title = s"NJA $year s. $page"

    val truth = Vector.newBuilder[Triple]
    truth += Triple.uri(uri, Vocab.RDF_TYPE,
      Vocab.rpubl("Rattsfallsreferat"), graph)
    truth += Triple.lit(uri, Vocab.dcterms("title"), title, graph,
      lang = Some("sv"))
    truth += Triple.lit(uri, Vocab.dcterms("identifier"), title, graph)
    def part(iUri: String, parent: String, court: Option[String],
             date: Option[String]): Unit = {
      truth += Triple.uri(iUri, Vocab.RDF_TYPE, Vocab.bibo("DocumentPart"),
        graph)
      truth += Triple.uri(iUri, Vocab.dcterms("isPartOf"), parent, graph)
      court.foreach(c =>
        truth += Triple.lit(iUri, Vocab.dcterms("creator"), c, graph))
      date.foreach(d => truth += Triple.lit(iUri,
        Vocab.rpubl("avgorandedatum"), d, graph,
        datatype = Some(Vocab.xsd("date"))))
    }
    def ref(subj: String, target: String): Unit =
      truth += Triple.uri(subj, Vocab.dcterms("references"), target, graph)

    val b = new StringBuilder
    b.append(title).append("\n\n") // id line is NOT scanned

    var instansNo = 0
    def nextInstans(): String = { instansNo += 1; s"$uri#I$instansNo" }
    var endmetaDate = ""

    /** The full TR → HD flow under `parent` (the referat itself, or a
      * Delmal case part). */
    def mainFlow(parent: String): Unit = {
      // TR instans: åklagar-sentence with a dictionary-resolved statute
      // citation (the allm-åkl wording pattern)
      val stad = r.pick(dvCities)
      val trCourt = s"$stad TR"
      val who = r.pick(dvInitials)
      val lawJ = r.nextInt(math.max(1, mLaws.toInt))
      val k1 = 1 + r.nextInt(20)
      val i1 = nextInstans()
      b.append(s"Allmän åklagare yrkade vid $trCourt ansvar å $who för " +
        s"brott mot $k1 § ${lawNameOf(lawJ)}.\n\n")
      ref(i1, s"${EntityDict.base}/sfs/${sfsIdOf(lawJ)}#P$k1")

      // TR dom line (tr-dom pattern; also opens Domskal via domskal-ref)
      val d1 = 1 + r.nextInt(28)
      val mon1 = r.pick(svMonths)
      val y1 = year - 1
      b.append(s"TR:n (ordf lagmannen ${r.pick(dvSurnames)}) anförde i dom " +
        s"den $d1 $mon1 $y1:\n\n")
      val iso1 = f"$y1%04d-${svMonths.indexOf(mon1) + 1}%02d-$d1%02d"
      part(i1, parent, Some(trCourt), Some(iso1))

      // TR domskäl with case + preparatory-works citations
      val cy = 1985 + r.nextInt(30)
      val cn = 1 + r.nextInt(200)
      val py = 1990 + r.nextInt(25)
      val rm = f"${(py + 1) % 100}%02d"
      val pn = 1 + r.nextInt(150)
      val pg = 10 + r.nextInt(200)
      b.append(s"Domskäl. Åtalet får stöd av NJA $cy s. $cn och av " +
        s"prop. $py/$rm:$pn s. $pg.\n\n")
      ref(i1, s"${EntityDict.base}/dom/nja/${cy}s$cn")
      ref(i1, s"${EntityDict.base}/prop/$py/$rm:$pn#sid$pg")

      // TR domslut with an anaphoric back-reference to the cited statute
      val k2 = 1 + r.nextInt(20)
      b.append("Domslut\n\n")
      b.append(s"TR:n dömde $who till böter enligt $k2 § samma lag.\n\n")
      ref(i1, s"${EntityDict.base}/sfs/${sfsIdOf(lawJ)}#P$k2")

      hdFlow(parent, who)
    }

    /** The HD instance (revision → optional betänkande → dom → domskäl →
      * avgörande) under `parent` — also used alone inside Delmal parts. */
    def hdFlow(parent: String, who: String): Unit = {
      val i2 = nextInstans()
      b.append(s"$who (ombud advokaten ${r.pick(dvSurnames).head}.R.) sökte " +
        s"revision och yrkade att HD måtte fastställa TR:ns dom.\n\n")

      // optional betänkande, then the HD dom line
      val withBetankande = r.nextBool(0.4)
      val d2 = 1 + r.nextInt(28)
      val mon2 = r.pick(svMonths)
      val iso2 = f"$year%04d-${svMonths.indexOf(mon2) + 1}%02d-$d2%02d"
      endmetaDate = s"$d2 $mon2 $year"
      if (withBetankande) {
        b.append("Målet avgjordes efter föredragning.\n\n")
        b.append(s"HD (JustR:n ${r.pick(dvSurnames)}, ${r.pick(dvSurnames)}, " +
          "referent) fattade slutligt beslut i enlighet med betänkandet.\n\n")
        part(i2, parent, Some("HD"), None) // hd-fastst carries no date
      } else {
        b.append(s"HD (JustR:n ${r.pick(dvSurnames)} och ${r.pick(dvSurnames)}, " +
          s"referent) meddelade den $d2 $mon2 $year följande dom:\n\n")
        part(i2, parent, Some("HD"), Some(iso2))
      }

      // HD domskäl citing ANOTHER referat of this corpus (in-corpus link)
      if (m > 1) {
        val j = (i + 1 + r.nextInt((m - 1).toInt)) % m
        val (jy, jp) = njaIdOf(j)
        b.append(s"Domskäl. HD finner i likhet med NJA $jy s. $jp att " +
          "åtalet ska bifallas.\n\n")
        ref(i2, s"${EntityDict.base}/dom/nja/${jy}s$jp")
      }

      // HD domslut with an ordered paragraph
      b.append("HD:s avgörande\n\n")
      b.append("1. HD fastställer TR:ns domslut.\n\n")

      // occasional dissent (skiljaktig) and addendum (tillägg) appendices
      if (r.nextBool(0.3)) {
        b.append(s"Justitierådet ${r.pick(dvSurnames)} var skiljaktig och " +
          "ansåg att överklagandet skulle bifallas.\n\n")
        b.append("Enligt hans mening saknades grund för ansvar.\n\n")
      }
      if (r.nextBool(0.2)) {
        b.append(s"Justitierådet ${r.pick(dvSurnames)} tillade för egen del " +
          "vissa synpunkter på frågan.\n\n")
      }
    }

    // every ~5th referat reports multiple case parts (Delmal I/II —
    // dv.py:2112-2118), each with its own instance chain
    if (r.nextBool(0.2)) {
      val dI = s"$uri#DI"
      val dII = s"$uri#DII"
      def delmalPart(dUri: String): Unit = {
        truth += Triple.uri(dUri, Vocab.RDF_TYPE,
          Vocab.bibo("DocumentPart"), graph)
        truth += Triple.uri(dUri, Vocab.dcterms("isPartOf"), uri, graph)
      }
      b.append("I\n\n")
      delmalPart(dI)
      mainFlow(dI)
      b.append(s"II (B${200 + i}-${year % 100})\n\n")
      delmalPart(dII)
      hdFlow(dII, r.pick(dvInitials))
    } else {
      mainFlow(uri)
    }

    // endmeta line closes the referat
    b.append(s"HD:s beslut meddelat: den $endmetaDate.\n\n")

    val commit = f"d${(seed ^ (i * 31)) & 0xffffffffL}%08x"
    GenDoc(SourceFile(repo, path, commit, lang, b.toString), truth.result())
  }

  /** Law document i of an m-law corpus. Pure function of (seed, i, m). */
  def lawDoc(seed: Long, i: Long, m: Long): GenDoc = {
    val r = new Rng(seed ^ (i * 0x9e3779b97f4a7c15L) ^ 0x94d049bb133111ebL)
    val ownId = sfsIdOf(i)
    val repo = s"sfs-${i % 4}"
    val lang = "sv"
    val path = s"sfs/${ownId.replace(":", "_")}.law"
    val graph = s"${EntityDict.base}/dataset/$repo"
    val base = s"${EntityDict.base}/sfs/"
    val uri = base + ownId
    val name = lawNameOf(i)
    val title = s"${name.capitalize} ($ownId)"
    def other(): Long = if (m <= 1) i else (i + 1 + r.nextInt((m - 1).toInt)) % m

    val truth = Vector.newBuilder[Triple]
    truth += Triple.uri(uri, Vocab.RDF_TYPE, Vocab.rfc("Law"), graph)
    truth += Triple.lit(uri, Vocab.dcterms("title"), title, graph,
      lang = Some("sv"))
    truth += Triple.lit(uri, Vocab.dcterms("identifier"), ownId, graph)
    truth += Triple.uri(uri, Vocab.OWL_SAMEAS,
      graft.parse.LawDoc.rinfoUri(ownId), graph)

    // Content blocks: (section text, citation targets). Each block becomes
    // ONE numbered section of the assembled statute below, so the ground
    // truth anchors every reference at its #K..P.. section subject — the
    // same sub-resource anchoring as rfc #S fragments (the structure truth
    // the SfsParser slice must reproduce). A target is a FUNCTION of the
    // chapter ordinal the block lands in: bare section references resolve
    // against the enclosing chapter (legalref.py:845-851 attribute
    // completion), so their truth depends on the assembly below.
    val blocks = Vector.newBuilder[(String, Vector[String => String])]
    def block(text: String, targets: (String => String)*): Unit =
      blocks += ((text, targets.toVector))
    def fixed(t: String): String => String = _ => t

    // relative section reference → own law, ENCLOSING chapter
    val k1 = 1 + r.nextInt(30)
    block(s"${svSentence(r)} Ytterligare bestämmelser finns i $k1 §.",
      kap => s"$uri#K${kap}P$k1")

    // chapter-section reference → own law (single merged link; explicit
    // chapter stops the context fill)
    val k2 = 1 + r.nextInt(20)
    block(s"Enligt 2 kap. $k2 § gäller särskilda regler. ${svSentence(r)}",
      fixed(s"$uri#K2P$k2"))

    // section range → own law, ENCLOSING chapter (two links)
    if (r.nextBool(0.5)) {
      val a = 2 + r.nextInt(10)
      val c = a + 1 + r.nextInt(10)
      block(s"Vid tillsyn gäller $a-$c §§ i tillämpliga delar.",
        kap => s"$uri#K${kap}P$a", kap => s"$uri#K${kap}P$c")
    }

    // external anonymous law + ANAPHORIC back-reference ("samma lag")
    val j = other()
    if (m > 1) {
      val idJ = sfsIdOf(j)
      val k3 = 1 + r.nextInt(15)
      block(s"Vid beräkningen tillämpas 6 kap. lagen ($idJ) om stöd. " +
        s"Beloppet bestäms enligt $k3 § samma lag.",
        fixed(s"$base$idJ#K6"), // the chapter link
        fixed(s"$base$idJ"),    // the SFS-number link
        fixed(s"$base$idJ#P$k3")) // anaphoric: explicit law, no ctx fill
    }

    // dictionary-resolved named law (no SFS number in the text)
    if (m > 1 && r.nextBool(0.7)) {
      val j2 = other()
      block(s"Motsvarande regler finns i ${lawNameOf(j2)}.",
        fixed(s"$base${sfsIdOf(j2)}"))
    }

    // named law WITH its SFS number (teaches the in-document map)
    if (m > 1 && r.nextBool(0.4)) {
      val j3 = other()
      block(s"Se även ${lawNameOf(j3)} (${sfsIdOf(j3)}).",
        fixed(s"$base${sfsIdOf(j3)}"))
    }

    // change reference → own law's #L fragment
    if (r.nextBool(0.4)) {
      val j4 = other()
      block(s"${svSentence(r)} Lag (${sfsIdOf(j4)}).",
        fixed(s"$uri#L${sfsIdOf(j4)}"))
    }

    // KORTLAGRUM abbreviation citation ("3 § MBL" style): explicit law
    // via the abbreviation dictionary, so no chapter-context fill
    if (m > 1 && r.nextBool(0.4)) {
      val j5 = other()
      val k5 = 1 + r.nextInt(25)
      block(s"Tillsynsregler finns i $k5 § ${lawAbbrevOf(j5)}.",
        fixed(s"$base${sfsIdOf(j5)}#P$k5"))
    }

    // preparatory-works citation (the FORARBETEN family): prop with a
    // page reference, or an SOU report
    if (r.nextBool(0.6)) {
      val py = 1990 + r.nextInt(30)
      val pn = 1 + r.nextInt(200)
      val rm2 = f"${(py + 1) % 100}%02d"
      if (r.nextBool(0.5)) {
        val page = 10 + r.nextInt(300)
        block(s"Förarbetena finns i prop. $py/$rm2:$pn s. $page.",
          fixed(s"${EntityDict.base}/prop/$py/$rm2:$pn#sid$page"))
      } else {
        block(s"Frågan utreddes i SOU $py:$pn.",
          fixed(s"${EntityDict.base}/sou/$py:$pn"))
      }
    }

    // court-report citation (the RATTSFALL family)
    if (r.nextBool(0.5)) {
      val cy = 1985 + r.nextInt(35)
      val cn = 1 + r.nextInt(150)
      block(s"Jfr NJA $cy s. $cn om ${r.pick(svWords)}.",
        fixed(s"${EntityDict.base}/dom/nja/${cy}s$cn"))
    }

    // EU-act citation (the EULAGSTIFTNING family, EuActRef): a full
    // directive reference, an artikel-in-regulation reference, or a bare
    // regulation id — CELEX ground truth computed here from the template
    // variables, independent of the parser (pre-2015 years, so no
    // year/serial order flip to model)
    if (r.nextBool(0.6)) {
      // part of the time the citation targets an OWNED catalog act (the
      // eurlex family below) so the mention resolves in the link stage
      val catalog: Option[(String, Boolean, Int, Int)] =
        if (r.nextBool(0.4)) Some(euActOf(r.nextInt(EuActN))) else None
      val ey = catalog.map(_._3).getOrElse(1975 + r.nextInt(35))
      // real EU citation style: two-digit act years before 2000 ("95/46"),
      // four-digit from 2000 ("2003/98") — matches the CELEX expansion
      // rule (two-digit years are 19xx, legalref.py:1338-1356)
      val yTxt = if (ey < 2000) f"${ey % 100}%02d" else ey.toString
      val shape = catalog match {
        case Some((_, true, _, _)) => 0
        case Some((_, false, _, _)) => 2
        case None => r.nextInt(3)
      }
      shape match {
        case 0 =>
          val en = catalog.map(_._4).getOrElse(1 + r.nextInt(150))
          block(s"Kraven genomför rådets direktiv $yTxt/$en/EEG " +
            s"om ${r.pick(svWords)}.",
            fixed(f"${EntityDict.base}/ext/celex/3${ey}L$en%04d"))
        case 1 =>
          val en = 100 + r.nextInt(1900) // serial < 2014: no order flip
          val art = 1 + r.nextInt(25)
          block(s"Detta följer av artikel $art i kommissionens " +
            s"förordning (EG) nr $en/$yTxt.",
            fixed(f"${EntityDict.base}/ext/celex/3${ey}R$en%04d#$art"))
        case _ =>
          val en = catalog.map(_._4).getOrElse(100 + r.nextInt(1900))
          block(s"Jfr förordning (EEG) nr $en/$yTxt i denna del.",
            fixed(f"${EntityDict.base}/ext/celex/3${ey}R$en%04d"))
      }
    }

    // agency-decision citation (the MYNDIGHETSBESLUT family, AvgRef):
    // ARN board decisions, JO ombudsman dnr, or JK chancellor dnr — only
    // the diarienummer links; JK ordinals are kept out of the 1980-2099
    // looks-like-a-date window so the reference's date guard never fires
    if (r.nextBool(0.6)) {
      r.nextInt(3) match {
        case 0 =>
          val ay = 1992 + r.nextInt(20)
          val an = 1000 + r.nextInt(9000)
          block(s"Nämndens bedömning framgår av ARN:s änr $ay-$an.",
            fixed(s"${EntityDict.base}/avg/arn/$ay-$an"))
        case 1 =>
          val jy = 2000 + r.nextInt(15)
          val jn = 1000 + r.nextInt(9000)
          block(s"Se JO:s beslut den ${1 + r.nextInt(28)} april $jy, " +
            s"dnr $jn-$jy.",
            fixed(s"${EntityDict.base}/avg/jo/$jn-$jy"))
        case _ =>
          val ko = 2100 + r.nextInt(5000) // outside the date window
          val ky = f"${r.nextInt(100)}%02d"
          val kd = 10 + r.nextInt(80)
          block(s"JK fann i beslut, dnr $ko-$ky-$kd, att kraven " +
            s"var uppfyllda.",
            fixed(s"${EntityDict.base}/avg/jk/$ko-$ky-$kd"))
      }
    }

    // ---- assemble the statute: chapters of numbered sections (the
    // SfsParser structure shape). Chapter 1 always gets >= 2 sections so
    // the "2 kap." heading survives the parser's TOC guard (isKapitel's
    // fake_chapter check, sfs_parser.py:650-663).
    val bs = blocks.result()
    val twoChapters = bs.size >= 4
    val split = if (twoChapters) (bs.size + 1) / 2 else bs.size
    val chapters: Vector[(String, String, Vector[(String, Vector[String => String])])] =
      if (twoChapters)
        Vector(("1", "Inledande bestämmelser", bs.take(split)),
               ("2", "Särskilda bestämmelser", bs.drop(split)))
      else Vector(("1", "Inledande bestämmelser", bs))
    val headingPool = Vector("Särskilda villkor", "Tillsyn och kontroll",
      "Övriga bestämmelser")
    val midHeading = if (r.nextBool(0.5)) Some(r.pick(headingPool)) else None
    val withList = r.nextBool(0.4)

    val b = new StringBuilder
    b.append(title).append("\n\n") // title line is NOT scanned (LawDoc)
    // a leading division heading (SfsParser's Avdelning slice,
    // distributed): heading + underrubrik, both attrs — never scanned.
    // Only ONE division: the reference's TOC guard blocks a second
    // division while the parser is still in chapter 1, and the corpus
    // statutes have at most two chapters (sfs_parser.py:566-570).
    if (r.nextBool(0.3))
      b.append("FÖRSTA AVDELNINGEN\n\nÖvergripande bestämmelser\n\n")
    chapters.foreach { case (kap, kapRubrik, secs) =>
      val kapUri = s"$uri#K$kap"
      b.append(s"$kap kap. $kapRubrik\n\n")
      truth += Triple.uri(kapUri, Vocab.RDF_TYPE, Vocab.rpubl("Kapitel"), graph)
      truth += Triple.uri(kapUri, Vocab.dcterms("isPartOf"), uri, graph)
      truth += Triple.lit(kapUri, Vocab.rpubl("kapitelnummer"), kap, graph)
      def sectionTruth(secUri: String, sec: String): Unit = {
        truth += Triple.uri(secUri, Vocab.RDF_TYPE, Vocab.rpubl("Paragraf"), graph)
        truth += Triple.uri(secUri, Vocab.dcterms("isPartOf"), kapUri, graph)
        truth += Triple.lit(secUri, Vocab.rpubl("paragrafnummer"), sec, graph)
      }
      secs.zipWithIndex.foreach { case ((text, targets), sIdx) =>
        val sec = (sIdx + 1).toString
        val secUri = s"$uri#K${kap}P$sec"
        // a mid-chapter headline before the LAST section of chapter 2
        if (kap == "2" && sIdx == secs.size - 1 && sIdx > 0)
          midHeading.foreach(h => b.append(h).append("\n\n"))
        b.append(s"$sec § $text\n\n")
        sectionTruth(secUri, sec)
        targets.foreach(tf => truth +=
          Triple.uri(secUri, Vocab.dcterms("references"), tf(kap), graph))
      }
      // an UNCITED list section exercises the list structures
      if (kap == "1" && withList) {
        val sec = (secs.size + 1).toString
        b.append(s"$sec § Vid prövningen beaktas följande\n\n")
        b.append(s"1. ${r.pick(svWords)} och ${r.pick(svWords)}\n\n")
        b.append(s"2. ${r.pick(svWords)} i ärendet\n\n")
        sectionTruth(s"$uri#K${kap}P$sec", sec)
      }
    }

    // ---- övergångsbestämmelser + bilaga tail (SfsParser's tail slice,
    // exercised distributed): citation-free Swedish prose, so the
    // mention ground truth is untouched — the tail exercises STRUCTURE
    // parsing only (bare amendment-id lines are consumed as sfsnr
    // attributes, never citation-scanned)
    if (r.nextBool(0.5)) {
      b.append("Övergångsbestämmelser\n\n")
      b.append("Denna författning träder i kraft den 1 juli och " +
        "tillämpas första gången för det året.\n\n")
      b.append(s"${sfsIdOf(other())}\n\n")
      b.append("1. Äldre föreskrifter gäller fortfarande för tid " +
        "före ikraftträdandet\n\n")
      b.append("2. Mål som inletts tidigare prövas enligt äldre " +
        "bestämmelser\n\n")
      if (r.nextBool(0.5)) {
        b.append(s"${sfsIdOf(other())}\n\n")
        b.append("Vid ikraftträdandet upphör tidigare meddelade " +
          "beslut att gälla.\n\n")
      }
    }
    if (r.nextBool(0.3)) {
      b.append("Bilaga\n\n")
      b.append("Förteckning över de myndigheter som avses i denna " +
        "författning.\n\n")
    }

    val commit = f"l${(seed ^ i) & 0xffffffffL}%08x"
    GenDoc(SourceFile(repo, path, commit, lang, b.toString), truth.result())
  }
}

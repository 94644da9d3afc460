package graft.parse

import graft.model.{Mention, SourceFile, Triple, Vocab}
import graft.kg.EntityDict

/** Stage-P row function: one source document → element tree + metadata
  * triples + citation mentions.
  *
  * Semantics from the reference RFC repo's parse lifecycle
  * (/root/reference/ferenda/sources/tech/rfc.py:454-644): FSM parse, pop
  * header/title, drop the ToC preamble section, header key/values → triples,
  * pagebreak-derived short title, citation pass over all text spans. Plus
  * per-section bibo:DocumentPart/dcterms:isPartOf structure triples in the
  * shape of the golden distilled fixtures
  * (/root/reference/test/files/base/distilled/123/a.ttl).
  *
  * Pure function — runs inside Dataset.mapPartitions, one call per row,
  * no shared state (anaphora/linking state is strictly per-document,
  * SURVEY.md §7.5).
  */
object RfcDoc {

  final case class Parsed(
      docId: String,
      uri: String,
      title: String,
      shortTitle: Option[String],
      bodyXml: String,
      sha256: String,
      triples: Vector[Triple],
      mentions: Vector[Mention])

  private val hexChars = "0123456789abcdef".toCharArray

  def sha256Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private val months = Map(
    "January" -> 1, "February" -> 2, "March" -> 3, "April" -> 4,
    "May" -> 5, "June" -> 6, "July" -> 7, "August" -> 8,
    "September" -> 9, "October" -> 10, "November" -> 11, "December" -> 12)

  private def leftRight(header: String): (Seq[String], Seq[String]) = {
    val lines = header.split("\n", -1).toSeq
    val left = lines.map { l =>
      val i = l.indexOf("   ")
      (if (i >= 0) l.substring(0, i) else l).trim
    }
    val right = lines.flatMap { l =>
      val i = l.indexOf("   ")
      if (i >= 0) Some(l.substring(i + 3).trim) else None
    }
    (left, right)
  }

  /** "Request for Comments: 6809" → "6809" (rfc.py:537-548). */
  def rfcNumFromHeader(header: String): Option[String] = {
    val (left, _) = leftRight(header)
    left.drop(1).collectFirst {
      case l if l.contains(": ") &&
        l.split(": ", 2)(0).trim == "Request for Comments" =>
        l.split(": ", 2)(1).replaceAll("\\D", "")
    }.filter(_.nonEmpty)
  }

  private val creatorRe = """^[A-Z]\. """.r
  private val dateRe = """^\w+ \d{4}$""".r

  /** Header → metadata triples (rfc.py:550-644). */
  def headerTriples(header: String, uri: String, graph: String,
                    basefile: String): Vector[Triple] = {
    val out = Vector.newBuilder[Triple]
    val (left, right) = leftRight(header)
    var rdfType: Option[String] = None
    var hasIdentifier = false

    // first left-hand line = publishing organization. Exact dictionary probe
    // only — fuzzy (ratio>=0.8) resolution of unmatched literals is the
    // entity-LINKING stage's job (broadcast + MinHash/Jaccard blocking),
    // keeping parse embarrassingly parallel and dictionary-small.
    left.headOption.filter(_.nonEmpty).foreach { pub =>
      EntityDict.publishers.get(pub) match {
        case Some(puri) => out += Triple.uri(uri, Vocab.dcterms("publisher"), puri, graph)
        case None => out += Triple.lit(uri, Vocab.dcterms("publisher"), pub, graph)
      }
    }
    for (line <- left.drop(1); if line.trim.nonEmpty && line.contains(": ")) {
      val Array(key, value0) = line.split(": ", 2).map(_.trim)
      val value = value0
      key match {
        case "Request for Comments" =>
          val num = value.replaceAll("\\D", "")
          if (num.nonEmpty) {
            out += Triple.lit(uri, Vocab.dcterms("identifier"), s"RFC $num", graph)
            hasIdentifier = true
          }
        case "Category" =>
          EntityDict.categories.get(value) match {
            case Some(curi) => out += Triple.uri(uri, Vocab.dcterms("subject"), curi, graph)
            case None => out += Triple.lit(uri, Vocab.dcterms("subject"), value, graph)
          }
        case "ISSN" =>
          out += Triple.lit(uri, Vocab.dcterms("issn"), value, graph)
        case "Updates" | "Obsoletes" =>
          val pred = if (key == "Updates") Vocab.rfc("updates") else Vocab.rfc("obsoletes")
          for (part <- value.split(", ");
               m <- """\d+""".r.findFirstIn(part))
            out += Triple.uri(uri, pred, graft.kg.Coin.rfcUri(m), graph)
        case "BCP" =>
          out += Triple.lit(uri, Vocab.rfc("bcpnumber"), value, graph)
          rdfType = Some(Vocab.rfc("BCP"))
        case "STD" =>
          out += Triple.lit(uri, Vocab.rfc("stdnumber"), value, graph)
          rdfType = Some(Vocab.rfc("FYI")) // sic — mirrors rfc.py:610-611
        case "FYI" =>
          out += Triple.lit(uri, Vocab.rfc("fyinumber"), value, graph)
          rdfType = Some(Vocab.rfc("FYI"))
        case _ => // unknown header key: warn-and-skip in the reference
      }
    }
    for (line <- right; if line.nonEmpty) {
      if (creatorRe.findFirstIn(line).isDefined)
        out += Triple.lit(uri, Vocab.dcterms("creator"), line, graph)
      else if (dateRe.findFirstIn(line).isDefined) {
        val Array(mon, yr) = line.split(" ")
        months.get(mon) match {
          case Some(m) =>
            out += Triple.lit(uri, Vocab.dcterms("issued"), f"$yr-$m%02d", graph,
              datatype = Some(Vocab.xsd("gYearMonth")))
          case None =>
            out += Triple.lit(uri, Vocab.dcterms("rightsHolder"), line, graph)
        }
      } else
        out += Triple.lit(uri, Vocab.dcterms("rightsHolder"), line, graph)
    }
    out += Triple.uri(uri, Vocab.RDF_TYPE, rdfType.getOrElse(Vocab.rfc("RFC")), graph)
    if (!hasIdentifier)
      out += Triple.lit(uri, Vocab.dcterms("identifier"), s"RFC $basefile", graph)
    out.result()
  }

  /** Remove Pagebreak nodes, bubbling up the first shorttitle seen
    * (cleanup_body, rfc.py:520-536). */
  def cleanupBody(node: TreeNode): (TreeNode, Option[String]) = {
    var short: Option[String] = None
    val kept = Vector.newBuilder[TreeNode]
    for (c <- node.children) {
      if (c.tag == "Pagebreak") {
        if (short.isEmpty) short = c.attr("shorttitle")
      } else {
        val (cc, s) = cleanupBody(c)
        if (short.isEmpty) short = s
        kept += cc
      }
    }
    (node.copy(children = kept.result()), short)
  }

  private val sectionTags = Set("Section", "Subsection", "Subsubsection")

  /** Per-section structure triples: DocumentPart/isPartOf chains in the
    * fixture shape (123/a.ttl; decorate-bodyparts semantics). */
  def sectionTriples(body: TreeNode, docUri: String, graph: String,
                     basefile: String): Vector[Triple] = {
    val out = Vector.newBuilder[Triple]
    def walk(n: TreeNode, parentUri: String): Unit =
      n.children.foreach { c =>
        if (sectionTags(c.tag)) {
          val ord = c.attr("ordinal").getOrElse("")
          val secUri = graft.kg.Coin.sectionUri(docUri, ord)
          out += Triple.uri(secUri, Vocab.RDF_TYPE, Vocab.bibo("DocumentPart"), graph)
          out += Triple.uri(secUri, Vocab.dcterms("isPartOf"), parentUri, graph)
          c.attr("title").foreach(t =>
            out += Triple.lit(secUri, Vocab.dcterms("title"), t, graph, lang = Some("en")))
          out += Triple.lit(secUri, Vocab.dcterms("identifier"),
            s"RFC $basefile, section $ord", graph)
          walk(c, secUri)
        } else walk(c, parentUri)
      }
    walk(body, docUri)
    out.result()
  }

  /** Collect citation mentions from every text span of the body
    * (citparser.parse_recursive, rfc.py:512-513). The mention's subject is
    * the nearest enclosing sub-resource URI — the reference attaches
    * LinkSubject reference triples to the closest element carrying `about`
    * (citationparser.py:98-165), i.e. the section. URL grammar runs first
    * (stock `url` pattern, citationpatterns.py:16-36). */
  /** Compiled once per JVM — java.util.regex compilation per document was
    * measurable at corpus scale. */
  private val rfcGrammarsStatic =
    CitationParser.rfcGrammars(graft.kg.Coin.rfcUri) ++
      CitationParser.eulawGrammars(graft.kg.Coin.celexUri)

  def collectMentions(body: TreeNode, src: SourceFile, docId: String,
                      docUri: String): Vector[Mention] = {
    val grammars = rfcGrammarsStatic
    val out = Vector.newBuilder[Mention]
    def walk(n: TreeNode, subjUri: String): Unit = {
      val here =
        if (sectionTags(n.tag))
          n.attr("ordinal").map(graft.kg.Coin.sectionUri(docUri, _)).getOrElse(subjUri)
        else subjUri
      n.text.foreach { t =>
        // RFCHeader/DocTitle are popped before the citation pass; here we
        // only see <str> spans of compound elements
        CitationParser.scanWithUrls(t, grammars).foreach { c =>
          val resolved =
            if (c.candidateUri.startsWith("#")) docUri + c.candidateUri
            else c.candidateUri
          out += Mention(docId, src.repo, src.lang, c.grammar, c.matchText,
            c.start, c.end, resolved, here)
        }
      }
      n.children.foreach(walk(_, here))
    }
    walk(body, docUri)
    out.result()
  }

  /** Full per-row parse (stage P). `graph` = dataset context of the repo. */
  def parse(src: SourceFile): Parsed = {
    val docId = s"${src.repo}/${src.path}@${src.commit}"
    val graph = s"${EntityDict.base}/dataset/${src.repo}"
    val basefileGuess = src.path.replaceAll("^.*/", "").replaceAll("\\..*$", "")
      .replaceAll("\\D", "") match { case "" => "0"; case s => s }

    val tree = RfcParser.parse(src.content, basefileGuess)
    val kids = tree.children
    require(kids.nonEmpty && kids.head.tag == "RFCHeader",
      s"document does not start with an RFC header: $docId")
    val header = kids.head.text.getOrElse("")
    val titleRaw = kids.lift(1).flatMap(_.text).getOrElse("")
    val title = titleRaw.split("\\s+").filter(_.nonEmpty).mkString(" ")
    var body = tree.copy(children = kids.drop(2)
      .filterNot(c => c.tag == "PreambleSection" &&
                      c.attr("title").contains("Table of Contents")))

    val basefile = rfcNumFromHeader(header).getOrElse(basefileGuess)
    val uri = graft.kg.Coin.rfcUri(basefile) // COIN priority-template mint

    val (cleaned, shortTitle0) = cleanupBody(body)
    body = cleaned
    val shortTitle = shortTitle0.filter(_ != title)

    val triples = Vector.newBuilder[Triple]
    triples += Triple.lit(uri, Vocab.PROV + "wasGeneratedBy", "graft.parse.RfcDoc", graph)
    triples += Triple.lit(uri, Vocab.dcterms("title"), title, graph, lang = Some("en"))
    triples ++= headerTriples(header, uri, graph, basefile)
    shortTitle.foreach(st =>
      triples += Triple.lit(uri, Vocab.bibo("shortTitle"), st, graph, lang = Some("en")))
    triples ++= sectionTriples(body, uri, graph, basefile)

    val mentions = collectMentions(body, src, docId, uri)

    Parsed(docId, uri, title, shortTitle, TreeNode.toXml(body),
      sha256Hex(src.content), triples.result(), mentions)
  }
}

package graft.parse

import java.util.regex.Pattern
import graft.kg.EntityDict
import graft.model.{Triple, Vocab}

/** Kommittédirektiv from the Trips plain-text source — the reference's
  * DirTrips repo (/root/reference/ferenda/sources/legal/se/
  * direktiv.py:104-330 + trips.py:152-214): the rättsdatabaser HTML is
  * reduced to plain text (the div.search-results-content text with a
  * 64-dash separator prefixed to the body-text div), the header blocks
  * above the separator carry title+identifier and Departement/Beslut
  * key/values, and the body parses with a small string FSM (numbered
  * sections, header-like unordered sections, dash lists). */
object DirTripsDoc {

  final case class Conf(
      baseUri: String = s"${EntityDict.base}/dir/",
      rinfoBase: String = "http://rinfo.lagrummet.se/publ/dir/",
      orgBase: String = s"${EntityDict.base}/org/2008/")

  val Separator: String = "-" * 64

  // ------------------------------------------------------- text extract
  private def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&eacute;", "é").replace("&nbsp;", " ")
      .replace("&amp;", "&")

  /** trips.py:159-207 _extract_text_inner (utf-8/html5 path): the
    * search-results-content subtree's text, the separator prefixed to
    * the body-text div's content, CR dropped. Tag-stripping preserves
    * the plaintext whitespace (HtmlDoc.soup would normalize it away). */
  def extractText(html: String): String = {
    val start = html.indexOf("""<div class="search-results-content"""")
    require(start >= 0, "has no div.search-results-content")
    // find the matching close by div-depth counting
    val tag = Pattern.compile("<(/?)div\\b[^>]*>").matcher(html)
    tag.region(start, html.length)
    var depth = 0
    var end = html.length
    var done = false
    while (!done && tag.find()) {
      if (tag.group(1).isEmpty) depth += 1
      else {
        depth -= 1
        if (depth == 0) { end = tag.start; done = true }
      }
    }
    var region = html.substring(start, end)
    region = region.replaceFirst(
      "(<div class=\"result-box-text body-text\"[^>]*>)",
      "$1" + Separator + "\n\n")
    unescape(region.replaceAll("<[^>]+>", "")).replace("\r", "")
  }

  // ----------------------------------------------------------- metadata
  /** lookup_resource → /org/2008/ slug (the commondata organization
    * URIs: lowercased, Swedish letters transliterated, spaces to
    * underscores). */
  def orgUri(base: String, name: String): String =
    base + name.toLowerCase.replace('å', 'a').replace('ä', 'a')
      .replace('ö', 'o').replace('é', 'e').replace(' ', '_')

  /** extract_metadata (direktiv.py:143-161). Header blocks split on
    * blank-ish lines — our tag-stripping keeps the markup indentation
    * on otherwise-empty lines, where the reference's soup.text sees
    * bare newlines. */
  def extractMetadata(rawheader: String, basefile: String, conf: Conf)
      : Map[String, String] = {
    val headers = rawheader.split("\n[ \t]*\n").map(
      OfftryckParser.normalizeSpace).filter(_.nonEmpty)
    val lastComma = headers(0).lastIndexOf(", ")
    require(lastComma > 0, s"no identifier in header '${headers(0)}'")
    val title = OfftryckParser.normalizeSpace(
      headers(0).substring(0, lastComma))
    val identifier = headers(0).substring(lastComma + 2).trim
    val preds = Map("Departement" -> "rpubl:departement",
      "Beslut" -> "rpubl:beslutsdatum")
    val kvs = headers.drop(1).flatMap { h =>
      val Array(k, v) = h.split(":", 2)
      preds.get(k.trim).map(_ -> v.trim)
    }.toMap
    Map("dcterms:identifier" -> identifier, "dcterms:title" -> title) ++
      kvs ++ kvs.get("rpubl:beslutsdatum").map("dcterms:issued" -> _)
  }

  // ----------------------------------------------------------- body FSM
  private def headerlike(p: String): Boolean =
    p.nonEmpty && p.head.toLower != p.head && p.length < 150 &&
      !(p.endsWith(".") && !(p.endsWith("m.m.") || p.endsWith("m. m.") ||
        p.endsWith("m.fl.") || p.endsWith("m. fl.")))

  private val ReSectionstart =
    Pattern.compile("^(\\d[\\.\\d]*) +([A-ZÅÄÖ].*)$", Pattern.DOTALL)

  private def sectionstart(chunk: String)
      : (Option[String], String, String) = {
    val m = ReSectionstart.matcher(chunk)
    if (m.matches() && headerlike(m.group(2)))
      (Some(m.group(1)), "h" + (m.group(1).count(_ == '.') + 1),
        m.group(2).trim)
    else (None, null, chunk)
  }

  /** The direktiv body FSM (direktiv.py:185-306) over paragraphs. */
  def structure(paragraphs: Vector[String]): TreeNode = {
    import FsmParser.{Config, Constructor, Recognizer, Transition}
    type P = FsmParser[String]
    def peek(p: P): String = p.reader.peek()
    def isStrecksats(chunk: String): Boolean =
      chunk.startsWith("--") || chunk.startsWith("- ")

    val recognizers = Vector(
      Recognizer[String]("is_section",
        p => sectionstart(peek(p))._1.isDefined &&
          sectionstart(peek(p))._2 == "h1"),
      Recognizer[String]("is_subsection",
        p => sectionstart(peek(p))._1.isDefined &&
          sectionstart(peek(p))._2 == "h2"),
      Recognizer[String]("is_header", p => {
        val c = peek(p)
        !Pattern.compile("Dir\\.? \\d{4}:\\d+$").matcher(c).matches() &&
          headerlike(c) &&
          !p.reader.peekOpt(2).exists(isStrecksats)
      }),
      Recognizer[String]("is_strecksats", p => isStrecksats(peek(p))),
      Recognizer[String]("is_paragraph", _ => true))

    def listitem(p: P): TreeNode = {
      val s0 = p.reader.next()
      val s = if (s0.contains(" ")) s0.split(" ", 2)(1) else s0.substring(1)
      TreeNode("ListItem", text = Some(s))
    }
    val makeBody = Constructor[String]("make_body", pushesState = true,
      p => Some(p.makeChildren(TreeNode("Body"))))
    val makeParagraph = Constructor[String]("make_paragraph",
      pushesState = false,
      p => Some(TreeNode("Paragraph", text = Some(p.reader.next()))))
    val makeStrecksatslista = Constructor[String]("make_strecksatslista",
      pushesState = true, p => {
        val li = listitem(p)
        Some(p.makeChildren(
          TreeNode("Strecksatslista", children = Vector(li))))
      })
    val makeListitem = Constructor[String]("make_listitem",
      pushesState = false, p => Some(listitem(p)))
    val makeUnorderedsection = Constructor[String]("make_unorderedsection",
      pushesState = true, p => Some(p.makeChildren(
        TreeNode("UnorderedSection",
          Vector("title" -> p.reader.next().trim)))))
    val makeSection = Constructor[String]("make_section",
      pushesState = true, p => {
        val (ord, _, title) = sectionstart(p.reader.next())
        Some(p.makeChildren(TreeNode("Avsnitt",
          Vector("ordinal" -> ord.getOrElse(""), "title" -> title))))
      })

    val F = None
    val t = Map.newBuilder[(String, String), Transition[String]]
    def add(states: Seq[String], rec: String,
            ctor: Option[Constructor[String]], ns: Option[String]): Unit =
      states.foreach(s => t += ((s, rec) -> Transition[String](ctor, ns)))
    val commonstates =
      Seq("body", "section", "subsection", "unorderedsection")
    add(commonstates, "is_paragraph", Some(makeParagraph), None)
    add(commonstates, "is_strecksats", Some(makeStrecksatslista),
      Some("strecksats"))
    add(commonstates, "is_header", Some(makeUnorderedsection),
      Some("unorderedsection"))
    add(commonstates, "is_section", Some(makeSection), Some("section"))
    add(Seq("unorderedsection"), "is_header", F, None)
    add(Seq("unorderedsection"), "is_section", F, None)
    add(Seq("strecksats"), "is_paragraph", F, None)
    add(Seq("strecksats"), "is_strecksats", Some(makeListitem), None)
    add(Seq("section"), "is_header", F, None)
    add(Seq("section"), "is_section", F, None)
    add(Seq("section"), "is_subsection", Some(makeSection),
      Some("subsection"))
    add(Seq("subsection"), "is_subsection", F, None)
    add(Seq("subsection"), "is_section", F, None)

    new FsmParser[String](
      Config(recognizers, t.result(), "body", makeBody),
      paragraphs.iterator).parse()
  }

  // --------------------------------------------------------------- parse
  def parse(html: String, basefile: String,
            conf: Conf = Conf()): RfcDoc.Parsed = {
    val uri = conf.baseUri + basefile
    val graph = s"${EntityDict.base}/dataset/dirtrips"
    val txt = extractText(html)
    val sep = txt.indexOf(Separator)
    require(sep >= 0, "no separator in extracted text")
    val rawheader = txt.substring(0, sep)
    // extract_head seeks to len(header) + 66 — CHAR arithmetic applied
    // to a BYTE-addressed stream (direktiv.py:128-141). With multibyte
    // chars in the header the seek lands early and re-reads the tail
    // of the separator ("----…\n\n" fragments open the body — the
    // reference's own parsed fixtures carry them). Ported
    // byte-accurately.
    val fullBytes = txt.getBytes("UTF-8")
    val seekPos = math.min(rawheader.length + 66, fullBytes.length)
    var body = new String(fullBytes, seekPos, fullBytes.length - seekPos,
      java.nio.charset.StandardCharsets.UTF_8)
    body = body.replaceAll("\n\t\n", "\n\n")
    val paragraphs = body.split("\n{2,}").toVector
      .map(_.replaceAll("^\n+", "")).filter(_.trim.nonEmpty)
    val meta = extractMetadata(rawheader, basefile, conf)

    val tree = structure(paragraphs)

    val xsdDate = Vocab.xsd("date")
    val triples = Vector.newBuilder[Triple]
    triples += Triple.lit(uri, Vocab.PROV + "wasGeneratedBy",
      "graft.parse.DirTripsDoc", graph)
    triples += Triple.uri(uri, Vocab.RDF_TYPE,
      Vocab.rpubl("Kommittedirektiv"), graph)
    triples += Triple.lit(uri, Vocab.dcterms("identifier"),
      meta("dcterms:identifier"), graph)
    triples += Triple(uri, Vocab.dcterms("title"), meta("dcterms:title"),
      objIsLiteral = true, None, Some("sv"), graph)
    val Array(ar, lop) = basefile.split(":")
    triples += Triple.lit(uri, Vocab.rpubl("arsutgava"), ar, graph)
    triples += Triple.lit(uri, Vocab.rpubl("lopnummer"), lop, graph)
    triples += Triple.uri(uri, Vocab.dcterms("publisher"),
      orgUri(conf.orgBase, "Regeringskansliet"), graph)
    meta.get("rpubl:departement").foreach(d => triples += Triple.uri(uri,
      Vocab.rpubl("departement"), orgUri(conf.orgBase, d), graph))
    meta.get("rpubl:beslutsdatum").foreach(d => triples += Triple(uri,
      Vocab.rpubl("beslutsdatum"), d, objIsLiteral = true, Some(xsdDate),
      None, graph))
    meta.get("dcterms:issued").foreach(d => triples += Triple(uri,
      Vocab.dcterms("issued"), d, objIsLiteral = true, Some(xsdDate),
      None, graph))
    triples += Triple.uri(uri, Vocab.OWL_SAMEAS, conf.rinfoBase + basefile,
      graph)

    RfcDoc.Parsed(s"dirtrips/$basefile", uri, meta("dcterms:title"), None,
      TreeNode.toXml(tree), RfcDoc.sha256Hex(html), triples.result(),
      Vector.empty)
  }
}

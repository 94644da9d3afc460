package graft.parse

import java.util.regex.Pattern
import graft.kg.EntityDict
import graft.model.{SourceFile, Triple, Vocab}

/** W3C Recommendation doctype — the reference's W3Standards repo
  * (/root/reference/ferenda/sources/tech/w3c.py:21-313): tag-soup body
  * through CSS content/filter selectors, a small FSM over the
  * top-level blocks (numbered H1-H4 headings → Section/Subsection/
  * Subsubsection, the fixed preamble headings → PreambleSection),
  * metadata from the unfiltered soup (title, issued date from the
  * "W3C Recommendation <date>" header, editors), and #S{ordinal} /
  * #PS{n} DocumentPart decoration. Reuses [[HtmlDoc.soup]] and
  * [[Css]] — the family is an HtmlDoc-based doctype config, exactly
  * as in the reference. */
object W3cDoc {

  final case class Conf(
      baseUri: String = s"${EntityDict.base}/res/w3c/",
      publisher: String = s"${EntityDict.base}/ext/w3c",
      ontology: String = "http://example.org/ontology/w3c/")

  val contentSelector = "body"
  val filterSelectors = Seq("div.toc", "div.head")

  private def textOf(n: TreeNode): String =
    (n.text.toSeq ++ n.children.map(textOf)).mkString(" ")
      .replaceAll("\\s+", " ").trim

  // ------------------------------------------------------------ the FSM
  private val headerTags = Set("h1", "h2", "h3", "h4")
  private val preambleHeadings = Set("abstract", "status of this document",
    "table of contents", "appendices")

  /** "1.2.3. This is a subsubsection" → ("1.2.3", title); the title
    * must not end with '.' (w3c.py:169-178). */
  private val ReSectionstart = Pattern.compile("^(\\d[\\.\\d]*) +(.*[^\\.])$")
  def analyzeSectionstart(chunk: String): (Option[String], String) = {
    val m = ReSectionstart.matcher(chunk)
    if (m.matches()) (Some(m.group(1).replaceAll("\\.+$", "")), m.group(2))
    else (None, chunk)
  }
  private def segments(o: Option[String]): Int =
    o.map(_.split("\\.").count(_.nonEmpty)).getOrElse(0)

  /** The FSM over top-level body blocks (w3c.py:85-207). */
  def structure(blocks: Vector[TreeNode]): TreeNode = {
    import FsmParser._
    type P = FsmParser[TreeNode]
    def peek(p: P): TreeNode = p.reader.peek()
    def isHeader(p: P): Boolean = headerTags.contains(peek(p).tag)
    def secOf(p: P): Option[String] =
      if (!isHeader(p)) None
      else analyzeSectionstart(textOf(peek(p)))._1

    val recognizers = Vector(
      Recognizer[TreeNode]("is_section", p => segments(secOf(p)) == 1),
      Recognizer[TreeNode]("is_subsection", p => segments(secOf(p)) == 2),
      Recognizer[TreeNode]("is_subsubsection",
        p => segments(secOf(p)) == 3),
      Recognizer[TreeNode]("is_preamblesection", p => isHeader(p) &&
        preambleHeadings.contains(textOf(peek(p)).toLowerCase)),
      Recognizer[TreeNode]("is_preambleending", p => peek(p).tag == "hr"),
      Recognizer[TreeNode]("is_other", _ => true))

    def mkSection(tag: String) = Constructor[TreeNode](s"make_$tag",
      pushesState = true, p => {
        val (ord, title) = analyzeSectionstart(textOf(p.reader.next()))
        Some(p.makeChildren(TreeNode(tag,
          Vector("ordinal" -> ord.getOrElse(""), "title" -> title))))
      })
    val makeSection = mkSection("Section")
    val makeSubsection = mkSection("Subsection")
    val makeSubsubsection = mkSection("Subsubsection")
    val makePreamble = Constructor[TreeNode]("make_preamblesection",
      pushesState = true, p => Some(p.makeChildren(TreeNode(
        "PreambleSection",
        Vector("title" -> textOf(p.reader.next()))))))
    val makeOther = Constructor[TreeNode]("make_other",
      pushesState = false, p => Some(p.reader.next()))
    val makeBody = Constructor[TreeNode]("make_body", pushesState = true,
      p => Some(p.makeChildren(TreeNode("Body"))))

    val F = None
    val t = Map.newBuilder[(String, String), Transition[TreeNode]]
    def add(states: Seq[String], rec: String,
            ctor: Option[Constructor[TreeNode]], ns: Option[String]): Unit =
      states.foreach(s => t += ((s, rec) -> Transition[TreeNode](ctor, ns)))
    val commonstates = Seq("body", "preamblesection", "section",
      "subsection", "subsubsection")
    add(Seq("body"), "is_preamblesection", Some(makePreamble),
      Some("preamblesection"))
    add(Seq("preamblesection"), "is_preamblesection", F, None)
    add(Seq("preamblesection"), "is_preambleending", F, None)
    add(Seq("preamblesection"), "is_section", F, None)
    add(Seq("body"), "is_section", Some(makeSection), Some("section"))
    add(commonstates, "is_other", Some(makeOther), None)
    add(Seq("section"), "is_subsection", Some(makeSubsection),
      Some("subsection"))
    add(Seq("section"), "is_section", F, None)
    add(Seq("subsection"), "is_subsubsection", Some(makeSubsubsection),
      Some("subsubsection"))
    add(Seq("subsection"), "is_subsection", F, None)
    add(Seq("subsection"), "is_section", F, None)
    add(Seq("subsubsection"), "is_subsubsection", F, None)
    add(Seq("subsubsection"), "is_subsection", F, None)
    add(Seq("subsubsection"), "is_section", F, None)

    new FsmParser[TreeNode](
      Config(recognizers, t.result(), "body", makeBody),
      blocks.iterator).parse()
  }

  // ------------------------------------------------------------ metadata
  private val months = Map(
    "january" -> 1, "february" -> 2, "march" -> 3, "april" -> 4,
    "may" -> 5, "june" -> 6, "july" -> 7, "august" -> 8,
    "september" -> 9, "october" -> 10, "november" -> 11, "december" -> 12,
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "jun" -> 6,
    "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10, "nov" -> 11,
    "dec" -> 12)

  /** "14 May 2013" / "14-May-2013" from the "W3C Recommendation ..."
    * header (w3c.py:226-247). */
  def issuedDate(tree: TreeNode): Option[String] = {
    val hdrRe = Pattern.compile("W3C\\s+Recommendation,?\\s+")
    val dateRe = Pattern.compile("(\\d+)[ \\-](\\w+),?[ \\-](\\d{4})")
    def headers(n: TreeNode): Iterator[TreeNode] =
      (if (n.tag == "h2" || n.tag == "h3") Iterator.single(n)
       else Iterator.empty) ++ n.children.iterator.flatMap(headers)
    headers(tree).map(textOf).find(t => hdrRe.matcher(t).find())
      .flatMap { t =>
        val m = dateRe.matcher(t)
        if (!m.find()) None
        else months.get(m.group(2).toLowerCase).map { mo =>
          f"${m.group(3)}-$mo%02d-${m.group(1).toInt}%02d"
        }
      }
  }

  /** Editors: a <dt> whose own text is "Editor(s):", then every
    * following <dd> sibling; strings containing '@' dropped, name =
    * text before the first ", " (w3c.py:249-255). The BeautifulSoup
    * text= match only hits dts whose entire content is one string. */
  def editors(tree: TreeNode): Vector[String] = {
    val dtRe = Pattern.compile("Editors?:")
    def walk(n: TreeNode): Iterator[Vector[String]] = {
      val here = n.children.zipWithIndex.collectFirst {
        case (c, idx) if c.tag == "dt" && c.children.length == 1 &&
            c.children.head.text.exists(t => dtRe.matcher(t).find()) =>
          n.children.drop(idx + 1).filter(_.tag == "dd").map { dd =>
            val s = textOf(dd).split("\\s+").filterNot(_.contains("@"))
              .mkString(" ")
            s.split(", ")(0)
          }
      }
      here.iterator ++ n.children.iterator.flatMap(walk)
    }
    walk(tree).nextOption().getOrElse(Vector.empty)
  }

  // -------------------------------------------------------------- parse
  def basefileOf(path: String): String =
    path.replaceAll("^.*/", "").replaceAll("\\.html?$", "")

  def parse(src: SourceFile): RfcDoc.Parsed = parse(src, Conf())

  def parse(src: SourceFile, conf: Conf): RfcDoc.Parsed = {
    val docId = s"${src.repo}/${src.path}@${src.commit}"
    val graph = s"${EntityDict.base}/dataset/${src.repo}"
    val basefile = basefileOf(src.path)
    val uri = conf.baseUri + basefile

    val tree = HtmlDoc.soup(src.content)
    val body0 = Css.selectFirst(tree, contentSelector).getOrElse(
      throw new IllegalArgumentException(s"no <body> in $docId"))
    val body = Css.filterOut(body0, filterSelectors)
    val structured = structure(body.children)

    val title = Css.selectFirst(tree, "title")
      .map(textOf).getOrElse("")
    val abstractText = Css.select(tree, "body")
      .flatMap(b => findByClass(b, "abstract")).headOption.map(textOf)

    val triples = Vector.newBuilder[Triple]
    triples += Triple.lit(uri, Vocab.PROV + "wasGeneratedBy",
      "graft.parse.W3cDoc", graph)
    triples += Triple.uri(uri, Vocab.RDF_TYPE,
      conf.ontology + "Recommendation", graph)
    triples += Triple.lit(uri, Vocab.dcterms("title"), title, graph,
      lang = Some(src.lang))
    triples += Triple.lit(uri, Vocab.dcterms("identifier"), basefile, graph)
    abstractText.foreach(a => triples += Triple.lit(uri,
      Vocab.dcterms("abstract"), a, graph, lang = Some(src.lang)))
    issuedDate(tree).foreach(d => triples += Triple(uri,
      Vocab.dcterms("issued"), d, objIsLiteral = true,
      Some(Vocab.xsd("date")), None, graph))
    editors(tree).foreach(e => triples += Triple.lit(uri,
      Vocab.dcterms("editor"), e, graph))
    triples += Triple.uri(uri, Vocab.dcterms("publisher"), conf.publisher,
      graph)

    // decorate_bodyparts (w3c.py:290-303) + PreambleSection #PS counter
    var ps = 0
    def decorate(n: TreeNode): Unit = {
      n.tag match {
        case "Section" | "Subsection" | "Subsubsection" =>
          val secUri = s"$uri#S${n.attr("ordinal").get}"
          triples += Triple.uri(secUri, Vocab.RDF_TYPE,
            Vocab.bibo("DocumentPart"), graph)
          triples += Triple.lit(secUri, Vocab.dcterms("title"),
            n.attr("title").get, graph, lang = Some(src.lang))
          triples += Triple.lit(secUri, Vocab.bibo("chapter"),
            n.attr("ordinal").get, graph)
        case "PreambleSection" =>
          ps += 1
          triples += Triple.uri(s"$uri#PS$ps", Vocab.RDF_TYPE,
            Vocab.bibo("DocumentPart"), graph)
          triples += Triple.lit(s"$uri#PS$ps", Vocab.dcterms("title"),
            n.attr("title").get, graph, lang = Some(src.lang))
        case _ => ()
      }
      n.children.foreach(decorate)
    }
    decorate(structured)

    RfcDoc.Parsed(docId, uri, title, None, TreeNode.toXml(structured),
      RfcDoc.sha256Hex(src.content), triples.result(), Vector.empty)
  }

  private def findByClass(n: TreeNode, cls: String): Vector[TreeNode] = {
    val own = if (n.attr("class").exists(
        _.split("\\s+").contains(cls))) Vector(n) else Vector.empty
    own ++ n.children.flatMap(findByClass(_, cls))
  }
}

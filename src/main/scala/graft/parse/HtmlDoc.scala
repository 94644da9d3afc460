package graft.parse

import graft.kg.EntityDict
import graft.model.{Mention, SourceFile, Triple, Vocab}

/** Third document family: HTML pages — the reference's soup-based path
  * (soup_from_basefile → parse_content_selector → parse_filter_selectors,
  * /root/reference/ferenda/documentrepository.py:1196-1249): the raw
  * markup is parsed into an element tree, the content selector picks the
  * subtree to keep ("body"), the filter selectors drop boilerplate
  * (nav/footer) BEFORE any extraction, and `<pre>` blocks stay in the
  * tree but are opaque to the citation scan (like MdDoc's code fences).
  *
  * The tag-soup reader handles the constrained subset a curated corpus
  * uses (html/head/title/body/nav/footer/h1/h2/p/pre/ul/li) with a plain
  * stack — no external parser libs exist in this sandbox, and the
  * element-tree + CSS pipeline downstream is the part that carries the
  * reference's semantics.
  */
object HtmlDoc {

  val WebdocType = Vocab.rfc("Webdoc")

  val contentSelector = "body"
  val filterSelectors = Seq("nav", "footer")

  private val TagRe = """<(/?)([a-zA-Z][\w-]*)((?:\s+[\w-]+="[^"]*")*)\s*(/?)>""".r
  private val AttrRe = """([\w-]+)="([^"]*)"""".r

  /** HTML void elements — they never take children; an html parser
    * (like the reference's BeautifulSoup) closes them implicitly.
    * Without this a bare <br> swallows the rest of the document. */
  private val voidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")

  /** Tag-soup → TreeNode tree. Text runs become <str> children; unknown
    * tags still nest (stack parser is tag-agnostic). */
  def soup(markup: String): TreeNode = {
    var stack = List(TreeNode("root"))
    def addText(t: String): Unit = {
      val trimmed = t.replaceAll("\\s+", " ").trim
      if (trimmed.nonEmpty)
        stack = stack.head.appendText(trimmed) :: stack.tail
    }
    var pos = 0
    for (m <- TagRe.findAllMatchIn(markup)) {
      addText(markup.substring(pos, m.start))
      pos = m.end
      val closing = m.group(1) == "/"
      val tag = m.group(2).toLowerCase
      val selfClosing = m.group(4) == "/" || voidTags.contains(tag)
      if (!closing && selfClosing) {
        val attrs = AttrRe.findAllMatchIn(m.group(3))
          .map(a => a.group(1) -> a.group(2)).toVector
        stack = stack.head.appendChild(TreeNode(tag, attrs)) :: stack.tail
      } else if (!closing) {
        val attrs = AttrRe.findAllMatchIn(m.group(3))
          .map(a => a.group(1) -> a.group(2)).toVector
        stack = TreeNode(tag, attrs) :: stack
      } else if (voidTags.contains(tag)) {
        // stray </br>-style closers of void elements: ignore
      } else {
        // pop until the matching open tag (tolerates unclosed inline tags)
        val idx = stack.indexWhere(_.tag == tag)
        if (idx >= 0) {
          var closedNode: TreeNode = null
          for (_ <- 0 to idx) {
            val top = stack.head
            stack = stack.tail
            closedNode = if (closedNode == null) top else top.appendChild(closedNode)
          }
          stack = stack.head.appendChild(closedNode) :: stack.tail
        }
      }
    }
    addText(markup.substring(pos))
    // close any dangling elements
    while (stack.tail.nonEmpty) {
      val top = stack.head
      stack = stack.tail
      stack = stack.head.appendChild(top) :: stack.tail
    }
    stack.head
  }

  def mintUri(repo: String, path: String): String = {
    val stem = path.replaceAll("^.*/", "").replaceAll("\\.html?$", "")
    graft.kg.Coin.readmeUri(repo, stem) // same /doc/{repo}/{stem} space
  }

  private val grammars = CitationParser.rfcGrammars(graft.kg.Coin.rfcUri) ++
    CitationParser.eulawGrammars(graft.kg.Coin.celexUri)

  def parse(src: SourceFile): RfcDoc.Parsed = {
    val docId = s"${src.repo}/${src.path}@${src.commit}"
    val graph = s"${EntityDict.base}/dataset/${src.repo}"
    val uri = mintUri(src.repo, src.path)

    val tree = soup(src.content)
    val body0 = Css.selectFirst(tree, contentSelector).getOrElse(
      throw new IllegalArgumentException(s"no <$contentSelector> in $docId"))
    val body = Css.filterOut(body0, filterSelectors)

    val title = Css.selectFirst(body, "h1")
      .flatMap(_.children.headOption.flatMap(_.text))
      .orElse(Css.selectFirst(tree, "head title")
        .flatMap(_.children.headOption.flatMap(_.text)))
      .getOrElse("")

    val triples = Vector.newBuilder[Triple]
    val mentions = Vector.newBuilder[Mention]
    triples += Triple.lit(uri, Vocab.PROV + "wasGeneratedBy",
      "graft.parse.HtmlDoc", graph)
    triples += Triple.uri(uri, Vocab.RDF_TYPE, WebdocType, graph)
    triples += Triple.lit(uri, Vocab.dcterms("title"), title, graph,
      lang = Some("en"))
    triples += Triple.lit(uri, Vocab.dcterms("identifier"),
      src.path.replaceAll("^.*/", "").replaceAll("\\.html?$", ""), graph)

    def scanText(t: String, subjUri: String): Unit =
      CitationParser.scanWithUrls(t, grammars).foreach { c =>
        val resolved =
          if (c.candidateUri.startsWith("#")) uri + c.candidateUri
          else c.candidateUri
        mentions += Mention(docId, src.repo, src.lang, c.grammar,
          c.matchText, c.start, c.end, resolved, subjUri)
      }

    // linear walk: h2 opens section k; p/ul attach to the open section
    // (or the doc before the first h2); pre is kept but never scanned
    var secIdx = 0
    var current = uri
    def textOf(n: TreeNode): String =
      (n.text.toSeq ++ n.children.map(textOf)).mkString(" ").trim
    body.children.foreach { c =>
      c.tag match {
        case "h2" =>
          secIdx += 1
          val secUri = graft.kg.Coin.sectionUri(uri, secIdx.toString)
          current = secUri
          triples += Triple.uri(secUri, Vocab.RDF_TYPE,
            Vocab.bibo("DocumentPart"), graph)
          triples += Triple.uri(secUri, Vocab.dcterms("isPartOf"), uri, graph)
          triples += Triple.lit(secUri, Vocab.dcterms("title"), textOf(c),
            graph, lang = Some("en"))
        case "p" | "ul" | "li" => scanText(textOf(c), current)
        case "pre" | "h1" | "str" => () // opaque / already consumed
        case _ => scanText(textOf(c), current)
      }
    }

    RfcDoc.Parsed(docId, uri, title, None, TreeNode.toXml(body),
      RfcDoc.sha256Hex(src.content), triples.result(), mentions.result())
  }
}

package graft.parse

import graft.kg.EntityDict
import graft.model.{Mention, SourceFile, Triple, Vocab}

/** Second document family: Markdown-ish READMEs, parsed by a SECOND
  * config of the same generic FSM engine — the engine/config split mirrors
  * the reference's FSMParser-vs-repo-config design (fsmparser.py engine,
  * per-repo setups like rfc.py:133-428), and proves the engine is not
  * RFC-hardcoded. Dispatch happens per row on the path extension
  * (ferenda's DocumentRepository-class dispatch; first-wins composite
  * semantics live in [[DocParsers]]).
  */
object MdDoc {

  val ReadmeType = Vocab.rfc("Readme") // type URI for this family

  // ---- FSM config --------------------------------------------------------
  import FsmParser._

  private def peek(p: FsmParser[String]): String = p.reader.peek()

  private val isH1 = Recognizer[String]("h1", p => peek(p).startsWith("# "))
  private val isH2 = Recognizer[String]("h2", p => peek(p).startsWith("## "))
  private val isFence = Recognizer[String]("fence", p => peek(p).startsWith("```"))
  private val isListItem = Recognizer[String]("listitem", p => peek(p).startsWith("- "))
  private val isParagraph = Recognizer[String]("paragraph", _ => true)

  private def makeBody = Constructor[String]("make_body", pushesState = true,
    p => Some(p.makeChildren(TreeNode("Body"))))

  private def makeTitle = Constructor[String]("make_title", pushesState = false,
    p => Some(TreeNode("DocTitle", text = Some(p.reader.next().substring(2).trim))))

  private def makeSection = Constructor[String]("make_section", pushesState = true, { p =>
    val title = p.reader.next().substring(3).trim
    Some(p.makeChildren(TreeNode("Section", attrs = Vector("title" -> title))))
  })

  private def makeParagraph = Constructor[String]("make_paragraph", pushesState = false,
    p => Some(TreeNode("Paragraph")
      .appendText(p.reader.next().split("\\s+").filter(_.nonEmpty).mkString(" "))))

  private def makeFence = Constructor[String]("make_fence", pushesState = false, { p =>
    // code fences are opaque: mention scanning must not see them
    val chunk = p.reader.next()
    Some(TreeNode("CodeBlock", attrs = Vector(
      "lang" -> chunk.linesIterator.next().drop(3).trim)))
  })

  private def makeListItem = Constructor[String]("make_md_listitem", pushesState = false,
    p => Some(TreeNode("ListItem").appendText(p.reader.next().substring(2).trim)))

  val config: Config[String] = {
    val t = Map.newBuilder[(String, String), Transition[String]]
    t += ("body" -> "h1") -> Transition[String](Some(makeTitle), Some("content"))
    t += ("content" -> "h2") -> Transition[String](Some(makeSection), Some("section"))
    t += ("content" -> "paragraph") -> Transition[String](Some(makeParagraph), None)
    t += ("content" -> "fence") -> Transition[String](Some(makeFence), None)
    t += ("content" -> "listitem") -> Transition[String](Some(makeListItem), None)
    t += ("section" -> "paragraph") -> Transition[String](Some(makeParagraph), None)
    t += ("section" -> "fence") -> Transition[String](Some(makeFence), None)
    t += ("section" -> "listitem") -> Transition[String](Some(makeListItem), None)
    t += ("section" -> "h2") -> Transition[String](None, None)
    Config(
      recognizers = Vector(isH1, isH2, isFence, isListItem, isParagraph),
      transitions = t.result(),
      initialState = "body",
      initialConstructor = makeBody)
  }

  def chunks(text: String): Iterator[String] =
    text.split("\n\n+", -1).iterator.map(_.dropWhile(_ == '\n')).filter(_.nonEmpty)

  // ---- per-row parse -----------------------------------------------------
  private val grammars = CitationParser.rfcGrammars(graft.kg.Coin.rfcUri) ++
    CitationParser.eulawGrammars(graft.kg.Coin.celexUri)

  def mintUri(repo: String, path: String): String = {
    val stem = path.replaceAll("^.*/", "").replaceAll("\\.md$", "")
    graft.kg.Coin.readmeUri(repo, stem) // COIN priority-template mint
  }

  def parse(src: SourceFile): RfcDoc.Parsed = {
    val docId = s"${src.repo}/${src.path}@${src.commit}"
    val graph = s"${EntityDict.base}/dataset/${src.repo}"
    val uri = mintUri(src.repo, src.path)

    val tree = new FsmParser(config, chunks(src.content)).parse()
    val kids = tree.children
    require(kids.nonEmpty && kids.head.tag == "DocTitle",
      s"markdown doc does not start with an H1 title: $docId")
    val title = kids.head.text.getOrElse("")
    // number sections in document order (ordinal = index; markdown has no
    // explicit ordinals)
    var secIdx = 0
    val body0 = tree.copy(children = kids.drop(1))
    def number(n: TreeNode): TreeNode =
      if (n.tag == "Section") {
        secIdx += 1
        n.copy(attrs = n.attrs :+ ("ordinal" -> secIdx.toString),
          children = n.children.map(number))
      } else n.copy(children = n.children.map(number))
    val body = number(body0)

    val triples = Vector.newBuilder[Triple]
    triples += Triple.lit(uri, Vocab.PROV + "wasGeneratedBy", "graft.parse.MdDoc", graph)
    triples += Triple.uri(uri, Vocab.RDF_TYPE, ReadmeType, graph)
    triples += Triple.lit(uri, Vocab.dcterms("title"), title, graph, lang = Some("en"))
    triples += Triple.lit(uri, Vocab.dcterms("identifier"),
      src.path.replaceAll("^.*/", "").replaceAll("\\.md$", ""), graph)
    def walk(n: TreeNode, parentUri: String): Unit =
      n.children.foreach { c =>
        if (c.tag == "Section") {
          val ord = c.attr("ordinal").get
          val secUri = graft.kg.Coin.sectionUri(uri, ord)
          triples += Triple.uri(secUri, Vocab.RDF_TYPE, Vocab.bibo("DocumentPart"), graph)
          triples += Triple.uri(secUri, Vocab.dcterms("isPartOf"), parentUri, graph)
          c.attr("title").foreach(t => triples +=
            Triple.lit(secUri, Vocab.dcterms("title"), t, graph, lang = Some("en")))
          walk(c, secUri)
        } else walk(c, parentUri)
      }
    walk(body, uri)

    val mentions = Vector.newBuilder[Mention]
    def scan(n: TreeNode, subjUri: String): Unit = {
      val here =
        if (n.tag == "Section")
          n.attr("ordinal").map(graft.kg.Coin.sectionUri(uri, _)).getOrElse(subjUri)
        else subjUri
      if (n.tag != "CodeBlock") {
        n.text.foreach { t =>
          CitationParser.scanWithUrls(t, grammars).foreach { c =>
            val resolved =
              if (c.candidateUri.startsWith("#")) uri + c.candidateUri
              else c.candidateUri
            mentions += Mention(docId, src.repo, src.lang, c.grammar,
              c.matchText, c.start, c.end, resolved, here)
          }
        }
        n.children.foreach(scan(_, here))
      }
    }
    scan(body, uri)

    RfcDoc.Parsed(docId, uri, title, None, TreeNode.toXml(body),
      RfcDoc.sha256Hex(src.content), triples.result(), mentions.result())
  }
}

/** Per-row doctype dispatch (the reference's repo-class / composite
  * first-wins selection, compositerepository.py:29-48): the first parser
  * whose `accepts` matches the row wins; declaration order is priority. */
object DocParsers {
  final case class Entry(name: String,
      accepts: SourceFile => Boolean,
      parse: SourceFile => RfcDoc.Parsed)

  val registry: Vector[Entry] = Vector(
    Entry("md", _.path.endsWith(".md"), MdDoc.parse),
    Entry("wiki", _.path.endsWith(".wiki.xml"),
      p => WikiDoc.parse(p, graft.kg.Corpus.wikiConf)),
    Entry("eu", _.path.endsWith(".eu"), EuDoc.parse),
    Entry("w3c", p => p.path.startsWith("w3c/") && p.path.endsWith(".html"),
      p => W3cDoc.parse(p)),
    Entry("html", p => p.path.endsWith(".html") || p.path.endsWith(".htm"),
      HtmlDoc.parse),
    Entry("law", _.path.endsWith(".law"), p => LawDoc.parse(p)),
    Entry("dv", _.path.endsWith(".dom"), p => DvDoc.parse(p)),
    Entry("rfc", _ => true, RfcDoc.parse)) // catch-all, lowest priority

  def parse(src: SourceFile): RfcDoc.Parsed =
    registry.find(_.accepts(src)).get.parse(src)
}

package graft.parse

import java.util.regex.Pattern
import graft.kg.EntityDict
import graft.model.{SourceFile, Triple, Vocab}

/** MediaWiki keyword-description doctype — the reference's MediaWiki /
  * LNMediaWiki repos (/root/reference/ferenda/sources/general/wiki.py:
  * 44-267, lagen/nu/mediawiki.py:42-148): a mediawiki export page whose
  * wikitext DESCRIBES a keyword concept. The parse yields, on the
  * KEYWORD's uri (canonical_uri delegates to the keyword repo):
  * skos:Concept, dcterms:title, dcterms:subject per [[Kategori:X]]
  * link, and dcterms:description — the rendered body as an
  * rdf:XMLLiteral. Internal [[links]] become keyword-uri anchors and
  * running text goes through the statute citation parser
  * (LNMediaWiki.postprocess → parse_recursive).
  *
  * Markup subset: paragraphs on blank lines, '''bold''', ''italic'',
  * [[target]] / [[target|label]] / [[Kategori:X]] — the constructs the
  * reference's own fixture wiki uses. */
object WikiDoc {

  final case class Conf(
      keywordBase: String = s"${EntityDict.base}/begrepp/",
      lawConf: LawRef.Conf = LawRef.Conf(baseLaw = None),
      /** canonical_uri hook: the wiki repo delegates to its keyword
        * repo (wiki.py:199-203) — a corpus whose keyword space is not
        * the default begrepp/ slugging supplies its own minter. */
      uriFor: Option[String => String] = None) {
    def mintUri(title: String): String =
      uriFor.map(_(title)).getOrElse(keywordUri(keywordBase, title))
  }

  /** keyword_uri (lagen/nu/sameas.py:90-92): ucfirst, spaces to
    * underscores, quote/»-escaping. */
  def keywordUri(base: String, keyword: String): String = {
    val uc =
      if (keyword.isEmpty) keyword
      else keyword.substring(0, 1).toUpperCase + keyword.substring(1)
    base + uc.replace(' ', '_').replace("\"", "%22").replace("»", "//")
  }

  // -------------------------------------------------- export-xml unwrap
  private def tagText(xml: String, tag: String): Option[String] = {
    val m = Pattern.compile(s"<$tag[^>]*>(.*?)</$tag>",
      Pattern.DOTALL).matcher(xml)
    if (m.find())
      Some(m.group(1).replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", "\"").replace("&amp;", "&"))
    else None
  }

  // ------------------------------------------------------ wikitext parse
  private val LinkRe = Pattern.compile("\\[\\[([^\\]|]*)(?:\\|([^\\]]*))?\\]\\]")
  private val CategoryPrefixes = Seq("Kategori:", "Category:")

  /** One rendered paragraph: inline runs as TreeNodes (str/b/i/a). */
  final case class Rendered(body: TreeNode, subjects: Vector[String])

  /** Wikitext → body div + dcterms:subject targets. Category links are
    * lifted to metadata and removed; a paragraph left empty by that
    * removal disappears (wiki.py:231-244). */
  def render(wikitext: String, conf: Conf): Rendered = {
    val subjects = Vector.newBuilder[String]
    val paras = wikitext.replace("\r\n", "\n").split("\n\\s*\n")
    val kids = Vector.newBuilder[TreeNode]
    paras.foreach { para0 =>
      if (para0.trim.nonEmpty) {
        // the reference's parser renders intra-paragraph newlines (and
        // the paragraph-final one) as spaces
        val para = para0.replace("\n", " ") + " "
        val runs = Vector.newBuilder[TreeNode]
        var pos = 0
        val m = LinkRe.matcher(para)
        var textAcc = new StringBuilder
        def flushText(upto: Int): Unit = {
          textAcc.append(para.substring(pos, upto))
        }
        def emitText(): Unit = {
          if (textAcc.nonEmpty) {
            // citation pass over the accumulated plain text
            val segs = LawRef.parse(textAcc.toString, conf.lawConf)
            segs.foreach { seg =>
              seg.uri match {
                case Some(u) => runs += TreeNode("a",
                  Vector("href" -> u), children = Vector(
                    TreeNode.str(seg.text)))
                case None => runs += TreeNode.str(seg.text)
              }
            }
            textAcc = new StringBuilder
          }
        }
        while (m.find()) {
          flushText(m.start)
          pos = m.end
          val target = m.group(1)
          val label = Option(m.group(2)).getOrElse(target)
          CategoryPrefixes.find(target.startsWith) match {
            case Some(p) =>
              subjects += keywordUri(conf.keywordBase,
                target.substring(p.length))
            case None =>
              emitText()
              runs += TreeNode("a",
                Vector("href" -> keywordUri(conf.keywordBase, target)),
                children = Vector(TreeNode.str(label)))
          }
        }
        flushText(para.length)
        emitText()
        // bold/italic markers inside the accumulated runs
        val styled = runs.result().flatMap(styleRuns)
        val nonEmpty = styled.exists(n =>
          n.tag != "str" || n.text.exists(_.trim.nonEmpty))
        if (nonEmpty) kids += TreeNode("p", children = styled)
      }
    }
    Rendered(TreeNode("div", children = kids.result()),
      subjects.result())
  }

  /** '''bold''' / ''italic'' inside a plain-text run. */
  private val StyleRe = Pattern.compile("('''|'')(.*?)\\1", Pattern.DOTALL)
  private def styleRuns(n: TreeNode): Vector[TreeNode] = n match {
    case TreeNode("str", _, Some(t), _) =>
      val out = Vector.newBuilder[TreeNode]
      val m = StyleRe.matcher(t)
      var pos = 0
      while (m.find()) {
        if (m.start > pos) out += TreeNode.str(t.substring(pos, m.start))
        val tag = if (m.group(1) == "'''") "b" else "i"
        out += TreeNode(tag, children = Vector(TreeNode.str(m.group(2))))
        pos = m.end
      }
      if (pos < t.length) out += TreeNode.str(t.substring(pos))
      out.result()
    case other => Vector(other)
  }

  // -------------------------------------------------------------- parse
  def parse(src: SourceFile): RfcDoc.Parsed = parse(src, Conf())

  def parse(src: SourceFile, conf: Conf): RfcDoc.Parsed = {
    val docId = s"${src.repo}/${src.path}@${src.commit}"
    val graph = s"${EntityDict.base}/dataset/${src.repo}"
    val title = tagText(src.content, "title").getOrElse(
      throw new IllegalArgumentException(s"no <title> in $docId"))
    val wikitext = tagText(src.content, "text").getOrElse("")
    val uri = conf.mintUri(title)

    val r = render(wikitext, conf)
    val bodyXml = TreeNode.toXml(r.body)

    val triples = Vector.newBuilder[Triple]
    triples += Triple.lit(uri, Vocab.PROV + "wasGeneratedBy",
      "graft.parse.WikiDoc", graph)
    triples += Triple.uri(uri, Vocab.RDF_TYPE, Vocab.SKOS_CONCEPT, graph)
    triples += Triple.lit(uri, Vocab.dcterms("title"), title, graph,
      lang = Some(src.lang))
    r.subjects.foreach(s => triples += Triple.uri(uri,
      Vocab.dcterms("subject"), s, graph))
    // the description is the rendered body as an XML literal
    // (wiki.py:217-227 sets property=dcterms:description
    // datatype=rdf:XMLLiteral on the body)
    triples += Triple(uri, Vocab.dcterms("description"), bodyXml,
      objIsLiteral = true, Some(Vocab.RDF_XMLLITERAL), None, graph)

    RfcDoc.Parsed(docId, uri, title, None, bodyXml,
      RfcDoc.sha256Hex(src.content), triples.result(), Vector.empty)
  }
}

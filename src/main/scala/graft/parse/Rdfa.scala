package graft.parse

import graft.model.{Triple, Vocab}
import scala.collection.mutable

/** XHTML+RDFa render / distill — the reference's CANONICAL triple
  * semantic: ferenda defines a document's metadata graph as "whatever the
  * RDFa in the rendered parsed .xhtml artifacts distills to"
  * (/root/reference/ferenda/documentrepository.py:1497-1683 render_xhtml
  * + distill; decorators.py:203-227). graft emits triples directly (the
  * distributed pipeline needs no XML detour), so this module closes the
  * loop in the other direction: [[render]] serializes a document's graph
  * to the same XHTML+RDFa shape the reference writes, and [[distill]]
  * extracts the graph back out — RdfaSpec asserts (a) render∘distill is
  * the identity on corpus documents and (b) [[distill]] applied to the
  * REFERENCE'S OWN parsed fixtures (test/files/repo/rfc/parsed .xhtml files)
  * reproduces the reference's own distilled graphs
  * (test/files/repo/rfc/distilled .ttl files) exactly.
  *
  * The RDFa subset implemented is the subset ferenda emits: @about
  * subject scoping, @typeof, @property with @content / element text,
  * @rel + @href, @datatype, xml:lang inheritance (empty string clears),
  * CURIEs resolved against xmlns:* declarations. No bnodes, @resource
  * chaining, or @vocab — the reference's writer never produces them.
  */
object Rdfa {

  /** Namespace prefix table used by [[render]] (the same set the
    * reference's serializer binds). */
  val prefixes: Seq[(String, String)] = Seq(
    "dcterms" -> Vocab.DCTERMS,
    "bibo" -> Vocab.BIBO,
    "rfc" -> Vocab.RFC_NS,
    "rdf" -> "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "xsd" -> Vocab.XSD,
    "prov" -> Vocab.PROV,
    "rdfs" -> "http://www.w3.org/2000/01/rdf-schema#",
    "skos" -> "http://www.w3.org/2004/02/skos/core#",
    "foaf" -> "http://xmlns.com/foaf/0.1/",
    "owl" -> "http://www.w3.org/2002/07/owl#")

  private def curie(uri: String): String =
    prefixes.collectFirst {
      case (p, ns) if uri.startsWith(ns) => s"$p:${uri.substring(ns.length)}"
    }.getOrElse(uri) // RDFa 1.1 allows absolute IRIs in @property/@rel

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  // ------------------------------------------------------------- render
  /** Serialize one document's graph to XHTML+RDFa (the reference's
    * render_xhtml shape: head metas/links for the doc subject, one div
    * per sub-resource subject in the body, `<a rel="dcterms:references">`
    * for citation links). `refs` = (subjectUri, targetUri) citation
    * pairs (the reference renders mentions as body links). */
  def render(docUri: String, lang: Option[String],
             triples: Seq[Triple],
             refs: Seq[(String, String)] = Nil): String = {
    val langAttr = lang.getOrElse("")
    val bySubj = triples.groupBy(_.subj)
    val b = new StringBuilder
    b.append("<?xml version='1.0' encoding='utf-8'?>\n")
    b.append("<html xmlns=\"http://www.w3.org/1999/xhtml\"")
    prefixes.foreach { case (p, ns) =>
      b.append(s""" xmlns:$p="$ns"""")
    }
    b.append(s""" xml:lang="$langAttr" version="XHTML+RDFa 1.1">\n""")

    def emitTriple(pad: String, t: Triple, isTitle: Boolean): Unit =
      if (t.pred == Vocab.RDF_TYPE)
        b.append(s"""$pad<link rel="rdf:type" href="${esc(t.obj)}"/>\n""")
      else if (!t.objIsLiteral)
        b.append(s"""$pad<link rel="${esc(curie(t.pred))}" href="${esc(t.obj)}"/>\n""")
      else if (isTitle)
        b.append(s"""$pad<title xml:lang="${t.objLang.getOrElse("")}" """ +
          s"""property="${esc(curie(t.pred))}">${esc(t.obj)}</title>\n""")
      else {
        val dt = t.objDatatype.map(d => s""" datatype="${esc(curie(d))}"""")
          .getOrElse("")
        val lg =
          if (t.objDatatype.isDefined) ""
          else s""" xml:lang="${t.objLang.getOrElse("")}""""
        b.append(s"""$pad<meta$lg$dt property="${esc(curie(t.pred))}" """ +
          s"""content="${esc(t.obj)}"/>\n""")
      }

    // head: the document subject
    b.append(s"""  <head about="${esc(docUri)}">\n""")
    bySubj.getOrElse(docUri, Nil).sortBy(t => (t.pred, t.obj)).foreach { t =>
      emitTriple("    ", t, isTitle = t.pred == Vocab.dcterms("title"))
    }
    b.append("  </head>\n")

    // body: one div per sub-resource subject + citation links
    b.append(s"""  <body about="${esc(docUri)}">\n""")
    refs.filter(_._1 == docUri).distinct.sortBy(_._2).foreach { case (_, tgt) =>
      b.append(s"""    <a href="${esc(tgt)}" rel="dcterms:references"/>\n""")
    }
    bySubj.keys.filter(_ != docUri).toSeq.sorted.foreach { subj =>
      b.append(s"""    <div about="${esc(subj)}">\n""")
      bySubj(subj).sortBy(t => (t.pred, t.obj)).foreach(
        emitTriple("      ", _, isTitle = false))
      refs.filter(_._1 == subj).distinct.sortBy(_._2).foreach { case (_, tgt) =>
        b.append(s"""      <a href="${esc(tgt)}" rel="dcterms:references"/>\n""")
      }
      b.append("    </div>\n")
    }
    b.append("  </body>\n</html>\n")
    b.toString
  }

  // ------------------------------------------------------------ distill
  /** Extract the graph from XHTML+RDFa (the ferenda-emitted subset).
    * `graph` is stamped on every produced triple. */
  /** Hardened, namespace-unaware DOM parse shared by [[distill]] and
    * [[HtmlGenerate]]. XXE hardening: the input can be untrusted
    * (fixture artifacts are explicitly untrusted content), and the
    * ferenda-emitted subset never carries a DOCTYPE — reject doctypes
    * outright so an inline <!ENTITY x SYSTEM "file:..."> can't
    * exfiltrate local files into literal triples, and belt-and-braces
    * the external-entity switches. */
  private[parse] def secureDom(xml: String): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature(
      "http://xml.org/sax/features/external-general-entities", false)
    f.setFeature(
      "http://xml.org/sax/features/external-parameter-entities", false)
    f.setFeature(
      "http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
  }

  def distill(xhtml: String, graph: String = ""): Vector[Triple] = {
    val doc = secureDom(xhtml)
    val root = doc.getDocumentElement

    val pfx = mutable.HashMap.empty[String, String]
    val rootAttrs = root.getAttributes
    (0 until rootAttrs.getLength).foreach { i =>
      val a = rootAttrs.item(i)
      if (a.getNodeName.startsWith("xmlns:"))
        pfx(a.getNodeName.substring(6)) = a.getNodeValue
    }
    def expand(c: String): String =
      if (c.contains("://")) c
      else c.split(":", 2) match {
        case Array(p, l) if pfx.contains(p) => pfx(p) + l
        case _ => c
      }

    val out = Vector.newBuilder[Triple]
    def attr(e: org.w3c.dom.Element, n: String): Option[String] =
      if (e.hasAttribute(n)) Some(e.getAttribute(n)) else None

    // document base for fragment-relative hrefs ("#S4.5" → docUri#S4.5):
    // the first @about in document order (head/body carry the doc URI)
    var docBase: Option[String] = None
    def resolve(u: String): String =
      if (u.startsWith("#"))
        docBase.map(b => b.takeWhile(_ != '#') + u).getOrElse(u)
      else u

    def walk(n: org.w3c.dom.Node, subject: Option[String],
             lang: Option[String]): Unit = n match {
      case e: org.w3c.dom.Element =>
        val about = attr(e, "about").map(resolve)
        about.foreach(a => if (docBase.isEmpty) docBase = Some(a))
        val subj = about.orElse(subject)
        val effLang = attr(e, "xml:lang") match {
          case Some("") => None
          case Some(l) => Some(l)
          case None => lang
        }
        subj.foreach { s =>
          attr(e, "typeof").foreach(t =>
            out += Triple.uri(s, Vocab.RDF_TYPE, expand(t), graph))
          attr(e, "property").foreach { p =>
            val content = attr(e, "content").getOrElse(e.getTextContent)
            val dt = attr(e, "datatype").map(expand)
            out += Triple.lit(s, expand(p), content, graph,
              datatype = dt, lang = if (dt.isDefined) None else effLang)
          }
          for (r <- attr(e, "rel"); h <- attr(e, "href"))
            out += Triple.uri(s, expand(r), resolve(h), graph)
        }
        val kids = e.getChildNodes
        (0 until kids.getLength).foreach(i => walk(kids.item(i), subj, effLang))
      case _ => ()
    }
    walk(root, None, attr(root, "xml:lang").filter(_.nonEmpty))
    out.result().distinct
  }
}

package graft.parse

import org.w3c.dom.{Element, Node}
import scala.collection.mutable

/** Word-document text extraction — the reference's WordReader
  * (/root/reference/ferenda/wordreader.py) for the MODERN (.docx)
  * path, which needs no external tooling: the OOXML payload is
  * `word/document.xml` inside a zip (word_to_ooxml,
  * wordreader.py:113-127), simplified to the tag subset downstream
  * parsers consume (simplify-ooxml.xsl semantics: keep
  * document/body/tbl/tr/tc/p/t, runs that carry text, bold/italic
  * formatting markers; drop every other element subtree and ALL
  * attributes) and adjacent runs with identical formatting merged
  * into one (_merge_ooxml, wordreader.py:148-177).
  *
  * File-type sniffing mirrors the reference's "suffixes are not always
  * truthful" rule (wordreader.py:42-68): a zip signature means OOXML
  * regardless of the .doc suffix (its antiword-failure retry,
  * re-expressed as a magic-byte check). The legacy binary .doc path is
  * out of scope, cited: it shells out to antiword, which this sandbox
  * does not ship — exactly the class of external-binary dependency the
  * pdf2xml artifact boundary avoids for PDFs.
  *
  * Pure per-row logic: bytes in, intermediate XML out — usable over a
  * binary document column in a Dataset map stage.
  */
object WordReader {

  val OoxmlNs = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

  /** read() (wordreader.py:33-70): sniff + convert. Returns
    * (filetype, intermediate XML). */
  def read(bytes: Array[Byte], filename: String): (String, String) = {
    val isZip = bytes.length > 2 && bytes(0) == 'P' && bytes(1) == 'K'
    if (isZip) ("docx", wordToOoxml(bytes))
    else throw new UnsupportedOperationException(
      s"$filename: legacy binary .doc needs antiword (out of scope)")
  }

  /** word_to_ooxml (wordreader.py:113-127): unzip word/document.xml,
    * simplify, merge runs. */
  def wordToOoxml(bytes: Array[Byte], simplify: Boolean = true): String = {
    val zis = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    var entry = zis.getNextEntry
    var data: Array[Byte] = null
    while (entry != null && data == null) {
      if (entry.getName == "word/document.xml")
        data = zis.readAllBytes()
      else entry = zis.getNextEntry
    }
    zis.close()
    require(data != null, "No word/document.xml in zipfile")
    var xml = new String(data, "UTF-8")
    // the reference's control-char x81 workaround (wordreader.py:130-135)
    if (xml.contains('\u0081')) xml = xml.replace('\u0081', '\u00c5')
    if (simplify) mergeOoxml(simplifyOoxml(xml)) else xml
  }

  private def parse(xml: String): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
  }

  private def kids(e: Element): Vector[Element] = {
    val ns = e.getChildNodes
    (0 until ns.getLength).map(ns.item)
      .collect { case el: Element => el }.toVector
  }
  private def local(e: Element): String =
    Option(e.getLocalName).getOrElse(e.getNodeName)

  /** simplify-ooxml.xsl semantics: the keep-set copies (namespace
    * preserved, attributes dropped), text nodes copy, every other
    * element subtree is removed. */
  final case class SimpleNode(tag: String, text: Option[String],
                              children: Vector[SimpleNode])

  private def keep(e: Element): Boolean = local(e) match {
    case "document" | "body" | "tbl" | "t" | "tr" | "tc" | "p" => true
    case "r" => kids(e).exists(local(_) == "t") // w:r[w:t]
    case "pPr" => // w:pPr[w:rPr/w:b] (the |w:i arm of the union
                  // pattern matches w:i itself, not a pPr predicate)
      kids(e).exists(c => local(c) == "rPr" &&
        kids(c).exists(local(_) == "b"))
    case "rPr" => kids(e).exists(c => local(c) == "b" || local(c) == "i")
    case "b" | "i" => true
    case _ => false
  }

  private def simplifyNode(n: Node): Vector[SimpleNode] = n match {
    case e: Element =>
      if (!keep(e)) Vector.empty // dropped subtree (default template)
      else {
        val cs = e.getChildNodes
        val children = (0 until cs.getLength).flatMap(i =>
          simplifyNode(cs.item(i))).toVector
        Vector(SimpleNode(local(e), None, children))
      }
    case t if t.getNodeType == Node.TEXT_NODE ||
              t.getNodeType == Node.CDATA_SECTION_NODE =>
      val s = t.getNodeValue
      if (s.isEmpty) Vector.empty
      else Vector(SimpleNode("#text", Some(s), Vector.empty))
    case _ => Vector.empty
  }

  def simplifyOoxml(xml: String): SimpleNode =
    simplifyNode(parse(xml).getDocumentElement).headOption
      .getOrElse(SimpleNode("document", None, Vector.empty))

  /** _merge_ooxml (wordreader.py:148-177): within each w:p, adjacent
    * runs with identical formatting (equal simplified w:rPr subtree —
    * both absent counts as equal) merge by concatenating their w:t
    * strings. */
  def mergeOoxml(root: SimpleNode): String = {
    def rprOf(r: SimpleNode): Option[SimpleNode] =
      r.children.find(_.tag == "rPr")
    def tText(r: SimpleNode): String =
      r.children.find(_.tag == "t")
        .map(_.children.flatMap(_.text).mkString).getOrElse("")
    def withT(r: SimpleNode, s: String): SimpleNode =
      r.copy(children = r.children.map { c =>
        if (c.tag == "t")
          c.copy(children = Vector(SimpleNode("#text", Some(s),
            Vector.empty)))
        else c
      })
    def mergeP(p: SimpleNode): SimpleNode = {
      // consecutive means consecutive IN THE RUN SUBSEQUENCE — the
      // reference iterates p.find_all("w:r"), so interleaved text
      // nodes don't break adjacency
      val out = mutable.ArrayBuffer.empty[SimpleNode]
      var lastR = -1
      p.children.foreach { c =>
        if (c.tag == "r" && lastR >= 0 && rprOf(out(lastR)) == rprOf(c))
          out(lastR) = withT(out(lastR), tText(out(lastR)) + tText(c))
        else {
          out += c
          if (c.tag == "r") lastR = out.length - 1
        }
      }
      p.copy(children = out.toVector)
    }
    def walk(n: SimpleNode): SimpleNode =
      if (n.tag == "p") mergeP(n)
      else n.copy(children = n.children.map(walk))
    serialize(walk(root))
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Pretty serialization of the simplified tree; the root carries the
    * OOXML namespace declaration (xsl:copy preserves namespaces even
    * though attributes are stripped). */
  def serialize(root: SimpleNode): String = {
    val sb = new StringBuilder
    def render(n: SimpleNode, indent: Int): Unit = n.text match {
      case Some(t) => sb.append(esc(t))
      case None =>
        val pad = " " * indent
        val nsAttr =
          if (indent == 0) s""" xmlns:w="$OoxmlNs"""" else ""
        if (n.children.isEmpty)
          sb.append(s"$pad<w:${n.tag}$nsAttr/>\n")
        else if (n.children.forall(_.text.isDefined)) {
          sb.append(s"$pad<w:${n.tag}$nsAttr>")
          n.children.foreach(render(_, 0))
          sb.append(s"</w:${n.tag}>\n")
        } else {
          sb.append(s"$pad<w:${n.tag}$nsAttr>\n")
          n.children.foreach(render(_, indent + 2))
          sb.append(s"$pad</w:${n.tag}>\n")
        }
    }
    render(root, 0)
    sb.toString
  }

  /** Plain text of the simplified document (paragraph per line) — the
    * distributed summary column. */
  def text(xml: String): String = {
    val doc = parse(xml)
    val ts = doc.getElementsByTagNameNS(OoxmlNs, "t")
    (0 until ts.getLength).map(ts.item(_).getTextContent).mkString("\n")
  }
}

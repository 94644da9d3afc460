package graft.parse

/** Document element tree — the per-row hierarchical IR of the parse stage.
  *
  * Mirrors the reference's element model
  * (/root/reference/ferenda/elements/elements.py:96-717): a node is either
  * string-based ("unicode element": text, no children — e.g. RFCHeader,
  * DocTitle) or list-based ("compound element": children, where a plain
  * string child serializes as <str>). Attributes keep insertion order
  * (ordinal, title, identifier — elements.py:611-677).
  *
  * The tree never crosses a Catalyst boundary as a struct: it lives inside
  * typed map stages and serializes to an XML string column between stages
  * (SURVEY.md §1.1), matching the reference's own serialization
  * (elements.py:53-93).
  */
final case class TreeNode(
    tag: String,
    attrs: Vector[(String, String)] = Vector.empty,
    text: Option[String] = None,
    children: Vector[TreeNode] = Vector.empty) {

  def attr(name: String): Option[String] = attrs.find(_._1 == name).map(_._2)

  def appendChild(c: TreeNode): TreeNode = copy(children = children :+ c)

  /** Plain-string child of a compound element (serializes as <str>). */
  def appendText(s: String): TreeNode = appendChild(TreeNode.str(s))
}

object TreeNode {
  def str(s: String): TreeNode = TreeNode("str", text = Some(s))

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
  private def escAttr(s: String): String = esc(s).replace("\"", "&quot;")

  /** XML serialization (stage-boundary format; shape matches the golden
    * fixture format of elements.py:869-920). */
  def toXml(n: TreeNode): String = {
    val sb = new StringBuilder
    def render(n: TreeNode): Unit = {
      sb.append('<').append(n.tag)
      n.attrs.foreach { case (k, v) =>
        sb.append(' ').append(k).append("=\"").append(escAttr(v)).append('"')
      }
      sb.append('>')
      n.text.foreach(t => sb.append(esc(t)))
      n.children.foreach(render)
      sb.append("</").append(n.tag).append('>')
    }
    render(n)
    sb.toString
  }

  /** Canonical comparable form: tag, sorted attrs, text, children —
    * whitespace between elements is formatting noise and never appears here
    * (the test-side DOM canonicalizer drops it the same way, cf.
    * assertEqualXML's c14n in the reference, testutil.py:139-276). */
  def canonical(n: TreeNode): String = {
    val sb = new StringBuilder
    def render(n: TreeNode): Unit = {
      sb.append('(').append(n.tag)
      n.attrs.sortBy(_._1).foreach { case (k, v) =>
        sb.append(' ').append(k).append('=').append(v)
      }
      n.text.foreach(t => sb.append('|').append(t))
      n.children.foreach { c => sb.append(' '); render(c) }
      sb.append(')')
    }
    render(n)
    sb.toString
  }

  /** Parse the XML produced by [[toXml]] back into a tree (stage-boundary
    * decode; also used to canonicalize golden fixture files). Whitespace-only
    * text inside an element that has element children is formatting and is
    * dropped; otherwise text is content. */
  def fromXml(xml: String): TreeNode = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    val doc = dbf.newDocumentBuilder().parse(
      new org.xml.sax.InputSource(new java.io.StringReader(xml)))
    def conv(e: org.w3c.dom.Element): TreeNode = {
      val atts = e.getAttributes
      val attrs = (0 until atts.getLength).map { i =>
        val a = atts.item(i)
        a.getNodeName -> a.getNodeValue
      }.toVector
      val nodes = e.getChildNodes
      val elemKids = (0 until nodes.getLength).map(nodes.item)
        .collect { case el: org.w3c.dom.Element => el }
      if (elemKids.nonEmpty)
        TreeNode(e.getTagName, attrs, None, elemKids.map(conv).toVector)
      else {
        val t = e.getTextContent
        TreeNode(e.getTagName, attrs, if (t.isEmpty) None else Some(t))
      }
    }
    conv(doc.getDocumentElement)
  }
}

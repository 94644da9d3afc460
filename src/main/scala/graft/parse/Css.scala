package graft.parse

/** CSS-lite selector engine over [[TreeNode]] — the role BeautifulSoup's
  * `select` plays in the reference's content extraction: a repo declares
  * `parse_content_selector` (the subtree to keep) and
  * `parse_filter_selectors` (subtrees to drop before parsing) and the
  * framework applies them to the soup
  * (/root/reference/ferenda/documentrepository.py:1222-1249,
  * soup_from_basefile → filter_soup).
  *
  * Supported grammar (the subset those hooks actually use): a selector is
  * whitespace-separated simple selectors with DESCENDANT combination;
  * a simple selector is `tag`, `#id`, `tag#id`, `[attr=val]`,
  * `tag[attr=val]`, with any number of attribute tests. Pure per-row
  * Scala — runs inside the parse stage on executors.
  */
object Css {

  final case class Simple(
      tag: Option[String],
      attrs: Seq[(String, String)],
      /** `.cls` tests: token membership in the class attribute (the
        * CSS/BeautifulSoup semantics — class="div1 toc" matches .toc). */
      classes: Seq[String] = Nil) {
    def matches(n: TreeNode): Boolean =
      tag.forall(_ == n.tag) &&
        attrs.forall { case (k, v) => n.attr(k).contains(v) } &&
        classes.forall(c => n.attr("class").exists(
          _.split("\\s+").contains(c)))
  }

  private val SimpleRe =
    """^([A-Za-z][\w-]*)?(#[\w.-]+)?((?:\.[\w-]+)*)((?:\[[\w-]+=[^\]]*\])*)$""".r
  private val AttrRe = """\[([\w-]+)=([^\]]*)\]""".r

  /** Parse "nav", "div#main", "div.toc",
    * "Section[title=IANA Considerations] p" … into a descendant chain.
    * Throws on syntax it doesn't support. */
  def parse(selector: String): Seq[Simple] =
    selector.trim.split("\\s+").toSeq.map {
      case SimpleRe(tag, id, cls, attrs) =>
        val idAttr = Option(id).map(i => "id" -> i.substring(1)).toSeq
        val classes = Option(cls).filter(_.nonEmpty).toSeq
          .flatMap(_.split("\\.").filter(_.nonEmpty))
        val kvs = Option(attrs).filter(_.nonEmpty).toSeq.flatMap(a =>
          AttrRe.findAllMatchIn(a).map(m => m.group(1) -> m.group(2)))
        Simple(Option(tag), idAttr ++ kvs, classes)
      case bad => throw new IllegalArgumentException(s"unsupported selector: $bad")
    }

  /** All nodes matching the full descendant chain, document order.
    * `prefixes` = chain-prefix lengths satisfied along the ancestor path
    * (a set — with repeated tags several prefixes can be live at once). */
  def select(root: TreeNode, selector: String): Vector[TreeNode] = {
    val chain = parse(selector)
    val out = Vector.newBuilder[TreeNode]
    def walk(n: TreeNode, prefixes: Set[Int]): Unit = {
      val here = prefixes.collect {
        case k if k < chain.length && chain(k).matches(n) => k + 1
      }
      if (here.contains(chain.length)) out += n
      n.children.foreach(walk(_, prefixes ++ here))
    }
    walk(root, Set(0))
    out.result()
  }

  /** First match or none (parse_content_selector semantics: soup.select
    * then take the first hit, documentrepository.py:1234-1238). */
  def selectFirst(root: TreeNode, selector: String): Option[TreeNode] =
    select(root, selector).headOption

  /** Remove every subtree matching any selector (filter_soup /
    * parse_filter_selectors semantics: decompose() the matches,
    * documentrepository.py:1240-1249). The root itself is never removed. */
  def filterOut(root: TreeNode, selectors: Seq[String]): TreeNode = {
    val chains = selectors.map(parse)
    def walk(n: TreeNode, prefixes: Seq[Set[Int]]): TreeNode = {
      val kept = n.children.flatMap { c =>
        val here = chains.indices.map { ci =>
          prefixes(ci).collect {
            case k if k < chains(ci).length && chains(ci)(k).matches(c) => k + 1
          }
        }
        if (here.zipWithIndex.exists { case (s, ci) => s.contains(chains(ci).length) })
          None // matched a full chain → drop subtree
        else Some(walk(c, prefixes.zip(here).map { case (p, h) => p ++ h }))
      }
      n.copy(children = kept)
    }
    walk(root, chains.map(_ => Set(0)))
  }
}

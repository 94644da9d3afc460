package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.{Css, HtmlDoc, TreeNode}
import graft.kg.Corpus
import graft.model.Triple

/** HTML document family: tag-soup reader, CSS content/filter selectors,
  * and parse P/R against independently generated ground truth. */
class HtmlSpec extends AnyFunSuite {

  test("css: tag, #id, [attr=val], descendant chains") {
    val tree = TreeNode("root", children = Vector(
      TreeNode("div", Vector("id" -> "main"), children = Vector(
        TreeNode("p", children = Vector(TreeNode.str("a"))),
        TreeNode("nav", children = Vector(
          TreeNode("p", children = Vector(TreeNode.str("menu"))))))),
      TreeNode("p", children = Vector(TreeNode.str("outside")))))
    assert(Css.select(tree, "p").size == 3)
    assert(Css.select(tree, "div p").size == 2)
    assert(Css.select(tree, "nav p").size == 1)
    assert(Css.selectFirst(tree, "div#main").isDefined)
    assert(Css.select(tree, "div[id=main] p").size == 2)
    assert(Css.select(tree, "div[id=other]").isEmpty)
    // filterOut removes matching subtrees, keeps the rest
    val filtered = Css.filterOut(tree, Seq("nav"))
    assert(Css.select(filtered, "p").size == 2)
    assert(Css.select(filtered, "nav").isEmpty)
  }

  test("soup: constrained tag subset round-trips structure") {
    val t = HtmlDoc.soup(
      """<html><body><h1>T</h1><p>x <b>y</b> z</p><ul><li>a</li></ul></body></html>""")
    assert(Css.selectFirst(t, "h1").flatMap(_.children.head.text).contains("T"))
    assert(Css.select(t, "li").size == 1)
    assert(Css.select(t, "b").size == 1)
  }

  test("html family: P/R = 1.0 vs ground truth; nav/footer/pre produce nothing") {
    val docs = (0L until 60L).map(Corpus.htmlDoc(42L, _, 60L))
    var tp = 0; var fp = 0; var fn = 0
    docs.foreach { d =>
      val parsed = graft.parse.DocParsers.parse(d.src)
      // reference triples from mentions (what linkTriplesDf would emit)
      val refTriples = parsed.mentions.map(m => Triple.uri(
        m.subjUri, graft.model.Vocab.dcterms("references"), m.candidateKey,
        s"${graft.kg.EntityDict.base}/dataset/${d.src.repo}")).distinct
      val provLess = parsed.triples.filterNot(
        _.pred == graft.model.Vocab.PROV + "wasGeneratedBy")
      val got = (provLess ++ refTriples).toSet
      val want = d.truth.toSet
      tp += got.intersect(want).size
      fp += got.diff(want).size
      fn += want.diff(got).size
      // boilerplate must never leak: no mention text from nav/footer/pre
      assert(!parsed.mentions.exists(_.matchText.contains("9999")))
    }
    val p = tp.toDouble / (tp + fp)
    val r = tp.toDouble / (tp + fn)
    info(f"html family: P=$p%.4f R=$r%.4f over ${docs.size} docs")
    assert(p == 1.0 && r == 1.0, f"P=$p%.3f R=$r%.3f")
  }
}

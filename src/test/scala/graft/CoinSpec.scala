package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.rng.Seed
import graft.kg.{Coin, EntityDict}
import graft.kg.Coin._

/** COIN URIMinter engine (coin.py port): template priority resolution,
  * slug pipeline, fragment minting, and byte parity with the round-1
  * hardcoded URI forms (ground-truth compatibility). */
class CoinSpec extends AnyFunSuite {

  private def check(p: Prop, name: String): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(200)
        .withInitialSeed(Seed(42L)), p)
    assert(res.passed, s"$name: $res")
  }

  test("minted URIs are byte-identical to the legacy hardcoded forms") {
    assert(Coin.rfcUri("1234") == EntityDict.canonicalRfcUri("1234"))
    assert(Coin.rfcUri("9") == s"${EntityDict.base}/rfc/9")
    assert(Coin.readmeUri("repo-3", "readme-17") ==
      s"${EntityDict.base}/doc/repo-3/readme-17")
    assert(Coin.sectionUri(s"${EntityDict.base}/rfc/1234", "2.1") ==
      s"${EntityDict.base}/rfc/1234#S2.1")
    assert(Coin.celexUri("31995L0046") ==
      s"${EntityDict.base}/celex/31995L0046")
  }

  test("slug parity with EntityDict.slug on single-spaced label text") {
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val label = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    check(Prop.forAll(label) { l =>
      Coin.slugLike(l) == EntityDict.slug(l)
    }, "slug parity")
  }

  test("slug parity holds for labels with './_#' punctuation and space runs") {
    // ADVICE r2: the r2 slugLike kept './#' that EntityDict.slug drops —
    // a repo or stem containing '.', '/', '_' or '#' minted a URI that
    // diverged from ground truth (and '/' injected extra path segments)
    val piece = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
      Gen.oneOf(".", "/", "_", "#", ",", ":", "(", ")", "  ", " "))
    val label = Gen.nonEmptyListOf(piece).map(_.mkString)
      .suchThat(_.exists(_.isLetterOrDigit))
    check(Prop.forAll(label) { l =>
      Coin.slugLike(l) == EntityDict.slug(l)
    }, "punctuated slug parity")
    // spot checks incl. the path-injection case
    assert(Coin.slugLike("v1.2/3#x_y") == EntityDict.slug("v1.2/3#x_y"))
    assert(Coin.readmeUri("re/po", "st.em") ==
      s"${EntityDict.base}/doc/${EntityDict.slug("re/po")}/${EntityDict.slug("st.em")}")
    assert(!Coin.readmeUri("re/po", "stem").contains("re/po"))
  }

  test("round-trip: template-minted URI parses back to its variables") {
    val num = Gen.choose(1L, 999999L).map(_.toString)
    check(Prop.forAll(num) { n =>
      val uri = Coin.rfcUri(n)
      uri == s"${EntityDict.base}/rfc/$n" &&
        Coin.uriLeaf(uri) == n
    }, "rfc round-trip")
    val ord = for {
      major <- Gen.choose(1, 99)
      minor <- Gen.option(Gen.choose(1, 9))
    } yield minor.map(m => s"$major.$m").getOrElse(major.toString)
    check(Prop.forAll(ord) { o =>
      val doc = s"${EntityDict.base}/rfc/42"
      val uri = Coin.sectionUri(doc, o)
      uri == s"$doc#S$o" && uri.substring(uri.indexOf("#S") + 2) == o
    }, "section round-trip")
  }

  test("priority order wins; specificity breaks priority ties (coin.py:38-41)") {
    val space = new UriSpace("https://example.org", "/",
      SlugTransform(toLowerCase = true, spaceReplacement = "-"),
      Seq(
        Template(uriTemplate = Some("/low/{a}"), priority = 1,
          bindings = Seq(Binding("p:a", "a"))),
        Template(uriTemplate = Some("/high/{a}"), priority = 9,
          bindings = Seq(Binding("p:a", "a"))),
        // same priority, more bindings → preferred when both match
        Template(uriTemplate = Some("/wide/{a}/{b}"), priority = 9,
          bindings = Seq(Binding("p:a", "a"), Binding("p:b", "b"))),
        // typed beats untyped at equal priority/binding count
        Template(uriTemplate = Some("/typed/{a}"), priority = 9,
          forType = Some("t:X"), bindings = Seq(Binding("p:a", "a")))))
    // only a → the single-binding priority-9 templates; typed is filtered
    // out (no type), so /high wins over /low
    assert(space.coinUri(Res.of("p:a" -> "v")) == "https://example.org/high/v")
    // a+b → the wider template wins within priority 9
    assert(space.coinUri(Res.of("p:a" -> "v", "p:b" -> "w")) ==
      "https://example.org/wide/v/w")
    // typed resource → the typed template outranks untyped same-priority
    assert(space.coinUri(Res(Map("p:a" -> Seq("v"),
        graft.model.Vocab.RDF_TYPE -> Seq("t:X")))) ==
      "https://example.org/typed/v")
    // nothing matches → error (coin.py:48-53 StopIteration → ValueError)
    intercept[IllegalArgumentException](space.coinUri(Res.of("p:z" -> "v")))
  }

  test("binding matchValue filter and forType gate") {
    val space = new UriSpace("https://example.org", "/", SlugTransform(),
      Seq(Template(uriTemplate = Some("/bcp/{n}"), priority = 5,
        bindings = Seq(Binding("p:n", "n"), Binding("p:kind", "kind",
          matchValue = Some("bcp")))),
        Template(uriTemplate = Some("/plain/{n}"), priority = 1,
          bindings = Seq(Binding("p:n", "n")))))
    assert(space.coinUri(Res.of("p:n" -> "7", "p:kind" -> "bcp")) ==
      "https://example.org/bcp/7")
    assert(space.coinUri(Res.of("p:n" -> "7", "p:kind" -> "std")) ==
      "https://example.org/plain/7")
  }

  test("fragment template: '#' vs fragmentSeparator for nested fragments") {
    val space = new UriSpace("https://example.org", "/",
      SlugTransform(),
      Seq(Template(fragmentTemplate = Some("S{o}"), priority = 5,
        relToBase = Some("p:doc"), bindings = Seq(Binding("p:o", "o")))))
    val doc = "https://example.org/rfc/1"
    assert(space.coinUri(Res.of("p:doc" -> doc, "p:o" -> "3")) == s"$doc#S3")
    // base already fragmented → fragmentSeparator joins (coin.py:153-159)
    assert(space.coinUri(Res.of("p:doc" -> s"$doc#S3", "p:o" -> "4")) ==
      s"$doc#S3/S4")
    // guarded base: out-of-space base never mints (coin.py:182-193)
    intercept[IllegalArgumentException](
      space.coinUri(Res.of("p:doc" -> "https://evil.example/x", "p:o" -> "3")))
  }

  test("slug pipeline order is the reference's (lower→replace→space→strip)") {
    val st = SlugTransform(toLowerCase = true,
      replace = Seq("å" -> "a", "ä" -> "a", "ö" -> "o"),
      spaceReplacement = "-", stripPattern = Some("[^a-z0-9-]"))
    assert(st("Översikt Över Å") == "oversikt-over-a")
    // strip runs LAST: chars the replace step produced survive
    assert(st("A B!C") == "a-bc")
  }
}

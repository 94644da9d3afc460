package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.MyndFskr

/** Unit pins for the MyndFskr helpers, complementing the 19-fixture
  * golden suite (MyndFskrGoldenSpec). */
class MyndFskrSpec extends AnyFunSuite {

  test("normalizeSpace strips Unicode whitespace like Python str.split()") {
    // U+202F narrow no-break space, U+2009 thin space — both occur in
    // the reference's PDF-extracted fixtures
    assert(MyndFskr.normalizeSpace("18 § f x  y\n z") ==
      "18 § f x y z")
    assert(MyndFskr.normalizeSpace("  ") == "")
  }

  test("toRinfoSfs: kapitel/paragraf only, letter suffix split") {
    assert(MyndFskr.toRinfoSfs("https://lagen.nu/1977:1166#P18") ==
      "http://rinfo.lagrummet.se/publ/sfs/1977:1166#p_18")
    assert(MyndFskr.toRinfoSfs("https://lagen.nu/1957:601#K5P2") ==
      "http://rinfo.lagrummet.se/publ/sfs/1957:601#k_5-p_2")
    assert(MyndFskr.toRinfoSfs("https://lagen.nu/1992:308#P19a") ==
      "http://rinfo.lagrummet.se/publ/sfs/1992:308#p_19_a")
    // stycke/punkt components are dropped (not in the rinfo fragment
    // space — the fixture graphs' shape)
    assert(MyndFskr.toRinfoSfs("https://lagen.nu/2011:257#K7P2S1N36") ==
      "http://rinfo.lagrummet.se/publ/sfs/2011:257#k_7-p_2")
    assert(MyndFskr.toRinfoSfs("https://lagen.nu/2011:834") ==
      "http://rinfo.lagrummet.se/publ/sfs/2011:834")
  }

  test("parseSwedishDate: prose, ISO, end-of-month, end-of-year") {
    assert(MyndFskr.parseSwedishDate("3 februari 2010") == "2010-02-03")
    assert(MyndFskr.parseSwedishDate("2013-11-08") == "2013-11-08")
    assert(MyndFskr.parseSwedishDate("vid utgången av december 1999") ==
      "1999-12-31")
    assert(MyndFskr.parseSwedishDate("vid utgången av februari 2004") ==
      "2004-02-29") // leap year
    // the reference maps the word "år" to December
    assert(MyndFskr.parseSwedishDate("vid utgången av år 2006") ==
      "2006-12-31")
    intercept[Exception](MyndFskr.parseSwedishDate("nästa vecka"))
  }

  test("sanitizeBasefile: identifier-derived series fragment " +
       "(myndfskr.py:210-226)") {
    // 3 segments: the identifier's own FS label mints the fragment,
    // even when it names a different series than the assumed basefile
    assert(MyndFskr.sanitizeBasefile("DVFS 2012:4", "afs") == "dvfs/2012:4")
    // leading-zero ordinals are integer-normalized
    assert(MyndFskr.sanitizeBasefile("SJVFS 1991:02", "sjvfs") ==
      "sjvfs/1991:2")
    // 4 segments with a hyphenated FS label: hyphen eliminated
    assert(MyndFskr.sanitizeBasefile("ELSÄK-FS 2012:4", "afs") ==
      "elsäkfs/2012:4")
    // 2 segments: no series part — fall back to the repo's series
    assert(MyndFskr.sanitizeBasefile("2012:4", "afs") == "afs/2012:4")
  }

  test("lookupOrg: exact, then difflib-style fuzzy at cutoff 0.8") {
    val res = MyndFskr.Resources(Map.empty, Map.empty, Map(
      "Arbetsmiljöverket" -> "http://rinfo.lagrummet.se/org/arbetsmiljoeverket",
      "Naturvårdsverket" -> "http://rinfo.lagrummet.se/org/naturvaardsverket"))
    assert(MyndFskr.lookupOrg("Arbetsmiljöverket", res).isDefined)
    // one-character typo still clears the 0.8 ratio
    assert(MyndFskr.lookupOrg("Arbetsmiljöverke", res) ==
      Some("http://rinfo.lagrummet.se/org/arbetsmiljoeverket"))
    // unrelated label does not
    assert(MyndFskr.lookupOrg("Finansinspektionen", res).isEmpty)
  }
}

package graft.kg

/** Minted-URI entity dictionary + lookup semantics.
  *
  * Plays the role of the reference's commondata label graph probed by
  * lookup_resource (/root/reference/ferenda/documentrepository.py:500-547):
  * exact label match first, then fuzzy candidate match with cutoff 0.8.
  * URI minting follows COIN-style slug transforms
  * (/root/reference/ferenda/thirdparty/coin.py:57-98): lowercase, spaces →
  * '-', strip non-alphanumerics.
  *
  * At scale the dictionary is a broadcast dim table (small side of the
  * entity-linking join); this object is the driver-side builder plus the
  * per-row probe used inside the parse stage.
  */
object EntityDict {

  val base = "https://example.org"

  /** COIN-style slug (coin.py:57-98): lowercase, keep [a-z0-9-],
    * space-runs → '-', everything else dropped. Dashes in the input are
    * preserved (they are already URL-safe — and the corpus repo/file
    * names carry them). */
  def slug(label: String): String =
    label.toLowerCase
      .replaceAll("[^a-z0-9 -]", "")
      .trim
      .replaceAll(" +", "-")

  def canonicalRfcUri(num: String): String = s"$base/rfc/$num"

  /** Known publishing organizations (role of the reference's commondata,
    * rfc.py header org line → dcterms:publisher). */
  val publishers: Map[String, String] = Map(
    "Internet Engineering Task Force (IETF)" -> s"$base/org/ietf",
    "Internet Engineering Task Force" -> s"$base/org/ietf",
    "Network Working Group" -> s"$base/org/nwg",
    "Internet Architecture Board (IAB)" -> s"$base/org/iab",
    "Internet Research Task Force (IRTF)" -> s"$base/org/irtf",
    "Independent Submission" -> s"$base/org/independent")

  /** RFC category labels → subject URIs (rfc.py "Category:" header). */
  val categories: Map[String, String] =
    Seq("Standards Track", "Informational", "Experimental",
        "Best Current Practice", "Historic")
      .map(c => c -> s"$base/def/category/${slug(c)}").toMap

  /** Similarity ratio in the spirit of difflib.SequenceMatcher.ratio
    * (2*M/T over matching characters); LCS-based public approximation. */
  def ratio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val m = Array.ofDim[Int](a.length + 1, b.length + 1)
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < b.length) {
        m(i + 1)(j + 1) =
          if (a(i) == b(j)) m(i)(j) + 1
          else math.max(m(i)(j + 1), m(i + 1)(j))
        j += 1
      }
      i += 1
    }
    2.0 * m(a.length)(b.length) / (a.length + b.length)
  }

  /** lookup_resource semantics: exact, else best fuzzy ≥ cutoff 0.8
    * (documentrepository.py:539-545). */
  def lookup(dict: Map[String, String], label: String,
             cutoff: Double = 0.8): Option[String] =
    dict.get(label).orElse {
      val cands = dict.keysIterator
        .map(k => (k, ratio(label, k)))
        .filter(_._2 >= cutoff)
      if (cands.isEmpty) None
      else Some(dict(cands.maxBy(_._2)._1))
    }
}

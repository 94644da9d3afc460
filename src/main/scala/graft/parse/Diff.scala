package graft.parse

import scala.collection.mutable

/** Unified-diff GENERATION — the other half of the patch surface
  * ([[Patch]] applies; this creates). The reference's devel.mkpatch
  * (/root/reference/ferenda/devel.py:919-1053) stashes an edited
  * intermediate, regenerates a pristine one, and runs Python's stdlib
  * `difflib.unified_diff` over the two line lists; this is a faithful
  * port of that stdlib machinery (SequenceMatcher without a junk
  * predicate, exactly as difflib's module-level helpers use it):
  *
  *  - b2j index of the b-side, with the autojunk rule: at >= 200
  *    lines, elements occurring more than len(b)//100 + 1 times are
  *    dropped from the index (still matchable via extension);
  *  - find_longest_match: the j2len dynamic program picking the
  *    earliest-starting longest block, then front/back extension over
  *    equal elements;
  *  - get_matching_blocks: the queue-based divide and conquer with
  *    adjacent-block merging;
  *  - get_opcodes / get_grouped_opcodes(n): context trimming and the
  *    2n-gap hunk split;
  *  - unified_diff's ---/+++ headers, @@ range formatting (including
  *    the length-0 and length-1 forms), and ' '/'-'/'+' body lines.
  *
  * DiffSpec pins the port to stdlib difflib byte-for-byte via
  * generated golden fixtures (tools/gen_diff_golden.py), and
  * round-trips generated patches through [[Patch]].
  */
object Diff {

  final class SequenceMatcher(a: IndexedSeq[String], b: IndexedSeq[String],
                              autojunk: Boolean = true) {
    private val b2j = mutable.HashMap.empty[String, mutable.ArrayBuffer[Int]]
    b.zipWithIndex.foreach { case (elt, i) =>
      b2j.getOrElseUpdate(elt, mutable.ArrayBuffer.empty[Int]) += i
    }
    if (autojunk && b.length >= 200) {
      val ntest = b.length / 100 + 1
      val popular = b2j.collect {
        case (elt, idxs) if idxs.length > ntest => elt
      }.toVector
      popular.foreach(b2j -= _)
    }

    /** find_longest_match over a[alo,ahi) × b[blo,bhi): the earliest
      * longest matching block (i, j, size). With no junk predicate the
      * two junk-extension phases are no-ops and plain extension runs. */
    def findLongestMatch(alo: Int, ahi: Int, blo: Int,
                         bhi: Int): (Int, Int, Int) = {
      var besti = alo; var bestj = blo; var bestsize = 0
      var j2len = mutable.HashMap.empty[Int, Int]
      var i = alo
      while (i < ahi) {
        val newj2len = mutable.HashMap.empty[Int, Int]
        b2j.get(a(i)) match {
          case Some(idxs) =>
            var x = 0
            var done = false
            while (x < idxs.length && !done) {
              val j = idxs(x)
              if (j >= bhi) done = true // ascending: nothing more fits
              else if (j >= blo) {
                val k = j2len.getOrElse(j - 1, 0) + 1
                newj2len(j) = k
                if (k > bestsize) {
                  besti = i - k + 1; bestj = j - k + 1; bestsize = k
                }
              }
              x += 1
            }
          case None => ()
        }
        j2len = newj2len
        i += 1
      }
      while (besti > alo && bestj > blo && a(besti - 1) == b(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
             a(besti + bestsize) == b(bestj + bestsize))
        bestsize += 1
      (besti, bestj, bestsize)
    }

    /** get_matching_blocks: sorted blocks plus the (len(a), len(b), 0)
      * sentinel, adjacent blocks merged. */
    def getMatchingBlocks(): Vector[(Int, Int, Int)] = {
      val queue = mutable.Stack((0, a.length, 0, b.length))
      val found = mutable.ArrayBuffer.empty[(Int, Int, Int)]
      while (queue.nonEmpty) {
        val (alo, ahi, blo, bhi) = queue.pop()
        val m @ (i, j, k) = findLongestMatch(alo, ahi, blo, bhi)
        if (k > 0) {
          found += m
          if (alo < i && blo < j) queue.push((alo, i, blo, j))
          if (i + k < ahi && j + k < bhi) queue.push((i + k, ahi, j + k, bhi))
        }
      }
      val sorted = found.sorted
      val merged = mutable.ArrayBuffer.empty[(Int, Int, Int)]
      var cur = (0, 0, 0) // i1, j1, k1 accumulator
      sorted.foreach { case (i2, j2, k2) =>
        val (i1, j1, k1) = cur
        if (i1 + k1 == i2 && j1 + k1 == j2) cur = (i1, j1, k1 + k2)
        else {
          if (k1 > 0) merged += cur
          cur = (i2, j2, k2)
        }
      }
      if (cur._3 > 0) merged += cur
      merged += ((a.length, b.length, 0))
      merged.toVector
    }

    /** get_opcodes: (tag, i1, i2, j1, j2) with tag ∈
      * replace/delete/insert/equal. */
    def getOpcodes(): Vector[(String, Int, Int, Int, Int)] = {
      var i = 0; var j = 0
      val answer = mutable.ArrayBuffer.empty[(String, Int, Int, Int, Int)]
      getMatchingBlocks().foreach { case (ai, bj, size) =>
        val tag =
          if (i < ai && j < bj) "replace"
          else if (i < ai) "delete"
          else if (j < bj) "insert"
          else ""
        if (tag.nonEmpty) answer += ((tag, i, ai, j, bj))
        i = ai + size; j = bj + size
        if (size > 0) answer += (("equal", ai, i, bj, j))
      }
      answer.toVector
    }

    /** get_grouped_opcodes(n): opcode groups with up to n lines of
      * context, split where an equal run exceeds 2n. */
    def getGroupedOpcodes(n: Int = 3)
        : Vector[Vector[(String, Int, Int, Int, Int)]] = {
      var codes = getOpcodes()
      if (codes.isEmpty) codes = Vector(("equal", 0, 1, 0, 1))
      if (codes.head._1 == "equal") {
        val (tag, i1, i2, j1, j2) = codes.head
        codes = ((tag, math.max(i1, i2 - n), i2,
          math.max(j1, j2 - n), j2)) +: codes.tail
      }
      if (codes.last._1 == "equal") {
        val (tag, i1, i2, j1, j2) = codes.last
        codes = codes.init :+ ((tag, i1, math.min(i2, i1 + n),
          j1, math.min(j2, j1 + n)))
      }
      val nn = n + n
      val groups =
        mutable.ArrayBuffer.empty[Vector[(String, Int, Int, Int, Int)]]
      var group = mutable.ArrayBuffer.empty[(String, Int, Int, Int, Int)]
      codes.foreach { case c @ (tag, i1v, i2, j1v, j2) =>
        var i1 = i1v; var j1 = j1v
        if (tag == "equal" && i2 - i1 > nn) {
          group += ((tag, i1, math.min(i2, i1 + n),
            j1, math.min(j2, j1 + n)))
          groups += group.toVector
          group = mutable.ArrayBuffer.empty
          i1 = math.max(i1, i2 - n); j1 = math.max(j1, j2 - n)
        }
        group += ((tag, i1, i2, j1, j2))
      }
      if (group.nonEmpty &&
          !(group.length == 1 && group.head._1 == "equal"))
        groups += group.toVector
      groups.toVector
    }
  }

  private def formatRangeUnified(start: Int, stop: Int): String = {
    val length = stop - start
    if (length == 1) (start + 1).toString
    else {
      val beginning = if (length == 0) start else start + 1
      s"$beginning,$length"
    }
  }

  /** difflib.unified_diff with lineterm="\n" (what mkpatch uses):
    * returns the diff LINES (each carrying its own terminator except
    * body lines copied from terminator-less input tails). */
  def unifiedDiff(a: IndexedSeq[String], b: IndexedSeq[String],
                  fromfile: String = "", tofile: String = "",
                  n: Int = 3): Vector[String] = {
    val out = Vector.newBuilder[String]
    var started = false
    new SequenceMatcher(a, b).getGroupedOpcodes(n).foreach { group =>
      if (!started) {
        started = true
        out += s"--- $fromfile\n"
        out += s"+++ $tofile\n"
      }
      val first = group.head; val last = group.last
      val r1 = formatRangeUnified(first._2, last._3)
      val r2 = formatRangeUnified(first._4, last._5)
      out += s"@@ -$r1 +$r2 @@\n"
      group.foreach { case (tag, i1, i2, j1, j2) =>
        if (tag == "equal") (i1 until i2).foreach(i => out += " " + a(i))
        else {
          if (tag == "replace" || tag == "delete")
            (i1 until i2).foreach(i => out += "-" + a(i))
          if (tag == "replace" || tag == "insert")
            (j1 until j2).foreach(j => out += "+" + b(j))
        }
      }
    }
    out.result()
  }

  /** str.splitlines(keepends=True) for \n-terminated text (the only
    * terminator the pipeline produces — readlines() equivalent). */
  def splitKeepEnds(text: String): Vector[String] = {
    if (text.isEmpty) return Vector.empty
    val out = Vector.newBuilder[String]
    var start = 0
    var i = text.indexOf('\n')
    while (i >= 0) {
      out += text.substring(start, i + 1)
      start = i + 1
      i = text.indexOf('\n', start)
    }
    if (start < text.length) out += text.substring(start)
    out.result()
  }

  /** devel.mkpatch's text-level core (devel.py:963-1053, the stages
    * after file stashing/regeneration, which the distributed pipeline
    * handles as stage tables): diff the pristine text against the
    * hand-edited text; a single-line description is appended to the
    * FIRST hunk's @@ control line (where [[Patch]] reads it back as
    * the patch description), a multi-line description is returned
    * separately (the .desc sidecar). Returns None when the patch
    * would be empty (the reference warns and writes nothing). */
  def mkpatch(pristine: String, edited: String, description: String,
              fromfile: String = "",
              tofile: String = ""): Option[(String, Option[String])] = {
    // patchedtext arrives as unicode text: split on \n, drop the
    // phantom tail line, re-terminate every line
    var editedLines = edited.split("\n", -1).toVector
    if (editedLines.nonEmpty && editedLines.last == "")
      editedLines = editedLines.init
    val bLines = editedLines.map(_ + "\n")
    val aLines = splitKeepEnds(pristine)
    var difflines = unifiedDiff(aLines, bLines, fromfile, tofile)
    if (difflines.isEmpty) return None
    if (!description.contains("\n")) {
      val idx = difflines.indexWhere(l =>
        l.startsWith("@@") && l.endsWith("@@\n"))
      if (idx >= 0)
        difflines = difflines.updated(idx,
          difflines(idx).replace("@@\n", "@@ " + description + "\n"))
      Some((difflines.mkString, None))
    } else Some((difflines.mkString, Some(description)))
  }
}

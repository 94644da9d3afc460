package graft.parse

/** Unified-diff patch engine — the role of the reference's vendored
  * patchit (thirdparty/patchit.py) under patch_if_needed
  * (/root/reference/ferenda/documentrepository.py:1355-1404): parse a
  * single-file unified diff, apply it to the document text with small-
  * offset adjustment (patchit's `adjust`), carry the hunk comment as the
  * patch description. Pure per-row Scala: the pipeline broadcast-joins a
  * patch table and runs this inside the parse stage.
  */
object Patch {

  final case class Hunk(
      srcStart: Int, // 1-based, as in the @@ header
      srcLen: Int,
      dstStart: Int,
      dstLen: Int,
      comment: Option[String],
      lines: Vector[String]) // raw body lines with ' ', '-', '+' prefixes

  final case class PatchConflict(msg: String) extends RuntimeException(msg)

  private val HunkHeader =
    """@@ -(\d+)(?:,(\d+))? \+(\d+)(?:,(\d+))? @@ ?(.*)""".r

  /** Parse a single-file unified diff (---/+++ file headers optional and
    * skipped; the reference asserts exactly one file per patch).
    *
    * Hunk bodies are delimited by the PARSED srcLen/dstLen counts, so a
    * body line whose content itself starts with '--' or '++' (e.g.
    * deleting a SQL `-- comment` yields a `--- comment` diff line) is
    * body content, never a file header — the r2 version classified by
    * prefix anywhere and silently DROPPED such lines, applying the patch
    * "successfully" with corrupted output (ADVICE r2; the reference's
    * patchit anchors headers to `--- `/`+++ ` + filename and raises
    * PatchSyntaxError). Excess or malformed lines inside an open hunk
    * throw [[PatchConflict]] instead of being misfiled. */
  def parse(patchText: String): Vector[Hunk] = {
    val out = Vector.newBuilder[Hunk]
    var current: Option[(Int, Int, Int, Int, Option[String])] = None
    var body = Vector.newBuilder[String]
    var srcLeft = 0
    var dstLeft = 0
    var seenHunk = false
    def flush(): Unit = {
      current.foreach { case (a, b, c, d, cm) =>
        out += Hunk(a, b, c, d, cm, body.result())
      }
      current = None
    }
    patchText.linesIterator.foreach { line =>
      val hunkOpen = current.isDefined && (srcLeft > 0 || dstLeft > 0)
      if (hunkOpen) {
        val l = if (line.isEmpty) " " else line // blank context line
        // each arm checks ITS counter before decrementing: while the hunk
        // is open on one side, a body line overdrawing the other side must
        // conflict, not push the counter negative (ADVICE r3 — the
        // outer-loop excess check only fires once BOTH counters are spent)
        l.charAt(0) match {
          case ' ' if srcLeft > 0 && dstLeft > 0 =>
            body += l; srcLeft -= 1; dstLeft -= 1
          case '-' if srcLeft > 0 => body += l; srcLeft -= 1
          case '+' if dstLeft > 0 => body += l; dstLeft -= 1
          case ' ' | '-' | '+' =>
            throw PatchConflict(
              s"hunk body line beyond the declared counts: $line")
          case '\\' => () // "\ No newline at end of file"
          case _ =>
            throw PatchConflict(s"malformed hunk body line: $line")
        }
      } else line match {
        case HunkHeader(a, b, c, d, cm) =>
          flush()
          val sl = Option(b).map(_.toInt).getOrElse(1)
          val dl = Option(d).map(_.toInt).getOrElse(1)
          current = Some((a.toInt, sl, c.toInt, dl,
            Option(cm).map(_.trim).filter(_.nonEmpty)))
          srcLeft = sl
          dstLeft = dl
          body = Vector.newBuilder[String]
          seenHunk = true
        case l if !seenHunk =>
          () // arbitrary preamble before the first hunk (git headers etc.)
        case l if l.startsWith("--- ") || l.startsWith("+++ ") ||
                  l.startsWith("diff ") || l.startsWith("index ") ||
                  l.startsWith("\\") || l.isEmpty =>
          () // file headers / diff noise between hunks
        case l if l.startsWith("+") || l.startsWith("-") =>
          // a hunk declared fewer lines than its body carries — the
          // silent-drop twin of the misclassification bug: conflict loudly
          throw PatchConflict(
            s"hunk body line beyond the declared counts: $l")
        case _ => ()
      }
    }
    flush()
    val hunks = out.result()
    if (hunks.isEmpty) throw PatchConflict("no hunks in patch")
    hunks
  }

  /** Does `hunk` apply at 0-based source position `pos`? */
  private def matchesAt(src: IndexedSeq[String], hunk: Hunk, pos: Int): Boolean = {
    var i = pos
    hunk.lines.forall { l =>
      if (l.startsWith("+")) true
      else {
        val ok = i < src.length && src(i) == l.substring(1)
        i += 1
        ok
      }
    }
  }

  /** Apply the patch; context mismatches probe nearby offsets (0, ±1 …
    * ±`fuzz`) before conflicting — patchit's adjust semantics. Returns
    * (patched text, description from the first hunk comment). */
  def apply(text: String, patchText: String,
            fuzz: Int = 50): (String, Option[String]) = {
    val hunks = parse(patchText)
    val src = text.split("\n", -1).toIndexedSeq
    val out = Vector.newBuilder[String]
    var srcPos = 0 // 0-based cursor into src
    var drift = 0  // accumulated offset of earlier adjustments
    hunks.foreach { h =>
      val want = h.srcStart - 1 + drift
      val offsets = 0 +: (1 to fuzz).flatMap(k => Seq(-k, k))
      val found = offsets.map(want + _)
        .find(p => p >= srcPos && matchesAt(src, h, p))
        .getOrElse(throw PatchConflict(
          s"hunk @@ -${h.srcStart} does not apply (within ±$fuzz lines)"))
      drift += found - (h.srcStart - 1 + drift)
      // copy unchanged region before the hunk
      while (srcPos < found) { out += src(srcPos); srcPos += 1 }
      h.lines.foreach { l =>
        l.charAt(0) match {
          case ' ' => out += src(srcPos); srcPos += 1
          case '-' => srcPos += 1
          case '+' => out += l.substring(1)
        }
      }
    }
    while (srcPos < src.length) { out += src(srcPos); srcPos += 1 }
    (out.result().mkString("\n"), hunks.head.comment)
  }
}

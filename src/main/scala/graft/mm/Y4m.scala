package graft.mm

/** Minimal YUV4MPEG2 ("Y4M") container codec — pure JVM, no external
  * codec needed because Y4M carries RAW planar frames (it is the
  * uncompressed interchange format mjpegtools/ffmpeg use for piping
  * video). This makes the video modality REAL the same way PNG
  * (javax.imageio) and WAV (javax.sound.sampled) closed image/audio:
  * payloads are genuine parseable video files, and frame sampling /
  * feature extraction work on actually-decoded frames.
  *
  * Format (public spec, mjpegtools y4m(5)):
  *   `YUV4MPEG2 W<w> H<h> F<num>:<den> [Ip] [A<n>:<d>] [C<space>]\n`
  *   then per frame: `FRAME[ <params>]\n` + planar pixel data.
  * Plane sizes depend on the chroma tag: C420* = Y(w*h) U(w/2*h/2)
  * V(w/2*h/2); C422 = U,V (w/2*h); C444 = U,V (w*h); Cmono = Y only.
  */
object Y4m {

  /** One decoded frame: raw planes (Y always, U/V empty for mono). */
  final case class Frame(y: Array[Byte], u: Array[Byte], v: Array[Byte])

  final case class Video(width: Int, height: Int,
                         fpsNum: Int, fpsDen: Int,
                         chroma: String, frames: Vector[Frame]) {
    def durationMs: Int = (frames.length.toLong * 1000 * fpsDen / fpsNum).toInt
  }

  final val Magic = "YUV4MPEG2"

  /** Deterministic frame planes from a seed — xorshift-mixed per
    * (frame, plane) so luma covers all 16 histogram bins. Shared by the
    * encoder and the codec-free oracle in MultiModalSpec. */
  def framePlanes(seed: Array[Byte], frameIdx: Int,
                  w: Int, h: Int): Frame = {
    def plane(n: Int, tag: Long): Array[Byte] = {
      var x = seed.foldLeft(0x9e3779b97f4a7c15L ^ (frameIdx * 0x2545f4914f6cdd1dL)
        ^ tag)((a, b) => (a * 31) ^ (b & 0xffL))
      Array.fill(n) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        (x & 0xffL).toByte
      }
    }
    Frame(plane(w * h, 1L), plane(w / 2 * (h / 2), 2L), plane(w / 2 * (h / 2), 3L))
  }

  /** Encode a deterministic C420jpeg video. `w`/`h` must be even. */
  def encode(seed: Array[Byte], w: Int, h: Int, nFrames: Int,
             fpsNum: Int = 25, fpsDen: Int = 1): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, s"4:2:0 needs even dims, got ${w}x$h")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"$Magic W$w H$h F$fpsNum:$fpsDen Ip A1:1 C420jpeg\n"
      .getBytes("US-ASCII"))
    var f = 0
    while (f < nFrames) {
      bos.write("FRAME\n".getBytes("US-ASCII"))
      val fr = framePlanes(seed, f, w, h)
      bos.write(fr.y); bos.write(fr.u); bos.write(fr.v)
      f += 1
    }
    bos.toByteArray
  }

  private def planeSizes(chroma: String, w: Int, h: Int): (Int, Int) =
    chroma match {
      case c if c.startsWith("420") => (w * h, w / 2 * (h / 2))
      case "422"                    => (w * h, w / 2 * h)
      case "444"                    => (w * h, w * h)
      case "mono"                   => (w * h, 0)
      case other => throw new IllegalArgumentException(s"chroma C$other")
    }

  /** Parse a Y4M stream. Throws IllegalArgumentException on anything
    * malformed (bad magic, missing W/H, truncated frame data). */
  def decode(payload: Array[Byte]): Video = {
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < payload.length && payload(i) != '\n') i += 1
      require(i < payload.length, "unterminated Y4M header line")
      i
    }
    val hEnd = lineEnd(0)
    val header = new String(payload, 0, hEnd, "US-ASCII")
    val tokens = header.split(' ')
    require(tokens.nonEmpty && tokens(0) == Magic, "not a YUV4MPEG2 stream")
    var w = -1; var h = -1; var fn = 25; var fd = 1; var chroma = "420jpeg"
    tokens.drop(1).foreach { t =>
      if (t.nonEmpty) t.charAt(0) match {
        case 'W' => w = t.substring(1).toInt
        case 'H' => h = t.substring(1).toInt
        case 'F' =>
          val parts = t.substring(1).split(':')
          require(parts.length == 2, s"malformed frame-rate token: $t")
          fn = parts(0).toInt; fd = parts(1).toInt
        case 'C' => chroma = t.substring(1)
        case _ => () // I (interlace), A (aspect), X (extension): skip
      }
    }
    require(w > 0 && h > 0, s"missing W/H in header: $header")
    require(fn > 0 && fd > 0, s"non-positive frame rate in header: $header")
    val (ySize, cSize) = planeSizes(chroma, w, h)
    val frames = Vector.newBuilder[Frame]
    var pos = hEnd + 1
    while (pos < payload.length) {
      val fEnd = lineEnd(pos)
      val marker = new String(payload, pos, fEnd - pos, "US-ASCII")
      require(marker == "FRAME" || marker.startsWith("FRAME "),
        s"expected FRAME marker at byte $pos")
      var p = fEnd + 1
      require(p + ySize + 2L * cSize <= payload.length,
        s"truncated frame data at byte $p")
      val y = java.util.Arrays.copyOfRange(payload, p, p + ySize); p += ySize
      val u = java.util.Arrays.copyOfRange(payload, p, p + cSize); p += cSize
      val v = java.util.Arrays.copyOfRange(payload, p, p + cSize); p += cSize
      frames += Frame(y, u, v)
      pos = p
    }
    Video(w, h, fn, fd, chroma, frames.result())
  }
}

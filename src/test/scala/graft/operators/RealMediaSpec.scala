package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal.MediaDecoder

/** Validation of the media header parsers against REAL, third-party-
  * encoded image files shipped with standard Debian packages (python3
  * docs, gitweb, libxslt docs — public distribution artifacts written
  * by real encoders, not by our own fixture writers).
  *
  * The cross-check is parser-vs-decoder: our hand-written header
  * parsers ([[MediaDecoder.pngDims]]/[[MediaDecoder.gifDims]]) read a
  * few leading bytes, while the JDK's ImageIO decodes the full stream
  * with an INDEPENDENT implementation — agreement on width/height for
  * every real file is evidence the byte offsets are right in a way
  * self-encoded fixtures (same code both sides) cannot provide.
  * Files are probed at runtime and the suite cancels if none exist, so
  * the build stays green on machines without the packages. */
class RealMediaSpec extends AnyFunSuite {

  private val candidates = Seq(
    "/usr/share/gitweb/static/git-logo.png",
    "/usr/share/gitweb/static/git-favicon.png",
    "/usr/share/doc/python3/_static/file.png",
    "/usr/share/doc/python3/_static/minus.png",
    "/usr/share/doc/python3/_static/plus.png",
    "/usr/share/doc/libxslt1-dev/html/processing.gif",
    "/usr/share/doc/libxslt1-dev/html/node.gif",
    "/usr/share/doc/libxslt1-dev/html/Libxslt-Logo-180x168.gif",
    "/usr/share/doc/libxslt1-dev/html/Libxslt-Logo-90x34.gif",
    "/usr/share/doc/libxslt1-dev/html/redhat.gif")

  private def readable(p: String): Boolean =
    java.nio.file.Files.isReadable(java.nio.file.Paths.get(p))

  test("real files: header-parsed dims match the JDK's decoded dims") {
    val present = candidates.filter(readable)
    if (present.isEmpty) cancel("no real media files on this machine")
    var checked = 0
    for (path <- present) {
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path))
      val hdr = MediaDecoder.pngDims(bytes).orElse(MediaDecoder.gifDims(bytes))
      val img = MediaDecoder.pixelDecode(bytes)
      (hdr, img) match {
        case (Some(d), Some(i)) =>
          assert(d.width == i.getWidth && d.height == i.getHeight,
            s"$path: header ${d.width}x${d.height} vs decoded " +
              s"${i.getWidth}x${i.getHeight}")
          checked += 1
        case (None, Some(i)) =>
          fail(s"$path: JDK decodes ${i.getWidth}x${i.getHeight} but no " +
            "header parser recognized it")
        case _ => // JDK can't decode (e.g. interlaced variant) — header
          // parsers carry no obligation beyond not crashing, already met
      }
    }
    assert(checked >= 3, s"only $checked real files cross-checked")
  }

  test("real files: dHash is deterministic and brightness is sane") {
    val present = candidates.filter(readable)
    if (present.isEmpty) cancel("no real media files on this machine")
    for (path <- present) {
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path))
      MediaDecoder.pixelDecode(bytes).foreach { img =>
        val (h1, b1) = MediaDecoder.hashFeatures(img)
        val h2 = MediaDecoder.dHash64(
          MediaDecoder.pixelDecode(bytes).get)
        assert(h1 == h2, s"$path: hashFeatures/dHash64 diverge")
        assert(b1 >= 0.0 && b1 <= 1.0, s"$path: brightness $b1")
        assert(b1 == MediaDecoder.meanLuminance(img))
      }
    }
  }
}

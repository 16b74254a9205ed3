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

  // real third-party JPEG/BMP candidates: nodejs doc images, Spark's
  // mllib sample photos, CPython's imghdr test corpus — all encoded by
  // real tools (libjpeg-era encoders, actual cameras), none by our own
  // fixture writers
  private val jpegCandidates = Seq(
    "/usr/share/doc/nodejs/thin-white-stripe.jpg",
    "/usr/share/doc/nodejs/full-white-stripe.jpg",
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/DP802813.jpg",
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/DP153539.jpg",
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/54893.jpg",
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/multi-channel/grayscale.jpg",
    "/root/.pyenv/versions/3.7.16/lib/python3.7/test/imghdrdata/python.jpg")

  private val bmpCandidates = Seq(
    "/root/.pyenv/versions/3.7.16/lib/python3.7/test/imghdrdata/python.bmp",
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/python.bmp")

  // CPython's audio test corpus: real tool-encoded RIFF WAVs, and
  // STEREO — so the blockAlign/channel handling is cross-checked on
  // files our own writer did not produce
  private val wavCandidates = Seq(
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/audiodata/pluck-pcm8.wav",
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/audiodata/pluck-pcm16.wav",
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/audiodata/pluck-pcm24.wav",
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/audiodata/pluck-pcm32.wav",
    "/root/.pyenv/versions/3.7.16/lib/python3.7/test/audiodata/pluck-pcm8.wav",
    "/root/.pyenv/versions/3.7.16/lib/python3.7/test/audiodata/pluck-pcm16.wav",
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/sndhdr.wav")

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

  test("real third-party JPEGs: header-parsed dims match the JDK decode") {
    val present = jpegCandidates.filter(readable)
    if (present.isEmpty) cancel("no real JPEG files on this machine")
    var checked = 0
    for (path <- present) {
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path))
      (MediaDecoder.jpegDims(bytes), MediaDecoder.pixelDecode(bytes)) match {
        case (Some(d), Some(i)) =>
          assert(d.width == i.getWidth && d.height == i.getHeight,
            s"$path: header ${d.width}x${d.height} vs decoded " +
              s"${i.getWidth}x${i.getHeight}")
          checked += 1
        case (None, Some(i)) =>
          fail(s"$path: JDK decodes ${i.getWidth}x${i.getHeight} but " +
            "jpegDims did not recognize it")
        case _ => () // JDK can't decode this variant — no obligation
      }
    }
    assert(checked >= 1, "no real JPEG cross-checked")
  }

  test("real third-party BMPs: header-parsed dims match the JDK decode") {
    val present = bmpCandidates.filter(readable)
    if (present.isEmpty) cancel("no real BMP files on this machine")
    var checked = 0
    for (path <- present) {
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path))
      (MediaDecoder.bmpDims(bytes), MediaDecoder.pixelDecode(bytes)) match {
        case (Some(d), Some(i)) =>
          assert(d.width == i.getWidth && d.height == i.getHeight,
            s"$path: header ${d.width}x${d.height} vs decoded " +
              s"${i.getWidth}x${i.getHeight}")
          checked += 1
        case (None, Some(i)) =>
          fail(s"$path: JDK decodes ${i.getWidth}x${i.getHeight} but " +
            "bmpDims did not recognize it")
        case _ => ()
      }
    }
    assert(checked >= 1, "no real BMP cross-checked")
  }

  test("real third-party WAVs: RIFF meta matches the JDK's parser") {
    // javax.sound's WAV reader is the JDK's INDEPENDENT RIFF walk —
    // agreement on rate/channels/bits/frames for tool-encoded stereo
    // files pins our blockAlign handling the way self-written fixtures
    // cannot
    val present = wavCandidates.filter(readable)
    if (present.isEmpty) cancel("no real WAV files on this machine")
    var checked = 0
    for (path <- present) {
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path))
      val jdk =
        try Some(javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.File(path)))
        catch { case _: Exception => None } // variant the JDK rejects
      (MediaDecoder.wavMeta(bytes), jdk) match {
        case (Some(m), Some(ff)) =>
          val f = ff.getFormat
          assert(m.sampleRate == f.getSampleRate.toInt,
            s"$path: rate ${m.sampleRate} vs JDK ${f.getSampleRate}")
          assert(m.channels == f.getChannels,
            s"$path: channels ${m.channels} vs JDK ${f.getChannels}")
          assert(m.bitsPerSample == f.getSampleSizeInBits,
            s"$path: bits ${m.bitsPerSample} vs JDK " +
              s"${f.getSampleSizeInBits}")
          if (ff.getFrameLength >= 0)
            assert(m.nFrames == ff.getFrameLength,
              s"$path: frames ${m.nFrames} vs JDK ${ff.getFrameLength}")
          checked += 1
        case (None, Some(_)) =>
          fail(s"$path: the JDK parses this WAV but wavMeta does not")
        case _ => ()
      }
    }
    assert(checked >= 1, "no real WAV cross-checked")
  }

  test("real stereo WAV PCM: rms/peak match an independent JDK decode") {
    // data-path cross-check for the flat interleaved convention: the
    // JDK's AudioInputStream locates and decodes the sample bytes with
    // its own RIFF walk; computing rms/peak from ITS bytes must equal
    // wavPcmFeatures computed from OUR walk of the same file
    val present = wavCandidates.filter(readable)
      .filter(p => p.endsWith("pcm8.wav") || p.endsWith("pcm16.wav"))
    if (present.isEmpty) cancel("no pcm8/pcm16 WAV files on this machine")
    var checked = 0
    for (path <- present) {
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path))
      val ours = MediaDecoder.wavPcmFeatures(bytes)
      val in =
        try Some(javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.File(path)))
        catch { case _: Exception => None }
      (ours, in) match {
        case (Some((rms, peak)), Some(ais)) =>
          try {
            val f = ais.getFormat
            assert(!f.isBigEndian || f.getSampleSizeInBits == 8)
            val data = ais.readAllBytes()
            val bits = f.getSampleSizeInBits
            val n = data.length / (bits / 8)
            var sumSq = 0.0
            var pk = 0.0
            var i = 0
            while (i < n) {
              val x =
                if (bits == 8) ((data(i) & 0xff) - 128) / 128.0
                else {
                  val v = (data(2 * i) & 0xff) | (data(2 * i + 1) << 8)
                  v / 32768.0
                }
              sumSq += x * x
              if (math.abs(x) > pk) pk = math.abs(x)
              i += 1
            }
            val jdkRms = math.sqrt(sumSq / n)
            assert(math.abs(rms - jdkRms) < 1e-12,
              s"$path: rms $rms vs JDK-decoded $jdkRms")
            assert(math.abs(peak - pk) < 1e-12,
              s"$path: peak $peak vs JDK-decoded $pk")
            checked += 1
          } finally ais.close()
        case (None, Some(ais)) =>
          ais.close()
          fail(s"$path: the JDK decodes this PCM but wavPcmFeatures " +
            "does not")
        case _ => ()
      }
    }
    assert(checked >= 1, "no real PCM WAV data cross-checked")
  }

  test("real third-party MP4s: mp4Meta box walk matches the container") {
    // DOCUMENTED GAP (same contract as CramConformanceSpec): mp4Meta /
    // mp4Frames are validated against self-encoded ISO-BMFF fixtures
    // only. The JDK ships no independent MP4 demuxer to diff against,
    // and a filesystem sweep of this sandbox (r14: `find / -name
    // '*.mp4' -o -name '*.m4a' -o -name '*.mov' -o -name '*.3gp'`,
    // /proc,/sys,/dev pruned) found ZERO third-party MP4-family files —
    // Debian doc trees, CPython test corpora, the Spark distribution,
    // and the JDK carry none. This test is the WATCH: it probes the
    // same corpora the image/audio tests draw from plus a bounded
    // sweep, and the day a real file appears it cross-checks the box
    // walk instead of cancelling. Hand-assembling an MP4 here would be
    // circular (same writer both sides) — exactly what
    // CramConformanceSpec refuses to do for the CRAM entropy codecs.
    val roots = Seq("/usr/share/doc", "/opt/spark-4.1.2-bin-hadoop3/data",
      "/root/.pyenv/versions")
    val exts = Seq(".mp4", ".m4a", ".mov", ".3gp", ".m4v")
    val found = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
    for (r <- roots if readable(r)) {
      val stream = java.nio.file.Files.walk(java.nio.file.Paths.get(r))
      try {
        stream.filter(p => exts.exists(p.toString.toLowerCase.endsWith(_)))
          .limit(8).forEach(p => found += p)
      } catch { case _: Exception => () } finally stream.close()
    }
    if (found.isEmpty)
      cancel("no third-party MP4/M4A in this sandbox — mp4Meta stays " +
        "self-fixture-validated (documented gap; see comment)")
    var checked = 0
    for (path <- found) {
      val bytes = java.nio.file.Files.readAllBytes(path)
      MediaDecoder.mp4Meta(bytes).foreach { m =>
        // minimum honest assertions without an independent demuxer:
        // the walk terminated, duration is non-negative, and any video
        // track reports positive dims
        assert(m.durationMs >= 0, s"$path: negative duration")
        assert(m.width >= 0 && m.height >= 0, s"$path: negative dims")
        checked += 1
      }
    }
    assert(checked >= 1, "MP4 files present but none parsed — " +
      "mp4Meta should recognize at least one real container")
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

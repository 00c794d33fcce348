package graft.llm

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Fuzz laws for the dependency-free media header codecs: every
  * decoder must TERMINATE and RETURN (Some or None) on arbitrary
  * bytes — never throw, never loop. This is the generalization of
  * three concrete corrupt-input bugs fixed one by one (an AIFF
  * negative-chunk-length infinite loop, the AIFF 80-bit exponent
  * shift wrap, an OGG false-sync granule read): instead of pinning
  * each past failure, the property drives every parser with (a) raw
  * random bytes, (b) random bytes behind each format's REAL magic
  * prefix — so the parser runs past its signature check into the
  * chunk/segment walk, where all three historical bugs lived — and
  * (c) every generated payload through the composite
  * `Multimodal.decode` image/audio/video dispatch.
  *
  * Pure JVM functions (bytes in, Option out) — thousands of cases,
  * no SparkSession. Payloads are small (≤ ~300 bytes), so any
  * accidental non-termination shows up as a suite hang, which the
  * build treats as a failure.
  */
object MultimodalCodecProps extends Properties("MultimodalCodecs") {

  private val rawBytes: Gen[Array[Byte]] =
    Gen.choose(0, 260).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray))

  // Real magic prefixes — enough signature for each parser to commit
  // to its format and start walking chunks/segments/frames.
  private val magics: Seq[Array[Byte]] = Seq(
    "BM".getBytes("ISO-8859-1"),
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'),
    Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte),
    "GIF89a".getBytes("ISO-8859-1"),
    Array[Byte]('I', 'I', 0x2a, 0x00),
    Array[Byte]('M', 'M', 0x00, 0x2a),
    "RIFF".getBytes("ISO-8859-1") ++ Array[Byte](16, 0, 0, 0) ++
      "WAVE".getBytes("ISO-8859-1"),
    "RIFF".getBytes("ISO-8859-1") ++ Array[Byte](16, 0, 0, 0) ++
      "WEBP".getBytes("ISO-8859-1"),
    "fLaC".getBytes("ISO-8859-1"),
    "FORM".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 16) ++
      "AIFF".getBytes("ISO-8859-1"),
    "FORM".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 16) ++
      "AIFC".getBytes("ISO-8859-1"),
    "ID3".getBytes("ISO-8859-1"),
    Array[Byte](0xff.toByte, 0xfb.toByte),
    "OggS".getBytes("ISO-8859-1"),
    // A complete 16-byte ftyp box: the MP4 walk commits to ISO-BMFF
    // and the random tail becomes the NEXT box's size/type fields.
    Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, 0, 0))

  private val magicPrefixed: Gen[Array[Byte]] =
    for {
      magic <- Gen.oneOf(magics)
      tail <- rawBytes
    } yield magic ++ tail

  private val anyPayload: Gen[Array[Byte]] =
    Gen.frequency(1 -> rawBytes, 3 -> magicPrefixed)

  private val decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    "bmp" -> Multimodal.decodeBmp _,
    "png" -> Multimodal.decodePng _,
    "jpeg" -> Multimodal.decodeJpeg _,
    "gif" -> Multimodal.decodeGif _,
    "tiff" -> Multimodal.decodeTiff _,
    "webp" -> Multimodal.decodeWebp _,
    "wav" -> Multimodal.decodeWav _,
    "flac" -> Multimodal.decodeFlac _,
    "aiff" -> Multimodal.decodeAiff _,
    "mp3" -> Multimodal.decodeMp3 _,
    "ogg" -> Multimodal.decodeOgg _,
    "mp4" -> Multimodal.decodeMp4 _)

  for ((name, dec) <- decoders)
    property(s"$name decoder total on arbitrary bytes") =
      forAll(anyPayload) { p => dec(p); true }

  property("composite decode total for every kind") =
    forAll(anyPayload) { p =>
      Seq("image", "audio", "video").forall { kind =>
        val (w, h, ms) = Multimodal.decode(kind, p)
        // decoded facts are never negative garbage — a parser that
        // wraps into a negative dimension/duration leaks corrupt
        // arithmetic downstream (the AIFF shift-wrap failure mode)
        w >= 0 && h >= 0 && ms >= 0
      }
    }
}

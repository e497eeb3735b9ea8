package graft.ml // Proto is private[ml]; everything else is public anyway

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-JVM property checks (no SparkSession): protobuf wire round-trip,
  * ONNX session algebra, WordPiece segmentation invariants, synthetic
  * media ↔ header-parser round-trip, permutation bijectivity.
  */
object GraftProperties extends Properties("graft") {

  property("proto varint round-trips any long") = forAll { (v: Long) =>
    val m = Proto.parse(Proto.varintField(3, v))
    Proto.varintAt(m, 3) == v
  }

  property("proto packed doubles round-trip") =
    forAll(Gen.listOf(Gen.chooseNum(-1e12, 1e12))) { (vs: List[Double]) =>
      val m = Proto.parse(Proto.lenDelim(10, Proto.packedDoubles(vs.toArray)))
      Proto.packedDoublesAt(m, 10).toSeq == vs
    }

  property("proto strings and nesting round-trip") =
    forAll(Gen.alphaNumStr, Gen.chooseNum(0L, Long.MaxValue)) { (s, v) =>
      val inner = Proto.concat(Proto.stringField(1, s), Proto.varintField(2, v))
      val m = Proto.parse(Proto.lenDelim(7, inner))
      val im = Proto.parse(Proto.bytesAt(m, 7))
      Proto.stringAt(im, 1) == s && Proto.varintAt(im, 2) == v
    }

  property("proto packed varints round-trip") =
    forAll(Gen.listOf(Gen.chooseNum(0L, Long.MaxValue))) { vs =>
      val m = Proto.parse(Proto.lenDelim(1, Proto.packedVarints(vs)))
      Proto.packedVarintsAt(m, 1) == vs
    }

  private val dimGen = Gen.chooseNum(1, 6)

  property("ONNX linear map == manual matmul for random shapes") =
    forAll(dimGen, dimGen, Gen.chooseNum(0, 5), Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (d, k, n, seed) =>
      val rng = new scala.util.Random(seed)
      val w = Array.fill(d, k)(rng.nextDouble() * 4 - 2)
      val b = Array.fill(k)(rng.nextDouble() - 0.5)
      val feats = (0 until d).map(i => s"f$i")
      val path = java.nio.file.Files.createTempFile("prop_onnx", ".onnx").toString
      OnnxExport.exportLinearMap(w, b, feats, path)
      val session = OnnxSession.load(path)
      val xs = Array.fill(n, d)(rng.nextDouble() * 10 - 5)
      val got = session.runMatrix(xs)
      java.nio.file.Files.delete(java.nio.file.Paths.get(path))
      got.length == n && xs.indices.forall { i =>
        (0 until k).forall { j =>
          val e = (0 until d).map(t => xs(i)(t) * w(t)(j)).sum + b(j)
          math.abs(got(i)(j) - e) < 1e-9 * math.max(1.0, math.abs(e))
        }
      }
    }

  property("ONNX MLP relu clamps exactly where manual forward does") =
    forAll(dimGen, dimGen, Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (d, h, seed) =>
      val rng = new scala.util.Random(seed)
      val w1 = Array.fill(d, h)(rng.nextDouble() * 2 - 1)
      val b1 = Array.fill(h)(rng.nextDouble() - 0.5)
      val w2 = Array.fill(h, 1)(rng.nextDouble() * 2 - 1)
      val b2 = Array(rng.nextDouble())
      val path = java.nio.file.Files.createTempFile("prop_mlp", ".onnx").toString
      OnnxExport.exportMlp(Seq((w1, b1), (w2, b2)),
        (0 until d).map(i => s"f$i"), path, finalSigmoid = true)
      val x = Array.fill(d)(rng.nextDouble() * 6 - 3)
      val score = OnnxSession.load(path).run(Array(x))(0)
      java.nio.file.Files.delete(java.nio.file.Paths.get(path))
      val hid = Array.tabulate(h)(j =>
        math.max(0.0, (0 until d).map(t => x(t) * w1(t)(j)).sum + b1(j)))
      val z = (0 until h).map(j => hid(j) * w2(j)(0)).sum + b2(0)
      val e = 1.0 / (1.0 + math.exp(-z))
      math.abs(score - e) < 1e-12 && score >= 0.0 && score <= 1.0
    }

  private val wordGen = Gen.chooseNum(1, 12)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  property("WordPiece segmentation reconstructs the word (full char vocab)") =
    forAll(wordGen, Gen.listOf(wordGen)) { (word, extraWords) =>
      val chars = "abc".map(_.toString)
      val pieces = (chars ++ chars.map("##" + _) ++ extraWords).distinct
      val vocab: Map[String, Long] =
        (WordPiece.Unk +: pieces).zipWithIndex
          .map { case (p, i) => p -> i.toLong }.toMap
      val ids = WordPiece.segmentWord(word, vocab)
      val inv = vocab.map(_.swap)
      val rebuilt = ids.map(inv).map(p => if (p.startsWith("##")) p.drop(2) else p).mkString
      // every char is in-vocab, so segmentation never falls back to [UNK]
      // and the pieces always concatenate back to the word
      rebuilt == word && ids.nonEmpty
    }

  property("WordPiece greedy takes the whole word when it is in vocab") =
    forAll(wordGen) { word =>
      val chars = "abc".map(_.toString)
      val pieces = (word +: (chars ++ chars.map("##" + _))).distinct
      val vocab: Map[String, Long] =
        (WordPiece.Unk +: pieces).zipWithIndex
          .map { case (p, i) => p -> i.toLong }.toMap
      WordPiece.segmentWord(word, vocab) == Seq(vocab(word))
    }

  private val pxGen = Gen.chooseNum(1, 65535)

  property("synthetic media headers parse back to their dimensions") =
    forAll(pxGen, pxGen, Gen.oneOf("png", "jpeg", "gif")) { (w, h, fmt) =>
      import graft.multimodal.{HeaderDecoder, SyntheticMedia, MediaDecoder}
      val bytes = fmt match {
        case "png"  => SyntheticMedia.png(w, h)
        case "jpeg" => SyntheticMedia.jpeg(w, h)
        case _      => SyntheticMedia.gif(w, h)
      }
      HeaderDecoder.probe(bytes).contains(MediaDecoder.Info(fmt, w, h))
    }

  property("tile-constant JPEGs round-trip exactly at any dims/seed") =
    forAll(Gen.chooseNum(1, 70), Gen.chooseNum(1, 70), Gen.chooseNum(0, 255),
      Gen.oneOf(true, false)) { (w, h, seed, color) =>
      import graft.multimodal.{JpegCodec, SyntheticMedia}
      val img = JpegCodec.decode(
        if (color) SyntheticMedia.jpegFullColor(w, h, seed)
        else SyntheticMedia.jpegFullGray(w, h, seed)).get
      val tile = if (color) 16 else 8
      img.width == w && img.height == h &&
        (0 until w * h).forall { k =>
          val expect = ((k % w) / tile * 5 + (k / w) / tile * 11 + seed) % 256
          (0 until img.channels).forall(c =>
            (img.pixels(k * img.channels + c) & 0xff) == expect)
        }
    }

  property("PCM WAVs round-trip samples exactly at any rate/channels/width") =
    forAll(Gen.chooseNum(1, 192000), Gen.chooseNum(1, 8), Gen.oneOf(8, 16),
      Gen.chooseNum(0, 500)) { (rate, ch, bits, frames) =>
      import graft.multimodal.{SyntheticAudio, WavCodec}
      val n = frames * ch
      val samples =
        if (bits == 8) Array.tabulate(n)(k => (k * 37 + 11) % 256)
        else Array.tabulate(n)(k => ((k * 37 + 11) % 65536) - 32768)
      val a = WavCodec.decode(SyntheticAudio.wavPcm(rate, ch, bits, samples)).get
      val expect = if (bits == 8) samples.map(_ - 128) else samples
      a.sampleRate == rate && a.channels == ch && a.frames == frames &&
        a.samples.sameElements(expect)
    }

  property("mp4 probe recovers duration/dims for either mvhd version") =
    forAll(Gen.chooseNum(1L, 1000000L), Gen.chooseNum(0L, (1L << 40)),
      Gen.chooseNum(1, 4096), Gen.chooseNum(1, 4096), Gen.oneOf(true, false)) {
      (ts, dur0, w, h, v1) =>
      import graft.multimodal.{Mp4Probe, SyntheticVideo}
      val dur = if (v1) dur0 else dur0 & 0xffffffffL // v0 duration is u32
      Mp4Probe.probe(SyntheticVideo.mp4Of(ts, dur, Seq((w, h)), v1))
        .contains(Mp4Probe.Info(dur * 1000L / ts, w, h, 1))
    }

  property("lehmerPerm is a bijection and stable") =
    forAll(Gen.chooseNum(1, 64), Gen.chooseNum(0, 16)) { (n, aug) =>
      val p = graft.ingest.Augment.lehmerPerm(n, aug)
      p.sorted == (0 until n) && p == graft.ingest.Augment.lehmerPerm(n, aug)
    }

  property("md5Low32 matches its column-free definition on any string") =
    forAll(Gen.alphaNumStr) { s =>
      val v = graft.core.MinHash.md5Low32(s)
      v >= 0 && v <= 0xffffffffL
    }
}

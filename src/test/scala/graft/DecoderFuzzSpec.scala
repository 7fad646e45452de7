package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LlmOps

/** Property-based fuzzing of the three binary decoders (r13 verdict
  * item 4): the r12 hostile-header fixes closed specific instances;
  * these properties close the CLASS. For ≥1000 random mutations of
  * valid BMP/WAV/PPM payloads (byte flips, truncations, header-field
  * splices, pure garbage), each decoder must (a) never throw, (b) land
  * every outcome in its documented status set, and (c) for payloads it
  * still calls "ok", produce statistics that an INDEPENDENT reference
  * parse (ByteBuffer-based here, hand-rolled shifts in the engine)
  * reproduces exactly — so a mutation can corrupt the data without the
  * decoder either crashing or silently mis-summing. This grounds the
  * reference's invalid-response mandate (README.md:32) at the byte
  * level.
  */
class DecoderFuzzSpec extends AnyFunSuite {

  private val statuses = Set("ok", "bad_magic", "bad_header", "truncated")

  private def check(p: Prop, n: Int = 1000): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  /** Mutation battery shared by all three formats: returns a payload
    * derived from a valid one (or garbage), biased toward the header
    * region where the dangerous arithmetic lives.
    */
  private def mutated(encode: Long => Array[Byte]): Gen[Array[Byte]] = {
    val base = Gen.choose(0L, 100000L).map(encode)
    val byteFlips = for {
      b <- base
      n <- Gen.choose(1, 8)
      muts <- Gen.listOfN(n, Gen.zip(
        Gen.choose(0, math.max(0, b.length - 1)), Gen.choose(0, 255)))
    } yield {
      val c = b.clone()
      muts.foreach { case (off, v) => c(off) = v.toByte }
      c
    }
    val headerFlips = for { // bias: the first 64 bytes hold every header
      b <- base
      n <- Gen.choose(1, 6)
      muts <- Gen.listOfN(n, Gen.zip(
        Gen.choose(0, math.min(63, b.length - 1)), Gen.choose(0, 255)))
    } yield {
      val c = b.clone()
      muts.foreach { case (off, v) => c(off) = v.toByte }
      c
    }
    val truncated = for {
      b <- base
      cut <- Gen.choose(0, b.length)
    } yield b.take(cut)
    val spliced = for { // a random 32-bit field stamped somewhere early:
      b <- base // the w/h/offset/chunk-length overflow population
      off <- Gen.choose(0, math.min(50, math.max(0, b.length - 4)))
      v <- Gen.choose(Int.MinValue, Int.MaxValue)
    } yield {
      val c = b.clone()
      c(off) = (v & 0xff).toByte
      c(off + 1) = ((v >> 8) & 0xff).toByte
      c(off + 2) = ((v >> 16) & 0xff).toByte
      c(off + 3) = ((v >> 24) & 0xff).toByte
      c
    }
    val garbage = for {
      len <- Gen.choose(0, 120)
      bs <- Gen.listOfN(len, Gen.choose(0, 255))
    } yield bs.map(_.toByte).toArray
    Gen.frequency(
      (3, byteFlips), (3, headerFlips), (2, truncated),
      (2, spliced), (1, garbage))
  }

  // ---- independent reference parses (ByteBuffer, not manual shifts) ----

  private def refBmpSums(b: Array[Byte]): Option[(Int, Int, Long, Long)] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val off = bb.getInt(10); val w = bb.getInt(18); val h = bb.getInt(22)
    val bpp = bb.getShort(28).toInt
    if (bpp != 24 || w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)
      || off < 54 || off > b.length) return None
    val stride = w * 3 + (4 - (w * 3) % 4) % 4
    if (b.length < off.toLong + stride.toLong * h) return None
    var sum = 0L; var blue = 0L
    for (y <- 0 until h; x <- 0 until w * 3) {
      val v = b(off + y * stride + x) & 0xff
      sum += v
      if (x % 3 == 0) blue += v
    }
    Some((w, h, sum, blue))
  }

  private def refWavSums(b: Array[Byte]): Option[(Int, Int, Long)] = {
    def tag(i: Int) =
      if (i + 4 > b.length) "" else new String(b, i, 4, "US-ASCII")
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12L; var rate = 0; var bits = 0
    var dataAt = -1L; var dataLen = 0
    while (dataAt < 0) {
      if (pos + 8 > b.length) return None
      val t = tag(pos.toInt); val len = bb.getInt(pos.toInt + 4)
      if (len < 0) return None
      if (t == "fmt " && pos + 24 <= b.length) {
        rate = bb.getInt(pos.toInt + 12)
        bits = bb.getShort(pos.toInt + 22).toInt
      } else if (t == "data") { dataAt = pos + 8; dataLen = len }
      else ()
      if (dataAt < 0) {
        pos = pos + 8 + len + (len & 1)
        if (pos > Int.MaxValue) return None
      }
    }
    if (rate == 0 || bits != 16 || dataAt + dataLen > b.length) return None
    val n = dataLen / 2
    var sum = 0L
    for (k <- 0 until n)
      sum += bb.getShort(dataAt.toInt + 2 * k).toLong
    Some((rate, n, sum))
  }

  private def refPpmSums(b: Array[Byte]): Option[(Int, Int, Long)] = {
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    var pos = 2
    def tok(): Option[Int] = {
      var inC = false
      while (pos < b.length && (inC || " \n\t\r#".contains(b(pos).toChar))) {
        if (b(pos) == '#') inC = true else if (b(pos) == '\n') inC = false
        pos += 1
      }
      var v = 0L; var any = false
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        if (v <= Int.MaxValue) v = v * 10 + (b(pos) - '0'); any = true; pos += 1
      }
      if (!any) None else Some(math.min(v, Int.MaxValue.toLong).toInt)
    }
    for {
      w <- tok(); h <- tok(); mv <- tok()
      if w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20) && mv == 255
      if pos < b.length
      start = pos + 1
      if b.length >= start.toLong + 3L * w * h
    } yield {
      var sum = 0L
      for (j <- 0 until w * h * 3) sum += b(start + j) & 0xff
      (w, h, sum)
    }
  }

  // ---- the properties ----

  test("BMP decode + features: never throw, classified status, ok re-verifies") {
    check(Prop.forAll(mutated(LlmOps.encodeBmp)) { b: Array[Byte] =>
      val d = LlmOps.decodeBmp(0L, b) // must not throw
      val f = LlmOps.decodeBmpFeatures(0L, b)
      val classified = statuses.contains(d.status) && f.status == d.status
      val okConsistent = d.status != "ok" || {
        refBmpSums(b).exists { case (w, h, sum, blue) =>
          d.width == w && d.height == h && d.n_pixels == w * h &&
            d.pixel_sum == sum && d.blue_sum == blue &&
            d.topleft_sum <= 3 * 255 && f.max_px <= 255
        }
      }
      classified && okConsistent
    })
  }

  test("WAV decode + features: never throw, classified status, ok re-verifies") {
    check(Prop.forAll(mutated(LlmOps.encodeWav)) { b: Array[Byte] =>
      val d = LlmOps.decodeWav(0L, b)
      val f = LlmOps.decodeWavFeatures(0L, b)
      val classified = statuses.contains(d.status) && f.status == d.status
      val okConsistent = d.status != "ok" || {
        refWavSums(b).exists { case (rate, n, sum) =>
          d.sample_rate == rate && d.n_samples == n &&
            d.sample_sum == sum && d.peak <= 32768 &&
            f.n_frames == n / 16
        }
      }
      classified && okConsistent
    })
  }

  test("PPM decode: never throw, classified status, ok re-verifies") {
    check(Prop.forAll(mutated(LlmOps.encodePpm)) { b: Array[Byte] =>
      val d = LlmOps.decodePpm(0L, b)
      val classified = statuses.contains(d.status)
      val okConsistent = d.status != "ok" || {
        refPpmSums(b).exists { case (w, h, sum) =>
          d.width == w && d.height == h && d.pixel_sum == sum &&
            d.bottomright_sum <= 3 * 255
        }
      }
      classified && okConsistent
    })
  }

  test("decoders are deterministic over mutated payloads") {
    check(Prop.forAll(mutated(LlmOps.encodeBmp)) { b: Array[Byte] =>
      LlmOps.decodeBmp(7L, b) == LlmOps.decodeBmp(7L, b) &&
        LlmOps.decodePpm(7L, b) == LlmOps.decodePpm(7L, b) &&
        LlmOps.decodeWav(7L, b) == LlmOps.decodeWav(7L, b)
    }, n = 200)
  }
}

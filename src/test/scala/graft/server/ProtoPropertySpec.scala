package graft.server

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}

/** Property-based round-trips for the hand-rolled proto3 wire codec
  * ([[Proto]], [[PbQuery]]) — the entire reference-client compatibility
  * surface (QueryRequest/ImportRequest/ImportValueRequest/roaring imports)
  * rides on these bytes, so the codec must hold for arbitrary values, not
  * just the golden vectors in the facade specs: full-range varints
  * (negative longs are 10-byte varints in proto), packed AND unpacked
  * repeated encodings, arbitrary UTF-8, IEEE doubles, nesting, and unknown
  * -field skipping (a v2 client must be readable by a v1 server). */
class ProtoPropertySpec extends AnyFunSuite {

  /** Run a scalacheck property under scalatest's assert. */
  private def check(prop: Prop): Unit = {
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(result.passed, result.status.toString)
  }

  private val anyLong: Gen[Long] = Gen.oneOf(
    Gen.choose(Long.MinValue, Long.MaxValue),
    Gen.oneOf(0L, 1L, -1L, 127L, 128L, 300L, Long.MaxValue, Long.MinValue))

  test("varint field round-trips the full Long range") {
    check(Prop.forAll(anyLong) { v =>
      val bytes = new Proto.Writer().int(1, v).result
      new Proto.Reader(bytes).fields(1) == Seq(v)
    })
  }

  test("string fields round-trip arbitrary unicode, preserving order") {
    check(Prop.forAll(Gen.listOf(Gen.asciiPrintableStr),
      Gen.listOf(Gen.identifier)) { (as: List[String], bs: List[String]) =>
        val w = new Proto.Writer
        as.foreach(w.string(1, _)); bs.foreach(w.string(2, _))
        val r = new Proto.Reader(w.result)
        def strs(f: Int) = r.fields.getOrElse(f, Nil)
          .map(b => new String(b.asInstanceOf[Array[Byte]], "UTF-8"))
        strs(1) == as && strs(2) == bs
    })
  }

  test("doubles round-trip bit-exactly through ImportMsg (incl. specials)") {
    val anyDouble = Gen.oneOf(
      Gen.choose(-1e300, 1e300),
      Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, Double.MaxValue,
        Double.NegativeInfinity, Double.PositiveInfinity))
    check(Prop.forAll(Gen.listOf(anyDouble)) { ds: List[Double] =>
      val w = new Proto.Writer
      ds.foreach(w.double(8, _))
      val got = new PbQuery.ImportMsg(w.result).doubles(8)
      got.map(java.lang.Double.doubleToLongBits) ==
        ds.map(java.lang.Double.doubleToLongBits)
    })
  }

  test("packed and unpacked repeated varints decode identically " +
    "(proto3 parsers must accept both)") {
    check(Prop.forAll(Gen.listOf(anyLong)) { vs: List[Long] =>
      val unpacked = { val w = new Proto.Writer; vs.foreach(w.int(5, _)); w.result }
      val packed = {
        val inner = new Proto.Writer; vs.foreach(inner.varint)
        new Proto.Writer().bytes(5, inner.result).result
      }
      new PbQuery.ImportMsg(unpacked).longs(5) == vs &&
        new PbQuery.ImportMsg(packed).longs(5) == vs
    })
  }

  test("nested messages round-trip; unknown fields are skipped not fatal") {
    check(Prop.forAll(Gen.identifier, anyLong, Gen.identifier) {
      (name, shard, extra) =>
        val w = new Proto.Writer
        w.string(99, extra)         // unknown string field first
        w.int(98, shard)            // unknown varint field
        w.msg(2)(v => { v.string(1, name); v.int(3, shard) })
        val r = new Proto.Reader(w.result)
        val inner = new Proto.Reader(r.fields(2).head.asInstanceOf[Array[Byte]])
        inner.str(1).contains(name) && inner.fields(3) == Seq(shard)
    })
  }

  test("malformed input never hangs, over-allocates, or escapes cleanly-thrown errors") {
    // the length-claim attack: 10 bytes claiming a gigabyte payload must
    // throw a clean malformed error WITHOUT allocating the claim
    val attack = new java.io.ByteArrayOutputStream()
    attack.write(0x0a) // field 1, wire 2
    // varint 2^30
    attack.write(0x80); attack.write(0x80); attack.write(0x80); attack.write(0x80)
    attack.write(0x04)
    attack.write('x')
    val before = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    val e = intercept[RuntimeException](new Proto.Reader(attack.toByteArray).fields)
    assert(e.getMessage.contains("malformed"), e.getMessage)
    val after = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    assert(after - before < 100L * 1024 * 1024, "length claim was allocated")
    // truncated varint / fixed64
    for (bad <- Seq(Array(0x08, 0xff).map(_.toByte),      // varint cut mid-byte
                    Array(0x09, 0x01).map(_.toByte),      // fixed64 with 1 byte
                    Array.fill(11)(0xff.toByte))) {       // overlong varint
      val ex = intercept[RuntimeException](new Proto.Reader(bad).fields)
      assert(ex.getMessage.contains("malformed") ||
        ex.getMessage.contains("unsupported wire type"), ex.getMessage)
    }
    // random-bytes fuzz: parse returns or throws RuntimeException promptly;
    // nothing else (no AIOOBE, no NegativeArraySize, no hang)
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 3000) {
      val bytes = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      try { new Proto.Reader(bytes).fields; () }
      catch {
        case e: RuntimeException =>
          assert(e.getMessage.contains("malformed") ||
            e.getMessage.contains("unsupported wire type"),
            s"unexpected error ${e.getClass}: ${e.getMessage} for " +
              bytes.map("%02x".format(_)).mkString)
      }
    }
  }

  test("packed repeated-varint chunks get the same malformed guards as the reader") {
    // a packed Shards chunk ending on a continuation bit: clean error, no
    // AIOOBE (this layer sits BELOW Proto.Reader's own varint guards)
    val w = new Proto.Writer
    w.string(1, "Count(All())")
    w.bytes(2, Array(0x03, 0x80).map(_.toByte)) // varint 3, then truncated
    val e = intercept[RuntimeException](PbQuery.decodeRequest(w.result))
    assert(e.getMessage.contains("malformed"), e.getMessage)
    // overlong: 11 continuation bytes inside a packed chunk
    val w2 = new Proto.Writer
    w2.bytes(2, Array.fill(11)(0xff.toByte))
    val e2 = intercept[RuntimeException](PbQuery.decodeRequest(w2.result))
    assert(e2.getMessage.contains("malformed"), e2.getMessage)
  }

  test("QueryRequest decode matches what the writer encodes for any " +
    "query + shard list") {
    check(Prop.forAll(Gen.asciiPrintableStr,
      Gen.listOf(Gen.choose(0L, 1L << 40))) {
      (q: String, shards: List[Long]) =>
        val w = new Proto.Writer
        w.string(1, q)
        if (shards.nonEmpty) {
          val inner = new Proto.Writer; shards.foreach(inner.varint)
          w.bytes(2, inner.result)
        }
        val (dq, ds) = PbQuery.decodeRequest(w.result)
        dq == q && ds == shards
    })
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import KafkaIngest.IdkField

/** Avro + Schema-Registry decode for the Kafka IDK consumer
  * (`reference/idk/kafka/source.go:478-502`): Confluent-framed values —
  * magic `0x00`, 4-byte big-endian schema id, Avro binary — decoded
  * against the id's writer schema, then run through the same typed
  * projection as the JSON wire.
  *
  * The registry itself is an HTTP service the reference queries per new id
  * (`getCodec`); this container has no egress, so the id→schema map is
  * supplied by the caller — a deployment swaps in a registry-backed lookup
  * without touching the decode. Unframed values (no registry) decode
  * against a single fixed schema.
  *
  * Spark shape: the Avro library (on the Spark classpath) has no
  * `from_avro` Column function in this build, so decode runs in
  * `mapPartitions` — reader and parsed schemas constructed once per
  * partition, a narrow map with no shuffle, the one place where dropping
  * below built-in functions is warranted (SURVEY preference (d)). */
object AvroIngest {

  /** Decode Confluent-framed (`framed=true`) or bare Avro `value` bytes.
    * @param schemas writer-schema JSON by registry id (id 0 = the bare
    *                schema when `framed=false`) */
  def decode(raw: DataFrame, schemas: Map[Int, String],
             fields: Seq[IdkField], framed: Boolean = true): DataFrame = {
    val wire = KafkaIngest.wireSchema(fields)
    val names = wire.fieldNames
    val dts = wire.fields.map(_.dataType)
    val parsed = raw.select(col("value").cast(BinaryType))
      .mapPartitions { it =>
        val parser = new org.apache.avro.Schema.Parser()
        val byId = schemas.map { case (id, s) => id -> parser.parse(s) }
        val readers = byId.map { case (id, s) =>
          id -> new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord](s)
        }
        var decoder: org.apache.avro.io.BinaryDecoder = null
        it.map { r =>
          val bytes = r.getAs[Array[Byte]](0)
          val (id, payload) =
            if (framed) {
              // `source.go:479-482`: magic byte + BE uint32 schema id
              require(bytes.length >= 6 && bytes(0) == 0,
                f"unexpected magic byte or length in avro kafka value, " +
                f"should be 0x00, but got 0x${bytes.headOption.getOrElse(0.toByte)}%02x")
              (java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt,
               java.util.Arrays.copyOfRange(bytes, 5, bytes.length))
            } else (0, bytes)
          val reader = readers.getOrElse(id,
            sys.error(s"no schema registered for id $id"))
          decoder = org.apache.avro.io.DecoderFactory.get()
            .binaryDecoder(payload, decoder)
          val rec = reader.read(null, decoder)
          Row.fromSeq(names.indices.map(i =>
            coerce(rec.get(names(i)), dts(i))))
        }
      }(Encoders.row(wire))
    KafkaIngest.typedProjection(parsed, fields)
  }

  /** Avro runtime value → wire-schema value (`source.go` avroDecode value
    * taxonomy: Utf8 strings, numerics, byte-decimal logical types,
    * arrays). */
  private def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _)                    => null
    case (n: Number, LongType)        => n.longValue
    case (n: Number, DoubleType)      => n.doubleValue
    case (b: java.lang.Boolean, BooleanType) => b
    case (s, StringType)              => s.toString // Utf8 included
    case (n: Number, d: DecimalType)  =>
      new java.math.BigDecimal(n.toString).setScale(d.scale)
    case (b: java.nio.ByteBuffer, d: DecimalType) =>
      // bytes logical-type decimal: two's-complement unscaled int
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr)
      new java.math.BigDecimal(new java.math.BigInteger(arr), d.scale)
    case (s, d: DecimalType)          =>
      new java.math.BigDecimal(s.toString).setScale(d.scale)
    case (a: java.util.Collection[_], ArrayType(et, _)) =>
      val it = a.iterator()
      val buf = Seq.newBuilder[Any]
      while (it.hasNext) buf += coerce(it.next(), et)
      buf.result()
    case (other, t) => sys.error(
      s"cannot coerce avro value ${other.getClass.getSimpleName} to ${t.simpleString}")
  }
}

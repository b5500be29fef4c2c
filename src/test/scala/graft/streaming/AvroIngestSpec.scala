package graft.streaming

import graft.SparkSpec
import graft.streaming.KafkaIngest.IdkField
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory

/** Round-trips real Avro binary (bare and Confluent-framed) through
  * [[AvroIngest.decode]] — the wire the reference's Kafka consumer reads
  * (`idk/kafka/source.go:478-502`). */
class AvroIngestSpec extends SparkSpec {

  private val schemaJson =
    """{"type":"record","name":"ev","fields":[
      |{"name":"_id","type":"long"},
      |{"name":"name","type":"string"},
      |{"name":"score","type":"double"},
      |{"name":"price","type":{"type":"bytes","logicalType":"decimal","precision":18,"scale":2}},
      |{"name":"tags","type":{"type":"array","items":"string"}},
      |{"name":"ts","type":"long"}]}""".stripMargin
  private val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)

  private val fields = Seq(IdkField("_id", "id"), IdkField("name", "string"),
    IdkField("score", "double"), IdkField("price", "decimal", scale = 2),
    IdkField("tags", "stringset"), IdkField("ts", "timestamp", unit = "ms"))

  private def record(id: Long, name: String, score: Double, cents: Long,
                     tags: Seq[String], tsMs: Long): Array[Byte] = {
    val r = new GenericData.Record(schema)
    r.put("_id", id); r.put("name", name); r.put("score", score)
    r.put("price", java.nio.ByteBuffer.wrap(
      java.math.BigInteger.valueOf(cents).toByteArray))
    val arr = new GenericData.Array[CharSequence](schema.getField("tags").schema(),
      java.util.Arrays.asList(tags.map(x => x: CharSequence): _*))
    r.put("tags", arr); r.put("ts", tsMs)
    val out = new java.io.ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(r, enc)
    enc.flush()
    out.toByteArray
  }

  private def framed(schemaId: Int, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(5 + payload.length)
    b.put(0.toByte).putInt(schemaId).put(payload)
    b.array()
  }

  test("Confluent-framed Avro decodes to typed columns (source.go:478-502)") {
    import spark.implicits._
    val vals = Seq(
      framed(7, record(1, "ada", 9.5, 1234, Seq("a", "b"), 1672628645000L)),
      framed(7, record(2, "alan", 8.25, 99, Seq("c"), 1672628646000L)))
    val raw = vals.toDF("value")
    val out = AvroIngest.decode(raw, Map(7 -> schemaJson), fields)
      .orderBy("_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 1L && out(0).getString(1) == "ada")
    assert(out(0).getDecimal(3).compareTo(new java.math.BigDecimal("12.34")) == 0)
    assert(out(0).getSeq[String](4) == Seq("a", "b"))
    assert(out(0).getAs[java.sql.Timestamp]("ts").toInstant ==
      java.time.Instant.ofEpochMilli(1672628645000L))
    // bad magic byte raises the reference's wording
    val bad = Seq(Array[Byte](1, 2, 3, 4, 5, 6)).toDF("value")
    val e = intercept[Exception] {
      AvroIngest.decode(bad, Map(7 -> schemaJson), fields).collect()
    }
    assert(e.getMessage.contains("unexpected magic byte") ||
      Option(e.getCause).exists(_.getMessage.contains("unexpected magic byte")))
  }

  test("bare (unframed) Avro decodes against a fixed schema") {
    import spark.implicits._
    val raw = Seq(record(5, "k", 1.0, 500, Seq("z"), 0L)).toDF("value")
    val out = AvroIngest.decode(raw, Map(0 -> schemaJson), fields,
      framed = false).collect()
    assert(out.length == 1 && out(0).getLong(0) == 5L)
    assert(out(0).getDecimal(3).compareTo(new java.math.BigDecimal("5.00")) == 0)
  }
}

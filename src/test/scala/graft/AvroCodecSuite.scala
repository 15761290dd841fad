package graft

import graft.source.AvroCodec

/** Byte-level laws of the hand-rolled Avro OCF codec (the container
  * layer the roundtrip query rides): lossless encode→decode, valid
  * empty files, loud rejection of both non-Avro bytes and
  * foreign-but-valid Avro schemas (which must never mis-map fields
  * positionally).
  */
class AvroCodecSuite extends SparkSpec {

  private val rows = Seq(
    (1L, 10L, "purchase", 12345L),
    (2L, 20L, "view", 0L),
    (3L, 10L, "click", -7L), // negative long exercises zig-zag varint
    (4L, 30L, "", 9999999999L)) // empty string + >int32 long

  test("encode/decode roundtrip is lossless and order-preserving") {
    assert(AvroCodec.decode(AvroCodec.encode(rows.iterator)).toSeq === rows)
  }

  test("empty partition yields a valid zero-row file, not corrupt bytes") {
    val bytes = AvroCodec.encode(Iterator.empty)
    assert(bytes.length > 0, "header-only OCF still has magic+schema+sync")
    assert(AvroCodec.decode(bytes).toSeq === Seq.empty)
  }

  test("non-Avro bytes are rejected in the reader, not misparsed") {
    intercept[Exception] {
      AvroCodec.decode("not an avro file at all".getBytes("UTF-8")).toSeq
    }
  }

  test("a foreign writer schema fails loudly instead of mis-mapping") {
    // valid OCF, wrong record shape: build it with the avro library
    val s = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"Other","fields":[
        |  {"name":"a","type":"long"},{"name":"b","type":"long"},
        |  {"name":"c","type":"string"},{"name":"d","type":"long"}
        |]}""".stripMargin)
    val out = new java.io.ByteArrayOutputStream()
    val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](s))
    w.create(s, out)
    val r = new org.apache.avro.generic.GenericData.Record(s)
    r.put("a", 1L); r.put("b", 2L); r.put("c", "x"); r.put("d", 3L)
    w.append(r); w.close()
    val ex = intercept[IllegalArgumentException] {
      AvroCodec.decode(out.toByteArray).toSeq
    }
    assert(ex.getMessage.contains("Event fields"))
  }

  test("source_avro_roundtrip matches the in-memory rollup at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val viaAvro = SparkEntry.queries("source_avro_roundtrip")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    val direct = SparkEntry.queries("source_jsonl_roundtrip")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(viaAvro === direct)
  }
}

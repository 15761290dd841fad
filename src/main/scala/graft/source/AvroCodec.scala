package graft.source

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

/** Avro Object Container File codec for the source-roundtrip family.
  *
  * The environment ships the Avro CORE library (`avro-1.12.1.jar` on the
  * Spark classpath) but not the `spark-avro` DataSource, so — like the
  * ISO-BMFF work in [[graft.ops.VideoContainer]] — the CONTAINER layer is
  * made real by hand: OCF header (magic, schema JSON, sync marker),
  * snappy-compressed blocks, schema-on-read from the embedded writer
  * schema. Spark-side plumbing stays distributed: partitions encode
  * independently (one OCF per task), and the read path decodes whole
  * files from a `binaryFile` scan. At 100 TB the one extra step is block
  * SPLITTING — OCF sync markers let a DSv2 reader assign byte ranges and
  * `DataFileReader.sync(start)` to them — while this per-file decode
  * kernel is unchanged.
  *
  * Events projection only (the exactly-representable columns the other
  * roundtrips share): `event_id/user_id/cents` long, `event_type` string.
  */
object AvroCodec {

  val SchemaJson: String =
    """{"type":"record","name":"Event","fields":[
      |  {"name":"event_id","type":"long"},
      |  {"name":"user_id","type":"long"},
      |  {"name":"event_type","type":"string"},
      |  {"name":"cents","type":"long"}
      |]}""".stripMargin

  // parsed per-JVM (Schema is not serializable; executors re-parse from
  // the literal on first use)
  private lazy val schema: Schema = new Schema.Parser().parse(SchemaJson)

  /** Encode one partition's rows as a complete OCF byte stream
    * (snappy-coded blocks). An empty iterator yields a valid
    * header-only file that decodes to zero rows — empty partitions
    * must not produce corrupt output.
    */
  def encode(rows: Iterator[(Long, Long, String, Long)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.snappyCodec())
    w.create(schema, out)
    rows.foreach { case (eventId, userId, eventType, cents) =>
      val r = new GenericData.Record(schema)
      r.put("event_id", eventId)
      r.put("user_id", userId)
      r.put("event_type", eventType)
      r.put("cents", cents)
      w.append(r)
    }
    w.close()
    out.toByteArray
  }

  /** Decode a complete OCF byte stream. Schema-on-read: the embedded
    * writer schema drives decoding, then is CHECKED against the
    * expected field layout — a foreign-but-valid Avro file must fail
    * loudly here, not mis-map fields positionally. Non-Avro bytes fail
    * in `openReader` with the magic-number error.
    */
  def decode(bytes: Array[Byte]): Iterator[(Long, Long, String, Long)] = {
    val reader = DataFileReader.openReader(
      new SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord]())
    val got = reader.getSchema
    // check field TYPES, not just names: a foreign file with a
    // ["null","long"] union passes a name-only check, and a null value
    // then unboxes to 0L with no exception (`asInstanceOf[Long]` on
    // null is Scala unboxing) — silently zeroed amounts, the precise
    // mis-map this guard claims to prevent; a wrong-typed field would
    // die later with an uninformative ClassCastException
    val expected = Seq(
      "event_id" -> Schema.Type.LONG,
      "user_id" -> Schema.Type.LONG,
      "event_type" -> Schema.Type.STRING,
      "cents" -> Schema.Type.LONG)
    require(got.getType == Schema.Type.RECORD &&
      expected.forall { case (f, t) =>
        val fld = got.getField(f)
        fld != null && fld.schema().getType == t
      },
      s"AvroCodec.decode: writer schema $got does not carry the Event " +
        "fields with their exact types (long, long, string, long)")
    new Iterator[(Long, Long, String, Long)] {
      def hasNext: Boolean = {
        val h = reader.hasNext
        if (!h) reader.close()
        h
      }
      def next(): (Long, Long, String, Long) = {
        val r = reader.next()
        (r.get("event_id").asInstanceOf[Long],
          r.get("user_id").asInstanceOf[Long],
          r.get("event_type").toString, // Utf8 -> String
          r.get("cents").asInstanceOf[Long])
      }
    }
  }
}

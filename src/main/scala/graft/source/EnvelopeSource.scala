package graft.source

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.model.Schemas

/** DataSource V2 envelope source — the production form of the reference's
  * ZeroMQ SUB socket (S1–S3, /root/reference/src/main.rs:186-222).
  *
  * Offline (no ZMQ transport jar), the wire is abstracted to a spool
  * DIRECTORY of JSON-lines files: a feed adapter appends immutable
  * `*.jsonl` files (one `{"topic","frameType","payload"}` object per
  * line); this source tails the directory as a micro-batch stream.
  * Offsets carry the high-watermark file NAME over the name-sorted file
  * list, so a batch is an immutable (name-range) file set — replayable,
  * checkpoint-friendly, exactly-once on retry (the delivery upgrade over
  * the reference's at-most-once SUB socket, SURVEY §2.6). Writers must
  * use monotonically increasing names; a violation leaves the late file
  * ignored rather than shifting consumed ranges.
  *
  * The reference's topic-prefix subscription (S2, `set_subscribe`,
  * main.rs:204-206) becomes the `topicPrefix` option, applied INSIDE the
  * partition reader — rows that don't match never reach the engine, the
  * same place ZMQ drops them (transport-side pushdown).
  *
  * One input partition per file: parallelism scales with spool files,
  * and a slow reader never blocks other partitions (vs the reference's
  * fully serialized recv loop, main.rs:219-230).
  *
  * Usage: `spark.readStream.format(classOf[EnvelopeSourceProvider].getName)
  * .option("path", dir).option("topicPrefix", "eurusd").load()` (same for
  * batch `spark.read`).
  */
class EnvelopeSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Schemas.envelopeSchema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // option keys arrive case-insensitively (often lowercased)
    def opt(k: String) = Option(properties.get(k))
      .orElse(Option(properties.get(k.toLowerCase)))
    new EnvelopeTable(
      properties.get("path"),
      opt("topicPrefix").getOrElse(""),
      opt("maxFilesPerTrigger").map(_.toInt),
      opt("startingAfter").getOrElse(""))
  }
}

private[source] class EnvelopeTable(
    dir: String, topicPrefix: String, maxFilesPerTrigger: Option[Int],
    startingAfter: String = "")
    extends Table with SupportsRead {
  require(dir != null, "envelope source requires a 'path' option")
  override def name(): String = s"envelopes($dir)"
  override def schema(): StructType = Schemas.envelopeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new EnvelopeScan(dir, topicPrefix, maxFilesPerTrigger, startingAfter)
}

private[source] object EnvelopeSpool {
  /** Immutable-once-present spool contract: file list sorted by NAME.
    * Names must arrive in monotone sort order (writers use
    * monotonically increasing names — sequence numbers / timestamps);
    * a file sorting at or below the consumed high-watermark name is
    * ignored, never silently shifted into an already-consumed range.
    */
  def files(dir: String): Seq[Path] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else graft.util.Fs.list(p)
      .filter(_.toString.endsWith(".jsonl"))
      .sortBy(_.getFileName.toString)
  }

  /** Files strictly after the high-watermark name ("" = everything). */
  def filesAfter(dir: String, watermark: String): Seq[Path] =
    files(dir).filter(_.getFileName.toString > watermark)
}

private[source] class EnvelopeScan(
    dir: String, topicPrefix: String,
    maxFilesPerTrigger: Option[Int] = None,
    startingAfter: String = "")
    extends Scan {
  override def readSchema(): StructType = Schemas.envelopeSchema
  override def description(): String =
    s"EnvelopeScan(dir=$dir, topicPrefix=$topicPrefix)"
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      EnvelopeSpool.filesAfter(dir, startingAfter).map(f =>
        EnvelopeFilePartition(f.toString, topicPrefix): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      EnvelopeReaderFactory
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new EnvelopeMicroBatchStream(dir, topicPrefix, maxFilesPerTrigger,
      startingAfter)
}

/** Offset = the high-watermark spool file NAME ("" before any file is
  * consumed). A positional count over a re-sorted listing would silently
  * shift every consumed index if a new file ever sorted below an
  * already-consumed one (double-reads + gaps); anchoring the offset to
  * the name itself makes a sort-order violation inert — the late file is
  * ignored — instead of corrupting the replay contract.
  *
  * Precise replay semantics: a batch is re-planned from the name range
  * (start, end], so a contract-violating file that lands INSIDE a
  * not-yet-committed range after the original run would be included on
  * replay (and one at/below a committed watermark is never read, with
  * no error). Exact replay therefore rests on the writer contract —
  * monotone names, immutable once present — which
  * [[SpoolTransportAdapter]] enforces by resuming its sequence past
  * existing files.
  */
private[graft] case class FileNameOffset(lastFile: String) extends Offset {
  override def json(): String =
    s"""{"v":2,"lastFile":${graft.util.JsonStrings.quote(lastFile)}}"""
}

private[graft] object FileNameOffset {
  private val V2 = """\{"v":2,"lastFile":"((?:[^"\\]|\\.)*)"\}""".r

  /** Checkpointed-offset decode, VERSIONED. The pre-v2 offset was a bare
    * file COUNT; reinterpreting a numeric like "3" as a name watermark
    * would sort ABOVE spool names like "0000000002.jsonl" and silently
    * skip unconsumed files (data loss). Unrecognized formats fail loudly
    * instead.
    */
  def fromJson(json: String): FileNameOffset = json match {
    case V2(name) => FileNameOffset(graft.util.JsonStrings.unescape(name))
    case _ => throw new IllegalStateException(
      s"unrecognized envelope-source offset '$json': expected " +
        """{"v":2,"lastFile":...}. A checkpoint written by the legacy """ +
        "file-count offset format is not replayable under name-anchored " +
        "offsets; restart the query with a fresh checkpoint location.")
  }
}

/** Admission control (backpressure): `maxFilesPerTrigger` caps how much
  * spool each micro-batch admits — the rate-limiting the reference lacks
  * entirely (its ZMQ HWM silently DROPS under pressure, SURVEY §2.6;
  * here excess input just waits in the spool for the next trigger).
  */
private[source] class EnvelopeMicroBatchStream(
    dir: String, topicPrefix: String, maxFilesPerTrigger: Option[Int] = None,
    startingAfter: String = "")
    extends MicroBatchStream with SupportsAdmissionControl {
  // Replay/backfill control: `startingAfter` seeds the FIRST offset at
  // a known file name, so a re-processing query skips the already-
  // handled prefix of the spool. Only consulted when no checkpoint
  // exists — a restart's position always comes from the checkpoint.
  override def initialOffset(): Offset = FileNameOffset(startingAfter)
  override def latestOffset(): Offset =
    FileNameOffset(EnvelopeSpool.files(dir).lastOption
      .map(_.getFileName.toString).getOrElse(""))
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())
  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val start = startOffset.asInstanceOf[FileNameOffset].lastFile
    val pending = EnvelopeSpool.filesAfter(dir, start)
    val admitted = limit match {
      case mf: ReadMaxFiles => pending.take(mf.maxFiles())
      case _ => pending
    }
    admitted.lastOption
      .map(f => FileNameOffset(f.getFileName.toString))
      .getOrElse(FileNameOffset(start))
  }
  override def deserializeOffset(json: String): Offset =
    FileNameOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FileNameOffset].lastFile
    val e = end.asInstanceOf[FileNameOffset].lastFile
    EnvelopeSpool.filesAfter(dir, s)
      .filter(_.getFileName.toString <= e)
      .map(f =>
        EnvelopeFilePartition(f.toString, topicPrefix): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    EnvelopeReaderFactory
}

private[source] case class EnvelopeFilePartition(
    file: String, topicPrefix: String) extends InputPartition

private[source] object EnvelopeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EnvelopeFilePartition]
    new EnvelopeFileReader(p.file, p.topicPrefix)
  }
}

/** Streams one spool file; demuxes the 3 logical frames from each JSON
  * line (S3) and applies the topic-prefix subscription filter (S2).
  * Malformed lines become rows with null payload — the dead-letter branch
  * downstream decides (K5 upgrade over the reference's silent drop).
  */
private[source] object EnvelopeFileReader {
  // one compiled pattern per envelope field, hoisted OUT of the per-row
  // path: building these inside parse() meant three Pattern.compile
  // calls per ingested line — avoidable CPU dominating exactly the path
  // StreamBench measures
  private val FieldRes: Map[String, scala.util.matching.Regex] =
    Seq("topic", "frameType", "payload")
      .map(n => n -> ("\"" + n + "\"\\s*:\\s*").r).toMap
}

private[source] class EnvelopeFileReader(file: String, topicPrefix: String)
    extends PartitionReader[InternalRow] {
  private val lines = Files.newBufferedReader(
    Paths.get(file), StandardCharsets.UTF_8)
  private var row: InternalRow = _

  // Minimal single-object JSON frame demux (topic/frameType/payload of the
  // envelope are flat strings; payload may itself be arbitrary JSON, kept
  // verbatim for from_json downstream).
  private def parse(line: String): InternalRow = {
    def field(name: String): Option[String] = {
      val m = EnvelopeFileReader.FieldRes(name).findFirstMatchIn(line)
      m.flatMap { mm =>
        val rest = line.substring(mm.end)
        if (rest.startsWith("\"")) {
          // JSON string decode: bounds-checked escapes (a lone trailing
          // backslash is a parse failure -> null row, never a thrown
          // exception) and spec-correct escape values, so payloads are
          // byte-faithful for from_json downstream.
          val sb = new StringBuilder
          var i = 1
          var done = false
          var bad = false
          while (i < rest.length && !done && !bad) {
            rest.charAt(i) match {
              case '\\' =>
                if (i + 1 >= rest.length) bad = true
                else {
                  rest.charAt(i + 1) match {
                    case '"'  => sb.append('"');  i += 2
                    case '\\' => sb.append('\\'); i += 2
                    case '/'  => sb.append('/');  i += 2
                    case 'n'  => sb.append('\n'); i += 2
                    case 't'  => sb.append('\t'); i += 2
                    case 'r'  => sb.append('\r'); i += 2
                    case 'b'  => sb.append('\b'); i += 2
                    case 'f'  => sb.append('\f'); i += 2

                    case 'u' =>
                      // exactly 4 hex digits per the JSON spec —
                      // Integer.parseInt alone would accept "-1AB"
                      // and decode garbage instead of dead-lettering
                      if (i + 5 >= rest.length ||
                          !rest.substring(i + 2, i + 6).forall(c =>
                            Character.digit(c, 16) >= 0)) bad = true
                      else {
                        sb.append(Integer.parseInt(
                          rest.substring(i + 2, i + 6), 16).toChar)
                        i += 6
                      }
                    case _ => bad = true // invalid escape per JSON spec
                  }
                }
              case '"'  => done = true
              case c    => sb.append(c); i += 1
            }
          }
          if (done && !bad) Some(sb.toString) else None
        } else { // non-string payload: capture balanced JSON value
          // `stop` is the EXCLUSIVE end of the value. A closer seen at
          // depth 0 is the ENVELOPE's own closing brace, not part of
          // the value (a bare-number payload in last position — `42}` —
          // previously captured that brace into the payload, corrupting
          // a valid frame and poisoning the dead-letter forensics with
          // bytes that never arrived on the wire).
          var depth = 0; var i = 0; var stop = -1
          var inStr = false
          while (i < rest.length && stop < 0) {
            rest.charAt(i) match {
              case '\\' if inStr => i += 1
              case '"' => inStr = !inStr
              case '[' | '{' if !inStr => depth += 1
              case ']' | '}' if !inStr =>
                if (depth == 0) stop = i
                else { depth -= 1; if (depth == 0) stop = i + 1 }
              case ',' if !inStr && depth == 0 => stop = i
              case _ => ()
            }
            i += 1
          }
          Some(rest.substring(0, if (stop < 0) rest.length else stop).trim)
        }
      }
    }
    val topic = field("topic")
    val frameType = field("frameType")
    val payload = field("payload")
    if (topic.isEmpty) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(topic.get),
      frameType.map(UTF8String.fromString).orNull,
      payload.map(UTF8String.fromString).orNull))
  }

  override def next(): Boolean = {
    var line = lines.readLine()
    while (line != null) {
      if (line.nonEmpty) {
        val r = parse(line)
        // S2: transport-side prefix subscription — non-matching topics
        // never enter the engine.
        if (r != null &&
            r.getUTF8String(0).toString.startsWith(topicPrefix)) {
          row = r
          return true
        }
      }
      line = lines.readLine()
    }
    false
  }
  override def get(): InternalRow = row
  override def close(): Unit = lines.close()
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import KafkaIngest.IdkField

/** CSV IDK consumer (`reference/idk/csv/source.go`, `reference/idk/cmd.go`,
  * header grammar `reference/idk/header.go:40-56,405-447`).
  *
  * The reference's CSV ingester reads files whose header cells carry the
  * field spec — `Source__Type_Arg_Arg2` or `Source___Dest__Type_Args`
  * (dunder separates name from spec, triple-underscore separates source
  * from destination name) — then decodes each row through the same IDK field
  * taxonomy as the Kafka consumer and imports batches.
  *
  * Spark-native: [[parseHeader]] maps the header grammar onto the shared
  * [[KafkaIngest.IdkField]] taxonomy; [[read]] (batch) and [[source]]
  * (Structured Streaming over a file directory) load the CSV with an
  * all-string schema and apply one typed projection — every conversion is a
  * built-in codegen'd cast, no UDFs. The stream path feeds the same
  * checkpointed upsert sink as Kafka ([[Ingest]]), giving the IDK pipeline's
  * at-least-once Commit() semantics or better.
  *
  * Scale note: CSV decode is embarrassingly parallel (one task per file
  * split); the typed projection carries no shuffle. At 100 TB the only knob
  * that matters is `maxFilesPerTrigger`/file-split size, both standard
  * Spark source options passed through untouched.
  */
object CsvIngest {

  /** Parse one header cell per `header.go:405-447` splitHeader +
    * `HeaderToField`. With `justDoIt` (the reference's `-j`), malformed
    * cells downcase to a string field named after the cell
    * (`csv/source.go:85-87`). Returns the field plus its destination
    * column name (DestName wins over SourceName, `header.go:42-56`). */
  def parseHeaderField(cell: String, justDoIt: Boolean = false): (IdkField, String) = {
    def fallback = (IdkField(cell.toLowerCase, "string"), cell.toLowerCase)
    val (source, dest, spec) = {
      val tri = cell.split("___", 2)
      if (tri.length == 2) {
        val duo = tri(1).split("__", 2)
        if (duo.length != 2)
          if (justDoIt) return fallback
          else throw new IllegalArgumentException(
            s"field '$cell' has dest name but no field spec")
        (tri(0), duo(0), duo(1))
      } else {
        val duo = cell.split("__", 2)
        if (duo.length != 2)
          if (justDoIt) return fallback
          else throw new IllegalArgumentException(s"no field spec in this header: '$cell'")
        (duo(0), duo(0), duo(1))
      }
    }
    val parts = spec.split("_")
    val typ = parts(0).toLowerCase
    val arg = (i: Int) => parts.lift(i)
    val f = typ match {
      case "id" | "foreignkey"      => IdkField(source, "id")
      case "string" | "lookuptext"  => IdkField(source, "string")
      case "int"                    => IdkField(source, "int")
      case "decimal"                =>
        IdkField(source, "decimal", scale = arg(1).map(_.toInt).getOrElse(0))
      case "bool"                   => IdkField(source, "bool")
      // TimestampField: Granularity_Layout_Epoch_Unit (`header.go:319-356`);
      // integer-epoch cells use the unit (fieldspec[4]), string cells parse
      // as RFC3339/ISO (custom Go layouts unsupported — documented)
      case "timestamp"              =>
        IdkField(source, "recordtime", unit = arg(4).getOrElse("s"))
      case "recordtime"             => IdkField(source, "recordtime")
      case "dateint"                => IdkField(source, "dateint")
      case "stringarray"            => IdkField(source, "stringset")
      case "idarray"                => IdkField(source, "idset")
      case "signedintboolkey"       => IdkField(source, "int")
      case "ignore"                 => IdkField(source, "ignore")
      case other =>
        if (justDoIt) return fallback
        else throw new IllegalArgumentException(s"unknown field '$other' for '$cell'")
    }
    (f, if (dest.nonEmpty) dest else source)
  }

  def parseHeader(cells: Seq[String], justDoIt: Boolean = false): Seq[(IdkField, String)] =
    cells.map(parseHeaderField(_, justDoIt))

  /** Typed projection from the all-string CSV columns. Array cells are the
    * IDK wire's comma-joined members; `recordtime` accepts both RFC3339 and
    * integer epochs in the configured unit (`interfaces.go:449-471`). */
  private def convert(f: IdkField, dest: String): Column = {
    val c = col(f.name)
    (f.typ match {
      case "id" | "int" => c.cast(LongType)
      case "decimal"    => c.cast(DecimalType(38, f.scale))
      case "bool"       => c.cast(BooleanType)
      case "stringset"  => split(c, ",")
      case "idset"      => transform(split(c, ","), x => x.cast(LongType))
      case "recordtime" =>
        when(c.rlike("^-?[0-9]+$"),
          graft.core.TimeUnits.epochToTimestamp(c.cast(LongType), f.unit,
            java.time.Instant.EPOCH))
          .otherwise(to_timestamp(c))
      case "string"     => c
      case other        => sys.error(s"unhandled type '$other'")
    }).as(dest)
  }

  private def project(raw: DataFrame, fields: Seq[(IdkField, String)]): DataFrame = {
    val cols = fields.collect {
      case (f, dest) if f.typ != "ignore" && f.typ != "dateint" => convert(f, dest)
      // DateIntField: a date string at `Layout` stored as an int
      // (`header.go:281-317`); days since epoch is the int encoding
      case (f, dest) if f.typ == "dateint" =>
        datediff(to_date(col(f.name)), lit("1970-01-01").cast(DateType)).as(dest)
    }
    raw.select(cols: _*)
  }

  private def rawSchema(fields: Seq[(IdkField, String)]): StructType =
    StructType(fields.map { case (f, _) => StructField(f.name, StringType) })

  /** Batch read: header row in the file carries the field specs (the
    * reference's default, `csv/source.go:63-77` expectHeader). */
  def read(spark: SparkSession, path: String, justDoIt: Boolean = false): DataFrame = {
    // Spark reads the header cells verbatim as column names
    val withHeader = spark.read.option("header", "true").csv(path)
    val fields = parseHeader(withHeader.schema.fieldNames.toSeq, justDoIt)
    project(withHeader.toDF(fields.map(_._1.name): _*), fields)
  }

  /** Batch read with a configured header (`--header` + `IgnoreHeader`,
    * `csv/cmd.go:16-17`). */
  def readWithHeader(spark: SparkSession, path: String, header: Seq[String],
                     ignoreFileHeader: Boolean = false,
                     justDoIt: Boolean = false): DataFrame = {
    val fields = parseHeader(header, justDoIt)
    val raw = spark.read
      .option("header", ignoreFileHeader.toString)
      .schema(rawSchema(fields))
      .csv(path)
    project(raw, fields)
  }

  /** Streaming source over a directory of CSV files — the IDK tailing
    * ingester as a Structured Streaming file source. A configured header is
    * required (a stream cannot sniff one file's first line). */
  def source(spark: SparkSession, dir: String, header: Seq[String],
             ignoreFileHeader: Boolean = false): DataFrame = {
    val fields = parseHeader(header)
    val raw = spark.readStream
      .option("header", ignoreFileHeader.toString)
      .schema(rawSchema(fields))
      .csv(dir)
    project(raw, fields)
  }
}

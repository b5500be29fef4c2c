package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import KafkaIngest.IdkField

/** SQL-database IDK consumer (`reference/idk/sql/source.go`): ingest the
  * result of a SQL query whose column aliases carry the IDK field spec —
  * `SELECT col AS "col__Type_Args" ...` (`source.go:152-162` runs each
  * result column through the same `idk.HeaderToField` grammar as the CSV
  * consumer). String-array cells are split on a configurable separator
  * (`source.go:226-240`); duplicate rows are dropped (`source.go:71-112`
  * skips consecutively-repeated rows as feed compression — here the
  * distributed equivalent is exact-duplicate removal, a superset that does
  * not depend on result-set order).
  *
  * Spark-native: the built-in JDBC source replaces the Go `database/sql`
  * scan loop. At scale the read parallelizes with the standard
  * `partitionColumn`/`lowerBound`/`upperBound`/`numPartitions` options
  * (passed through verbatim) — one executor per id-range slice instead of
  * the reference's single-connection cursor. The typed projection reuses
  * the CSV consumer's header grammar; all conversions are codegen'd casts.
  */
object SqlIngest {

  /** Read `query` over JDBC and decode per the alias-encoded field specs.
    * @param options extra Spark JDBC options (driver, partitionColumn, …)
    * @param separator string-array cell separator (`source.go:231-240`:
    *                  any of the separator's characters splits) */
  def read(spark: SparkSession, url: String, query: String,
           options: Map[String, String] = Map.empty,
           separator: String = ",", dedupe: Boolean = true): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", url)
      .option("query", query)
    options.foreach { case (k, v) => r = r.option(k, v) }
    val raw = r.load()
    val fields = CsvIngest.parseHeader(raw.schema.fieldNames.toSeq)
    val renamed = raw.toDF(fields.map(_._1.name): _*)
    val typed = renamed.select(fields.collect {
      case (f, dest) if f.typ != "ignore" => convert(f, dest, separator)
    }: _*)
    if (dedupe) typed.dropDuplicates() else typed
  }

  /** Driver-local variant of [[read]] for single-JVM EMBEDDED databases
    * (Derby, H2 in embedded mode) under a multi-JVM master: such engines
    * admit exactly one booted JVM, but Spark's JDBC scan — plus every
    * sort/sample job over its lineage — runs in whichever executor gets
    * the task, so a 2-executor cluster deadlocks on the boot lock
    * (XSDB6) no matter who shuts down when. Fetch the result set on the
    * DRIVER with plain JDBC (the embedded engine's one legal home), then
    * run the SAME alias-header parse + convert chain as [[read]]. A
    * production deployment points [[read]] at a server database
    * (MySQL/Postgres, like the reference's idk/sql), where executors
    * connect concurrently and the distributed path applies. */
  def readLocal(spark: SparkSession, url: String, query: String,
                separator: String = ",", dedupe: Boolean = true): DataFrame = {
    val conn = java.sql.DriverManager.getConnection(url)
    val (names, rows) =
      try {
        val st = conn.createStatement()
        val rs = st.executeQuery(query)
        val md = rs.getMetaData
        val n = md.getColumnCount
        val names = (1 to n).map(md.getColumnLabel)
        val buf = Seq.newBuilder[org.apache.spark.sql.Row]
        while (rs.next()) {
          // render every cell to string; the convert chain casts from
          // string exactly as it casts from whatever the JDBC driver
          // produced (both go through Catalyst Cast)
          buf += org.apache.spark.sql.Row.fromSeq(
            (1 to n).map(i => Option(rs.getObject(i)).map(_.toString).orNull))
        }
        rs.close(); st.close()
        (names, buf.result())
      } finally conn.close()
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    val raw = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val fields = CsvIngest.parseHeader(names)
    val renamed = raw.toDF(fields.map(_._1.name): _*)
    val typed = renamed.select(fields.collect {
      case (f, dest) if f.typ != "ignore" => convert(f, dest, separator)
    }: _*)
    if (dedupe) typed.dropDuplicates() else typed
  }

  /** JDBC values arrive typed, so conversions cast from whatever the driver
    * produced; split character-class semantics match `Splitter`
    * (`source.go:231-240`). */
  private def convert(f: IdkField, dest: String, separator: String): Column = {
    val c = col(f.name)
    (f.typ match {
      case "id" | "int" => c.cast(LongType)
      case "decimal"    => c.cast(DecimalType(38, f.scale))
      case "bool"       => c.cast(BooleanType)
      case "string"     => c.cast(StringType)
      case "dateint"    =>
        datediff(to_date(c), lit("1970-01-01").cast(DateType))
      case "stringset"  =>
        filter(split(c.cast(StringType),
          "[" + java.util.regex.Pattern.quote(separator) + "]"),
          x => x =!= "")
      case "idset"      =>
        transform(filter(split(c.cast(StringType),
          "[" + java.util.regex.Pattern.quote(separator) + "]"),
          x => x =!= ""), x => x.cast(LongType))
      case "recordtime" => c.cast(TimestampType)
      case other        => sys.error(s"unhandled type '$other'")
    }).as(dest)
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Interactive shell — the `fbsql` analogue (`reference/fbsql/`): reads
  * statements from stdin and prints result tables.
  *
  *   - plain input  → reference-dialect SQL (`graft.sql.GraftSql`)
  *   - `:pql <index> <program>` → PQL against that table
  *   - `:set warehouse <dir>` → durable DML + archive target
  *   - `:backup <tar>` / `:restore <tar>` → the `featurebase backup` /
  *     `restore` verbs (`reference/ctl/backup.go`) over the warehouse
  *   - `:tables` / `:quit`
  *
  * `sbt "runMain graft.tools.Shell [sfDir]"`. Statements end at a newline;
  * end with `\` to continue on the next line.
  */
object Shell {

  /** The repl loop, session-injectable so specs can drive it without
    * owning (or stopping) the process-wide session. Returns on `:quit` or
    * end of input. */
  def repl(spark: SparkSession, dir: String, in: java.io.BufferedReader,
           out: java.io.PrintStream): Unit = {
    var line: String = null
    val buf = new StringBuilder
    out.print("graft> "); out.flush()
    while ({ line = in.readLine(); line != null }) {
      if (line.endsWith("\\")) buf.append(line.dropRight(1)).append(' ')
      else {
        val stmt = (buf.toString + line).trim
        buf.clear()
        stmt match {
          case "" =>
          case ":quit" | ":exit" => return
          case ":tables" => out.println(graft.core.Tables.names.mkString(" "))
          // `featurebase backup`/`restore` verbs (`reference/ctl/backup.go`)
          // as shell meta-commands over the durable warehouse
          case s if s.startsWith(":backup ") =>
            if (!graft.core.TableLog.isDurable(spark))
              out.println("error: set spark.graft.warehouse first (:set warehouse <dir>)")
            else {
              val tar = s.stripPrefix(":backup ").trim
              val n = graft.core.Backup.backup(
                spark.conf.get("spark.graft.warehouse"), tar).length
              out.println(s"$n entries -> $tar")
            }
          case s if s.startsWith(":restore ") =>
            if (!graft.core.TableLog.isDurable(spark))
              out.println("error: set spark.graft.warehouse first (:set warehouse <dir>)")
            else {
              val tar = s.stripPrefix(":restore ").trim
              graft.core.Backup.restore(tar, spark.conf.get("spark.graft.warehouse"))
              val tables = graft.sql.Ddl.restoreSession(spark)
              out.println(s"restored: ${tables.mkString(" ")}")
            }
          case s if s.startsWith(":set warehouse ") =>
            spark.conf.set("spark.graft.warehouse",
              s.stripPrefix(":set warehouse ").trim)
            out.println("ok - DML and :backup/:restore now use the warehouse")
          case s =>
            try {
              val df =
                if (s.startsWith(":pql ")) {
                  val rest = s.stripPrefix(":pql ").trim
                  val (idx, q) = rest.span(!_.isWhitespace)
                  graft.pql.Pql.program(spark, dir, idx, q.trim)
                } else graft.sql.GraftSql.sql(spark, dir, s)
              df.show(50, truncate = false)
            } catch { case e: Exception =>
              out.println(s"error: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.take(3).mkString(" ")}")
            }
        }
        out.print("graft> "); out.flush()
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.EngineConf(SparkSession.builder().master("local[8]")
      .appName("graft-shell")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.registerAll(spark, dir)
    println(s"graft shell - tables from $dir. SQL, :pql <index> <q>, :tables, " +
      ":set warehouse <dir>, :backup <tar>, :restore <tar>, :quit")
    repl(spark, dir,
      new java.io.BufferedReader(new java.io.InputStreamReader(System.in)),
      System.out)
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Interactive shell — the `fbsql` analogue (`reference/fbsql/`): reads
  * statements from stdin and prints result tables.
  *
  *   - plain input  → reference-dialect SQL (`graft.sql.GraftSql`)
  *   - `:pql <index> <program>` → PQL against that table
  *   - `:tables` / `:quit`
  *
  * `sbt "runMain graft.tools.Shell [sfDir]"`. Statements end at a newline;
  * end with `\` to continue on the next line.
  */
object Shell {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-shell")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.registerAll(spark, dir)
    println(s"graft shell - tables from $dir. SQL, :pql <index> <q>, :tables, :quit")
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
    var line: String = null
    val buf = new StringBuilder
    print("graft> "); Console.flush()
    while ({ line = in.readLine(); line != null }) {
      if (line.endsWith("\\")) buf.append(line.dropRight(1)).append(' ')
      else {
        val stmt = (buf.toString + line).trim
        buf.clear()
        stmt match {
          case "" =>
          case ":quit" | ":exit" => spark.stop(); return
          case ":tables" => println(graft.core.Tables.names.mkString(" "))
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
              println(s"error: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.take(3).mkString(" ")}")
            }
        }
        print("graft> "); Console.flush()
      }
    }
    spark.stop()
  }
}

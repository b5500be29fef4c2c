package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic for the embedded-Derby multi-JVM fixture: replicates the
  * src_sql_jdbc sequence step by step, printing the SQLState of every
  * shutdown attempt, to find which JVM holds the boot when an executor
  * scan dies with XSDB6 under local-cluster. */
object DerbyProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.EngineConf(graft.core.EngineConf.master(
      SparkSession.builder(), "local[4]")
      .appName("graft-derby-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val db = graft.streaming.Ingest.scratch("q_jdbc_probe") + "/db"
    val url = s"jdbc:derby:$db;create=true"

    def locks(): String = {
      val lck = new java.io.File(s"$db/db.lck").exists()
      val ex = new java.io.File(s"$db/dbex.lck").exists()
      s"db.lck=$lck dbex.lck=$ex"
    }
    def shutdown(tag: String): Unit =
      try {
        java.sql.DriverManager.getConnection(s"jdbc:derby:$db;shutdown=true")
        println(s"[derby] $tag: shutdown returned without exception (?) ${locks()}")
      } catch {
        case e: java.sql.SQLException =>
          println(s"[derby] $tag: SQLState=${e.getSQLState} ${locks()} msg=${e.getMessage.take(80)}")
      }

    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE t (a INT)")
    st.execute("INSERT INTO t VALUES (1), (2), (3)")
    st.close(); conn.close()
    shutdown("after-seed")

    val raw = spark.read.format("jdbc").option("url", url)
      .option("query", "SELECT a FROM t").load()
    println(s"[derby] schema resolved: ${raw.schema.simpleString}")
    shutdown("after-schema")

    try {
      val got = raw.localCheckpoint().collect().map(_.getInt(0)).sorted.toSeq
      println(s"[derby] executor read OK: $got")
    } catch {
      case e: Throwable =>
        println(s"[derby] executor read FAILED: ${e.getMessage.take(200)}")
    }
    shutdown("after-read")
    spark.stop()
  }
}

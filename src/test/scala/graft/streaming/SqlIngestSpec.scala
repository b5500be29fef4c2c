package graft.streaming

import graft.SparkSpec
import java.sql.DriverManager

/** Drives the SQL IDK consumer end-to-end against an embedded Derby
  * database — the offline stand-in for the reference's MySQL/Postgres
  * sources (`reference/idk/sql/source.go:139-146` opens any driver by
  * name; here the JDBC URL does). */
class SqlIngestSpec extends SparkSpec {

  private lazy val dbPath = Ingest.scratch("sqlidk") + "/db"
  private lazy val url = s"jdbc:derby:$dbPath;create=true"

  override def beforeAll(): Unit = {
    super.beforeAll()
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("""CREATE TABLE people (
      id INT NOT NULL, name VARCHAR(64), age INT, score DECIMAL(10,2),
      tags VARCHAR(128), joined TIMESTAMP)""")
    val ins = conn.prepareStatement(
      "INSERT INTO people VALUES (?, ?, ?, ?, ?, ?)")
    def add(id: Int, name: String, age: Int, score: String, tags: String,
            ts: String): Unit = {
      ins.setInt(1, id); ins.setString(2, name); ins.setInt(3, age)
      ins.setBigDecimal(4, new java.math.BigDecimal(score))
      ins.setString(5, tags)
      ins.setTimestamp(6, java.sql.Timestamp.valueOf(ts))
      ins.executeUpdate()
    }
    add(1, "ada", 36, "99.50", "math,logic", "2020-01-01 10:00:00")
    add(2, "alan", 41, "88.25", "crypto;logic", "2021-06-15 12:30:00")
    add(2, "alan", 41, "88.25", "crypto;logic", "2021-06-15 12:30:00") // dup
    ins.close(); st.close(); conn.close()
  }

  test("alias-encoded field specs type the JDBC result (source.go:152-162)") {
    val df = SqlIngest.read(spark, url,
      """SELECT id AS "id__ID", name AS "name__String", age AS "age__Int",
         score AS "score__Decimal_2", tags AS "tags__StringArray",
         joined AS "joined__RecordTime" FROM people""",
      separator = ",;")
    assert(df.columns.toSeq ==
      Seq("id", "name", "age", "score", "tags", "joined"))
    val r = df.orderBy("id").collect()
    // duplicate row dropped (source.go:71-112)
    assert(r.length == 2)
    assert(r(0).getLong(0) == 1L && r(0).getString(1) == "ada")
    assert(r(0).getDecimal(3).compareTo(new java.math.BigDecimal("99.50")) == 0)
    // separator is a character class: both ',' and ';' split (source.go:231)
    assert(r(0).getSeq[String](4) == Seq("math", "logic"))
    assert(r(1).getSeq[String](4) == Seq("crypto", "logic"))
    assert(r(1).getTimestamp(5).toLocalDateTime.getYear == 2021)
  }

  test("Ignore columns are dropped; dedupe can be disabled") {
    val df = SqlIngest.read(spark, url,
      """SELECT id AS "id__ID", name AS "junk__Ignore" FROM people""",
      dedupe = false)
    assert(df.columns.toSeq == Seq("id"))
    assert(df.count() == 3)
  }

  test("readLocal (the multi-JVM embedded-db path) matches read row for " +
      "row — schema, types, dedupe, separator class") {
    val q =
      """SELECT id AS "id__ID", name AS "name__String", age AS "age__Int",
         score AS "score__Decimal_2", tags AS "tags__StringArray",
         joined AS "joined__RecordTime" FROM people"""
    val dist = SqlIngest.read(spark, url, q, separator = ",;")
    val local = SqlIngest.readLocal(spark, url, q, separator = ",;")
    assert(local.schema == dist.schema, s"${local.schema} vs ${dist.schema}")
    val (a, b) = (dist.orderBy("id").collect().toSeq,
      local.orderBy("id").collect().toSeq)
    assert(a == b, s"\ndistributed: $a\nlocal:       $b")
  }
}

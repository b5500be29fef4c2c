package graft.sql

/** Dev probe: how Spark's parser shapes constructs the reference
  * type-checker needs to intercept. */
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.session
    val qs = Seq(
      "select a != b from t",
      "select a || b from t",
      "select a between 1 and 5 from t",
      "select a & 3, a << 2 from t",
      "select cast(a as bigint) from t",
      "select a % 2 from t",
      "select -a, ~a, not a from t",
      "select a in (1, 2) from t",
      "select a like 'x%' from t",
      "select 12.34, 2, 'x', true, null, array(1,2) from t",
      "select case when a > 1 then 'x' else 'y' end from t"
    )
    for (q <- qs) {
      val p = spark.sessionState.sqlParser.parsePlan(q)
      println("== " + q)
      println(p.toString.linesIterator.take(3).mkString("\n"))
      p.expressions.foreach { e =>
        e.foreach(x => println(s"   ${x.getClass.getSimpleName}: origin.start=${x.origin.startIndex} stop=${x.origin.stopIndex} sqlText=${x.origin.sqlText.isDefined}"))
      }
    }
  }
}

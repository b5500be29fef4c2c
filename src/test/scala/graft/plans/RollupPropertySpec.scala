package graft.plans

import graft.SparkSpec
import graft.core.Tables
import graft.index.GroupIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Differential property sweep for the r12 rollup algebra: random
  * combinations of key subsets × quantum units × aggregate vectors ×
  * predicates must read IDENTICALLY with the rewrite ON vs the
  * kill-switch baseline — whether a given query fires the exact match,
  * the unit rollup, the dimension rollup, a composition, or declines.
  * The sweep also asserts a minimum fire rate so a regression that
  * silently declines everything (parity trivially holds) still fails. */
class RollupPropertySpec extends SparkSpec {

  private def tolerantEqual(a: Array[org.apache.spark.sql.Row],
                            b: Array[org.apache.spark.sql.Row]): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) =>
      x.length == y.length && (0 until x.length).forall { i =>
        (x.get(i), y.get(i)) match {
          case (d: java.lang.Double, e: java.lang.Double) =>
            math.abs(d - e) <= 1e-9 * math.max(1.0, math.abs(e))
          case (p, q) => p == q
        }
      }
    }

  test("60 random grouped queries over a 3-key quantum index read " +
    "identically with the rewrite ON vs OFF; a healthy fraction is " +
    "index-served") {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("user_id"),
        col("value"), col("value").cast("decimal(12,2)").as("dval"))
    val root = graft.streaming.Ingest.scratch("idx_rollup_prop")
    val fact = s"$root/fact"
    ev.write.parquet(fact)
    val facts = spark.read.parquet(fact)
    val qh = GroupIndex.Quantum("ts", "hour")
    GroupIndex.buildTo(GroupIndex.withQuantums(facts, Seq(qh)),
      Seq("event_type", "user_id", qh.name), Seq("value", "dval"),
      s"$root/g", distinctCols = Seq("event_id"))
    IndexCatalog.registerGroup(fact, Seq("event_type", "user_id", qh.name),
      Set.empty, Seq("value", "dval"), spark.read.parquet(s"$root/g"),
      Seq("event_id"),
      quantums = Map(qh.name -> spark.sessionState.conf.sessionLocalTimeZone))
    IndexRewrite.install(spark)

    val keyPool: Seq[(String, DataFrame => Column)] = Seq(
      "event_type" -> (_ => col("event_type")),
      "user_id" -> (_ => col("user_id")),
      "q_hour" -> (_ => graft.core.Cols.dateTrunc("hour", col("ts")).as("qh")),
      "q_day" -> (_ => graft.core.Cols.dateTrunc("day", col("ts")).as("qd")),
      "q_week" -> (_ => graft.core.Cols.dateTrunc("week", col("ts")).as("qw")),
      "q_month" -> (_ => graft.core.Cols.dateTrunc("month", col("ts")).as("qm")))
    val aggPool: Seq[Column] = Seq(
      count(lit(1)).as("cnt"), sum(col("value")).as("sv"),
      min(col("value")).as("mn"), max(col("value")).as("mx"),
      avg(col("value")).as("av"), countDistinct(col("event_id")).as("ue"),
      sum(col("dval")).as("sd"), // decimal sum: exact-path serve, rollup declines
      avg(col("dval")).as("ad")) // decimal avg: always declines (typed)
    def ts(s: String) = lit(java.sql.Timestamp.valueOf(s))
    val predPool: Seq[Option[Column]] = Seq(
      None,
      Some(col("event_type") === "click"),
      Some(col("user_id") < 100),
      Some(col("event_type").isin("view", "purchase") && col("user_id") >= 10),
      Some(col("ts") >= ts("2024-01-05 00:00:00") &&
        col("ts") < ts("2024-01-20 00:00:00")),          // hour-aligned
      Some(col("ts") >= ts("2024-01-05 00:30:00")),       // NOT aligned
      Some(col("ts") >= ts("2024-01-03 07:00:00")))       // aligned, open top

    // fresh-seedable like the SQL/PQL fuzz suites
    val rnd = new scala.util.Random(
      sys.env.get("SPARK_GRAFT_ROLLUP_FUZZ_SEED").map(_.toLong)
        .getOrElse(20260816L))
    var fired = 0
    (1 to 60).foreach { i =>
      // 1–3 distinct keys; at most one quantum unit per ts (two units of
      // the same ts is covered by a dedicated spec — here it would just
      // shrink the sample of simpler shapes)
      val nKeys = 1 + rnd.nextInt(3)
      val keys0 = rnd.shuffle(keyPool).take(nKeys)
      val keys = {
        val (qs, plain) = keys0.partition(_._1.startsWith("q_"))
        plain ++ qs.take(1)
      }
      val aggs = rnd.shuffle(aggPool).take(1 + rnd.nextInt(3))
      val pred = predPool(rnd.nextInt(predPool.size))
      def build(): DataFrame = {
        val base = pred.map(facts.filter).getOrElse(facts)
        base.groupBy(keys.map(_._2(facts)): _*).agg(aggs.head, aggs.tail: _*)
      }
      // canonical row order: sort by every output column
      def canonical(df: DataFrame): Array[org.apache.spark.sql.Row] = {
        val cols = df.columns.map(col)
        df.orderBy(cols.map(_.asc_nulls_first).toIndexedSeq: _*).collect()
      }
      val on = build()
      if (!on.queryExecution.executedPlan.toString.contains("/fact")) fired += 1
      val got = canonical(on)
      spark.conf.set("spark.graft.indexRewrite", "false")
      val want = try canonical(build())
      finally spark.conf.unset("spark.graft.indexRewrite")
      assert(tolerantEqual(got, want),
        s"query #$i diverged: keys=${keys.map(_._1)} aggs=${aggs.size} " +
          s"pred=${pred.map(_.toString).getOrElse("none")}\n" +
          s"got=${got.take(3).mkString(";")}\nwant=${want.take(3).mkString(";")}")
    }
    info(s"fired $fired/60")
    assert(fired >= 15, s"only $fired/60 index-served — matcher regressed")
    IndexCatalog.clear()
  }
}

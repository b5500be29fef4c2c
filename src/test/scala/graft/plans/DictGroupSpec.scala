package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The collision-free dictionary-encoded grouping rewrite (r16): label
  * fidelity, null grouping, the exploded-set-column path, and the decline
  * paths. The rewrite must be bit-invisible in RESULTS — only the plan
  * (int grouping keys fed by dict_encode, labels restored by dict_decode)
  * may change. */
class DictGroupSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-dictspec-$name")
    d.toFile.deleteOnExit()
    d.toString + "/t"
  }

  private def withRule[T](f: => T): T = {
    DictGroupRewrite.install(spark)
    f
  }

  private def executed(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("dict-encoded groupBy is bit-identical to the string-keyed plan, " +
      "including null and empty-string labels") {
    val p = tmp("fidelity")
    // labels that would punish anything inexact: empty string, unicode,
    // case-only difference, a shared long prefix, and NULLs. Repeated
    // enough times that parquet keeps dictionary encoding (a tiny chunk
    // falls back to PLAIN because raw bytes undercut dict+indices — the
    // decline path, covered below).
    val labels = Seq("", "Ω-label", "case", "CASE",
      "prefix_aaaaaaaaaaaaaaaaaaaa_x", "prefix_aaaaaaaaaaaaaaaaaaaa_y",
      null.asInstanceOf[String])
    val rows = (1 to 2000).map(i => (labels(i % labels.size), i.toLong))
    spark.createDataFrame(rows).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(p)
    val df = spark.read.parquet(p)
    def q = df.groupBy("k").agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
      .orderBy(col("k").asc_nulls_first)
    val expected = {
      spark.conf.set("spark.graft.groupby.dictEncode", "false")
      try q.collect().map(_.toSeq).toSeq
      finally spark.conf.set("spark.graft.groupby.dictEncode", "true")
    }
    withRule {
      val plan = executed(q)
      // (dict_decode lives in the aggregate's RESULT expressions, which
      // HashAggregate's plan string does not render — the grouping key
      // swap is the observable)
      assert(plan.contains("dict_encode") && plan.contains("_did"),
        s"rewrite did not fire:\n$plan")
      assert(q.collect().map(_.toSeq).toSeq == expected)
    }
  }

  test("exploded set-column grouping encodes the array element leaf") {
    val p = tmp("setcol")
    val base = Seq(
      (Seq("tag_aa", "tag_bb"), 1L), (Seq("tag_bb"), 2L),
      (Seq.empty[String], 3L), (Seq("tag_aa", "tag_aa", "tag_cc"), 4L))
    spark.createDataFrame((1 to 500).flatMap(_ => base))
      .toDF("tags", "v").coalesce(1).write.mode("overwrite").parquet(p)
    val df = spark.read.parquet(p)
    def q = df.select(explode(col("tags")).as("t"), col("v"))
      .groupBy("t").agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
      .orderBy("t")
    val expected = {
      spark.conf.set("spark.graft.groupby.dictEncode", "false")
      try q.collect().map(_.toSeq).toSeq
      finally spark.conf.set("spark.graft.groupby.dictEncode", "true")
    }
    withRule {
      val plan = executed(q)
      assert(plan.contains("dict_encode"), s"rewrite did not fire:\n$plan")
      assert(q.collect().map(_.toSeq).toSeq == expected)
    }
  }

  test("declines above dictMaxValues and on derived (non-parquet) keys; " +
      "results unchanged either way") {
    val p = tmp("decline")
    spark.createDataFrame((1 to 50).map(i => (s"k$i", i.toLong)))
      .toDF("k", "v").write.mode("overwrite").parquet(p)
    val df = spark.read.parquet(p)
    withRule {
      spark.conf.set("spark.graft.groupby.dictMaxValues", "4")
      try {
        val q1 = df.groupBy("k").agg(sum("v"))
        assert(!executed(q1).contains("dict_encode"),
          "must decline when the value set exceeds dictMaxValues")
      } finally spark.conf.unset("spark.graft.groupby.dictMaxValues")
      // derived key (not a parquet column): must decline
      val q2 = df.select(concat(col("k"), lit("_x")).as("kd"), col("v"))
        .groupBy("kd").agg(sum("v"))
      assert(!executed(q2).contains("dict_encode"))
      assert(q2.count() == 50)
    }
  }

  test("aggregate arguments still see the original string column") {
    val p = tmp("aggref")
    spark.createDataFrame((1 to 999).map(i =>
        (if (i % 3 == 0) "b" else "aa", i.toLong)))
      .toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(p)
    val df = spark.read.parquet(p)
    withRule {
      // max(length(k)) references the ENCODED key inside an aggregate —
      // must be computed from the real strings, not the int codes
      val q = df.groupBy("k")
        .agg(max(length(col("k"))).as("ml"), sum("v").as("sv"))
        .orderBy("k")
      val plan = executed(q)
      assert(plan.contains("dict_encode"), s"rewrite did not fire:\n$plan")
      val aaSum = (1 to 999).filter(_ % 3 != 0).map(_.toLong).sum
      val bSum = (1 to 999).filter(_ % 3 == 0).map(_.toLong).sum
      assert(q.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .toSeq == Seq(("aa", 2, aaSum), ("b", 1, bSum)))
    }
  }

  test("GroupIndex.build over a dict-encodable fact table is unchanged") {
    val p = tmp("gidx")
    spark.createDataFrame(Seq(
      ("hs", Seq("d1", "d2"), 30L), ("ba", Seq("d1"), 40L),
      ("hs", Seq("d2"), 50L), (null.asInstanceOf[String], Seq("d1"), 60L)))
      .toDF("edu", "domain", "age").write.mode("overwrite").parquet(p)
    val df = spark.read.parquet(p)
    def rows = graft.index.GroupIndex
      .build(df, Seq("edu", "domain"), Seq("age"))
      .orderBy(col("edu").asc_nulls_first, col("domain"))
      .collect().map(_.toSeq).toSeq
    val expected = {
      spark.conf.set("spark.graft.groupby.dictEncode", "false")
      try rows
      finally spark.conf.set("spark.graft.groupby.dictEncode", "true")
    }
    assert(rows == expected)
  }

  test("minhash signature aggregation plans as HashAggregate (fixed-width " +
      "UnsafeRow buffers), not ObjectHashAggregate") {
    val docs = spark.createDataFrame(Seq(
      (1L, "a b c d e"), (2L, "b c d e f"), (3L, "x y z w q")))
      .toDF("doc_id", "text")
    val sig = graft.functions.Dedup.minhashSignatures(
      graft.functions.Dedup.shingledPosting(docs, "doc_id", "text"), 128)
    val plan = sig.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") &&
      !plan.contains("ObjectHashAggregate"),
      s"minhash_sig must use the paged UnsafeRow aggregation map:\n$plan")
  }
}

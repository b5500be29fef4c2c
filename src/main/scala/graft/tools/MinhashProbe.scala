package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Dedup
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Dedup.shingled(
      graft.core.Tables.load(spark, "/root/testdata/sf0.1", "documents"), "doc_id", "text")
    def time(label: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"[probe] $label ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    time("shingled") { docs.write.format("noop").mode("overwrite").save() }
    val posting = docs.select(col("id"), explode(col("sh")).as("s"))
    time("posting") { posting.write.format("noop").mode("overwrite").save() }
    val filtered = posting.withColumn("df", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("s"))).filter(col("df") <= 10000).drop("df")
    time("docfreq-window") { filtered.write.format("noop").mode("overwrite").save() }
    val inter = filtered.as("a").join(filtered.as("b"),
      col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("ida"), col("b.id").as("idb"))
      .agg(count(lit(1)).as("inter"))
    time("inter-join") { inter.write.format("noop").mode("overwrite").save() }
    val sigs = Dedup.minhashSignatures(docs, 128)
    time("signatures") { sigs.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Raw column-scan timings over a parquet table — separates IO/decode
  * cost per column from query-shape cost when a table-scale number moves
  * between rounds. `runMain graft.tools.ScanProbe <path> [runs]`
  *
  * Round-10 findings on the 1B able table, recorded because the negative
  * one is the useful one:
  *  - IO acquitted: the domain explode+count is ~4 s and the scalar
  *    3-string-key groupBy ~7 s; hc_groupby's ~50 s is the hash-agg
  *    PROBE on 4 string keys over ~3B post-explode rows.
  *  - int64 keys probe 1.7× faster (29 s) — but recovering the EXACT
  *    string labels costs the win back: `first(label)` aggregates have
  *    string buffers, which HashAggregate cannot hold in its mutable
  *    UnsafeRow, so Spark silently falls back to SortAggregate — a
  *    3B-row SORT (caught live: a 27-core pin for 25+ minutes at 1B;
  *    invisible at spec scale). Per-field dictionaries need their own
  *    corpus-wide distincts (~20 s) — a wash. The string-keyed
  *    HashAggregate stays; the roaring segment index (idx_serve, 0.8 s)
  *    remains the engine's precomputed answer for hot segmentations.
  *
  * Round-11 adds the variant round 10 costed but didn't run end-to-end:
  * `hc-shape-dict-amortized` groups on xxhash64 codes (HashAggregate
  * retained — no string buffers in the agg), then restores exact labels by
  * broadcast-joining per-field (code, label) dictionaries onto the
  * AGGREGATED result (combo-cardinality rows, not the corpus). The
  * dictionaries are built ONCE and persisted next to the parquet —
  * amortized like the roaring index — so the timed query pays only the
  * map-side hash + post-agg joins. `DICT build` is reported separately.
  *
  * MEASURED at 1B (2 rounds): full string-keyed 43.7-50.3 s, bare hashed
  * keys 27.5-28.9 s, dict-amortized 27.4-31.6 s (dict build 28.3 s, once).
  * So the post-agg label restore is effectively FREE (combo-cardinality
  * joins) and the variant wins ~1.6× end-to-end — round 10's "a wash" was
  * wrong because it charged the per-query plan for corpus-wide distincts
  * that amortize. NOT adopted as the engine's default grouping plan
  * anyway: (a) xxhash64 codes can collide — two labels silently merging
  * into one group is a CORRECTNESS failure the string-keyed plan cannot
  * have, and no cheap per-query guard exists; (b) the round-11
  * GroupIndex + IndexRewrite path serves the same hot shapes in ~0.6 s
  * scan-free with exact semantics, taking the use case the 1.6× was for.
  * Kept as a measured negative-adoption record. (Same r11 run:
  * `hashed-first-labels` read 27.9-29.7 s — the r10 SortAggregate pin did
  * not reproduce on this tree/box; the collision caveat, not that trap,
  * is now the standing reason against hashed grouping.) */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft-able-v5-1000000000")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.core.EngineConf(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "128")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet(path)
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SCAN $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // per-field (code, label) dictionaries, built once next to the parquet
    // (generation-time cost in a real deployment); scalar fields distinct
    // directly, the set field distincts its exploded members
    val dictRoot = s"$path-dicts"
    val scalarFields = Seq("education_level", "gender", "political_party")
    if (!new java.io.File(dictRoot, "_done").exists()) {
      timed("DICT build (amortized, once)") {
        scalarFields.foreach { f =>
          df.select(col(f).as("label")).distinct()
            .select(xxhash64(col("label")).as("code"), col("label"))
            .write.mode("overwrite").parquet(s"$dictRoot/$f")
        }
        df.select(explode(col("domain")).as("label")).distinct()
          .select(xxhash64(col("label")).as("code"), col("label"))
          .write.mode("overwrite").parquet(s"$dictRoot/domain")
        new java.io.File(dictRoot, "_done").createNewFile(): Unit
      }
    }
    for (_ <- 1 to runs) {
      timed("domain-explode-count") {
        df.select(explode(col("domain")).as("d"))
          .select(count(lit(1))).head(): Unit
      }
      timed("scalar-4col-group-count") {
        df.groupBy("education_level", "gender", "political_party")
          .agg(sum("age")).select(count(lit(1))).head(): Unit
      }
      timed("hc-shape-full") {
        df.select(col("education_level"), col("gender"),
            col("political_party"), explode(col("domain")).as("d"), col("age"))
          .groupBy("education_level", "gender", "political_party", "d")
          .agg(count(lit(1)), sum("age"))
          .select(count(lit(1))).head(): Unit
      }
      timed("hc-shape-hashed-keys") {
        df.select(xxhash64(col("education_level")).as("e"),
            xxhash64(col("gender")).as("g"),
            xxhash64(col("political_party")).as("p"),
            explode(col("domain")).as("d0"), col("age"))
          .select(col("e"), col("g"), col("p"), xxhash64(col("d0")).as("d"),
            col("age"))
          .groupBy("e", "g", "p", "d").agg(count(lit(1)), sum("age"))
          .select(count(lit(1))).head(): Unit
      }
      timed("hc-shape-dict-amortized") {
        // group on int codes (pure HashAggregate), labels restored AFTER
        // aggregation by broadcast-joining the persisted dictionaries onto
        // combo-cardinality rows
        val agg = df.select(
            xxhash64(col("education_level")).as("e"),
            xxhash64(col("gender")).as("g"),
            xxhash64(col("political_party")).as("p"),
            explode(col("domain")).as("d0"), col("age"))
          .select(col("e"), col("g"), col("p"),
            xxhash64(col("d0")).as("d"), col("age"))
          .groupBy("e", "g", "p", "d").agg(count(lit(1)).as("cnt"),
            sum("age").as("agg"))
        val restored = (scalarFields.map(f =>
            (if (f == "education_level") "e"
             else if (f == "gender") "g" else "p", f)) :+ ("d", "domain"))
          .foldLeft(agg) { case (acc, (codeCol, f)) =>
            val dict = spark.read.parquet(s"$dictRoot/$f")
              .select(col("code").as(codeCol), col("label").as(f))
            acc.join(broadcast(dict), codeCol)
          }
        restored.select("education_level", "gender", "political_party",
            "domain", "cnt", "agg")
          .select(count(lit(1))).head(): Unit
      }
      timed("hc-shape-hashed-first-labels") {
        df.select(col("education_level"), col("gender"),
            col("political_party"), explode(col("domain")).as("d0"),
            col("age"))
          .select(xxhash64(col("education_level")).as("e"),
            xxhash64(col("gender")).as("g"),
            xxhash64(col("political_party")).as("p"),
            xxhash64(col("d0")).as("d"),
            col("education_level"), col("gender"), col("political_party"),
            col("d0"), col("age"))
          .groupBy("e", "g", "p", "d")
          .agg(first("education_level"), first("gender"),
            first("political_party"), first("d0"),
            count(lit(1)), sum("age"))
          .select(count(lit(1))).head(): Unit
      }
    }
    spark.stop()
  }
}

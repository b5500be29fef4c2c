package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: hash-gated row
  * selection that is REPRODUCIBLE (same corpus + salt ⇒ same sample, on any
  * cluster size, across reruns) and PER-ROW (a pure map-side filter — no
  * shuffle, no RNG state, pushes into the scan). That is what a data-mixing
  * recipe needs: "20% of English, 10% of Spanish, 5% of the rest" must mean
  * the same documents every time the pipeline materializes.
  *
  * The gate is the engine's 48-bit polynomial hash ([[Text.FpMod]]) of
  * `key:salt`, reduced to basis points — the same arithmetic DuckDB replays
  * with `list_reduce`, so sampled outputs are oracle-checkable row-for-row
  * (`java.util.Random`/`df.sample` offer no such cross-engine replay).
  * Changing the salt draws an independent sample (held-out splits, A/B
  * mixes).
  */
object Sampling {

  /** Basis-point bucket (0..9999) of a key under a salt. */
  def hashBp(key: Column, salt: String): Column =
    pmod(Text.tokenHash(concat(key.cast("string"), lit(":" + salt))), lit(10000L))

  /** Keep rows whose hash bucket falls under `rateBp` basis points. */
  def deterministicSample(df: DataFrame, key: Column, rateBp: Int,
                          salt: String = "graft"): DataFrame = {
    require(rateBp >= 0 && rateBp <= 10000, s"rateBp out of range: $rateBp")
    df.filter(hashBp(key, salt) < rateBp)
  }

  /** Sample each stratum down to a TOKEN budget — how mixing recipes are
    * actually written ("2B tokens of web, 500M of code"). Two passes: a
    * per-stratum token total (one partial-agg pass over the corpus; the
    * totals table is strata-sized, broadcast), then the same map-side hash
    * gate at rate `budget/total` (capped at 1). Strata without a budget are
    * dropped. Deterministic: the rate is IEEE-double arithmetic on the same
    * integers in any engine, so the oracle replays the sample row-for-row. */
  def sampleToTokenBudget(df: DataFrame, key: Column, strata: Column,
                          tokenCount: Column, budgets: Map[String, Long],
                          salt: String = "graft"): DataFrame = {
    val totals = df.groupBy(strata.as("__s")).agg(sum(tokenCount).as("__tot"))
    val rate = budgets.foldLeft(lit(0.0)) { case (acc, (k, b)) =>
      when(col("__s") === k,
        least(lit(1.0), lit(b.toDouble) / col("__tot"))).otherwise(acc)
    }
    df.join(broadcast(totals), strata === col("__s"), "left")
      .filter(hashBp(key, salt).cast("double") < rate * 10000.0)
      .drop("__s", "__tot")
  }

  /** Deterministic train/val/test partitioning: EXCLUSIVE multi-way
    * assignment of every row to exactly one named split by cumulative
    * hash-bucket thresholds. Reproducible on any cluster size and across
    * reruns (the property an eval split must have — a re-materialized
    * pipeline must not leak yesterday's val docs into today's train), and
    * a pure map-side CASE over the same replayable hash as the samplers —
    * no shuffle, no RNG. Fractions are basis points and must sum to
    * exactly 10000 so assignment is total. */
  def split(df: DataFrame, key: Column, splitsBp: Seq[(String, Int)],
            salt: String = "graft"): DataFrame = {
    require(splitsBp.nonEmpty, "at least one split required")
    splitsBp.foreach { case (n, bp) =>
      require(bp > 0, s"split '$n' must get a positive share: $bp") }
    require(splitsBp.map(_._2).sum == 10000,
      s"split shares must sum to 10000 bp: ${splitsBp.map(_._2).sum}")
    val bp = hashBp(key, salt)
    val uppers = splitsBp.scanLeft(0) { case (acc, (_, share)) => acc + share }.tail
    val first = when(bp < uppers.head, lit(splitsBp.head._1))
    val assign = splitsBp.tail.zip(uppers.tail).foldLeft(first) {
      case (acc, ((name, _), hi)) => acc.when(bp < hi, lit(name))
    }
    // a NULL key hashes to NULL, making every branch false — without this
    // the row would get split=NULL and silently vanish from every
    // downstream split filter, violating the exclusive-total contract.
    // All NULL keys are the "same key", so routing them to one fixed
    // split is exactly what the hash would do for any other shared key
    df.withColumn("split", assign.otherwise(lit(splitsBp.head._1)))
  }

  /** Prime modulus for [[shuffleKey]]'s mixing rounds: 2^31-1, small
    * enough that h*h fits in int64 in ANY engine (the oracle replays the
    * arithmetic in DuckDB BIGINTs). */
  val ShuffleMod = 2147483647L

  /** Deterministic training-order shuffle key. Ordering by (this, key) is
    * a reproducible total permutation of the corpus — the "shuffle before
    * epoch 0" step — on any cluster size, replayable by an oracle; a
    * different salt redraws the permutation (epoch 1, 2, …).
    *
    * The poly-hash alone is AFFINE in its input — a salt change adds a
    * constant, which only rotates an ordering, and short keys do not even
    * wrap the 48-bit modulus — so two square-mix rounds mod 2^31-1 follow:
    * h → h(h+1) mod p is non-linear, making distinct salts genuinely
    * independent permutations. The op itself is ONE range exchange + sort,
    * exactly what a global ORDER BY costs; no RNG state, no collect. */
  def shuffleKey(key: Column, salt: String = "graft"): Column = {
    val p = lit(ShuffleMod)
    val h = pmod(Text.tokenHash(concat(key.cast("string"), lit(":" + salt))), p)
    val m1 = pmod(h * h + h, p)
    pmod(m1 * m1 + m1, p)
  }

  /** The corpus in deterministic shuffled order (see [[shuffleKey]]). */
  def deterministicShuffle(df: DataFrame, key: Column,
                           salt: String = "graft"): DataFrame =
    df.orderBy(shuffleKey(key, salt), key)

  /** C4/RefinedWeb-style per-key document cap: keep at most `cap` rows per
    * key (domain, source, site), chosen DETERMINISTICALLY — the `cap`
    * survivors are the key's rows ranked by [[shuffleKey]] (then id), so
    * reruns, cluster sizes and engines agree row-for-row, and the kept
    * subset is an unbiased draw rather than "whatever the scan saw first"
    * (ingest order over-represents a crawler's breadth-first head).
    *
    * Scale shape: the corpus NEVER takes a per-key sort. A count-aggregate
    * (map-side combined, key-cardinality-sized) finds the oversized keys;
    * the corpus left-joins that small set (AQE broadcasts it — zero corpus
    * exchange) and splits: under-cap keys pass through map-side untouched,
    * and ONLY the oversized keys' rows — bounded by the skew the cap
    * exists to remove — go through the rank window. A mega-domain still
    * ranks inside one task (the window's partition), the accepted cost of
    * an exact cap; the binomial alternative ([[stratifiedSample]] with a
    * per-key rate) caps in expectation with no window at all.
    *
    * NULL keys are never capped (no meaningful "per-key" identity; they
    * pass through like under-cap keys). */
  def capPerKey(df: DataFrame, key: Column, id: Column, cap: Int,
                salt: String = "graft"): DataFrame = {
    require(cap >= 1, s"cap must be positive: $cap")
    val cols = df.columns.toSeq
    // the temp columns below would silently shadow same-named inputs
    // (withColumn replaces; the join key would collide) — corrupt output,
    // so refuse up front. NB the input is consumed by BOTH branches of the
    // split, so the corpus is scanned twice — the exact-cap cost; the
    // binomial stratifiedSample alternative is single-pass
    Seq("__k", "__n", "__over", "__r").foreach(r =>
      require(!cols.contains(r), s"capPerKey: input column '$r' collides " +
        "with a reserved temp column"))
    val keyed = df.withColumn("__k", key)
    val over = keyed.groupBy("__k").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > cap)
      .select(col("__k"), lit(true).as("__over"))
    val marked = keyed.join(over, Seq("__k"), "left")
    val pass = marked.filter(col("__over").isNull)
      .select(cols.map(col): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k")).orderBy(shuffleKey(id, salt).asc, id.asc)
    val capped = marked.filter(col("__over") === true)
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= cap)
      .select(cols.map(col): _*)
    pass.union(capped)
  }

  /** Per-stratum rates (basis points), e.g. language-conditioned mixing.
    * Strata not in `ratesBp` fall back to `defaultBp`. One codegen'd CASE —
    * still a pure map-side filter. */
  def stratifiedSample(df: DataFrame, key: Column, strata: Column,
                       ratesBp: Map[String, Int], defaultBp: Int,
                       salt: String = "graft"): DataFrame = {
    (defaultBp +: ratesBp.values.toSeq).foreach(bp =>
      require(bp >= 0 && bp <= 10000, s"rateBp out of range: $bp"))
    val threshold = ratesBp.foldLeft(lit(defaultBp)) { case (acc, (k, bp)) =>
      when(strata === k, lit(bp)).otherwise(acc)
    }
    df.filter(hashBp(key, salt) < threshold)
  }
}

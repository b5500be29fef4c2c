package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, DateFormatClass, Explode, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, Literal, Size, TruncTimestamp}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{StringType, TimestampType}

/** Workload → index recommendations, monetizing the rollup lattice: one
  * [[graft.index.GroupIndex]] whose key set GENERALIZES a family of
  * queries serves all of them ([[IndexRewrite]] — exact match, coarser
  * quantum units by re-aggregation, key subsets by dimension rollup), so
  * the advisor clusters the workload's grouped shapes and emits ONE
  * recommendation per (fact path, explode-set) cluster: the union of
  * non-quantum keys plus, per (kind, ts) family, the single COARSEST
  * quantum unit that still covers every requested unit. The reference has
  * no analogous planning aid — its fragments exist per field
  * unconditionally; ours are opt-in materializations, so choosing WHAT to
  * materialize is an operator decision this tool automates.
  *
  * Shape analysis never reads data. Combo CARDINALITY is read at build
  * time: [[materialize]] estimates it with one `approx_count_distinct`
  * scan ([[estimateCombos]]) and refuses past
  * `spark.graft.advisor.maxCombos` — a near-unique filtered key would
  * otherwise recommend an index with ~one combo per fact row, a copy of
  * the table wearing an index's name. */
object IndexAdvisor {
  import QuantumKeys._

  /** One grouped query's index-relevant shape. `groupKeys` use the
    * reserved quantum names for date_trunc / dialect DATE_TRUNC keys.
    * `filterKeys` are the columns the query's WHERE predicates need as
    * index keys to transfer ([[IndexRewrite]] only transfers conjuncts
    * whose references are all key columns — a recommendation that ignored
    * them could never serve the query): plain columns verbatim, aligned ts
    * bounds as the quantum key of their alignment unit. */
  final case class Shape(path: String, groupKeys: Seq[String],
                         exploded: Set[String], sumCols: Set[String],
                         distinctCols: Set[String],
                         filterKeys: Set[String] = Set.empty)

  /** A global-count query's SEGMENT-index shape: `COUNT(*)` /
    * `COUNT(DISTINCT id)` under predicates over ONE column — the roaring
    * [[graft.index.Bitmap.segmentIndex]] serving shape (the reference's
    * per-(field,value) fragment bitmaps; PQL `Count(Row(f=v))` compiles to
    * exactly this). */
  final case class SegShape(path: String, segCol: String, idCol: String)

  /** Per-query verdict: its grouped shape if GroupIndex-able, else its
    * segment shape if bitmap-able, else why neither. */
  final case class Analysis(query: Int, shape: Option[Shape], note: String,
                            seg: Option[SegShape] = None)

  /** One registration that serves every query in `covers` (indices into
    * the analyzed workload). */
  final case class Recommendation(basePath: String, groupCols: Seq[String],
                                  explodedCols: Set[String],
                                  sumCols: Seq[String],
                                  distinctCols: Seq[String],
                                  covers: Seq[Int]) {
    /** Human/report rendering with the build recipe (one line — the
      * report appends per-line suffixes like the traffic share). */
    def render: String = {
      val qs = groupCols.filter(parseQuantum(_).isDefined)
      s"GroupIndex over $basePath: groupCols=${groupCols.mkString("[", ",", "]")}" +
        (if (explodedCols.nonEmpty) s" exploded=${explodedCols.mkString("[", ",", "]")}" else "") +
        s" sumCols=${sumCols.mkString("[", ",", "]")}" +
        (if (distinctCols.nonEmpty) s" distinctCols=${distinctCols.mkString("[", ",", "]")}" else "") +
        (if (qs.nonEmpty) s" quantums=${qs.mkString("[", ",", "]")}" else "") +
        s" — serves queries ${covers.mkString("#", ", #", "")}"
    }

    /** LAYOUT hint when the key set is refold-unfriendly: delta-refold
      * maintenance prunes the fact rescan by parquet row-group stats on the
      * touched key values, which only shrinks IO if the layout CLUSTERS by
      * a key. Quantum keys get that for free (facts arrive roughly
      * time-ordered); scalar keys don't unless the table is laid out by one
      * — the difference measured at 1B rows is a 1.96 s point-update refold
      * (day-quantum key, time-clustered) vs 51.4 s (scalar keys,
      * unclustered = the full rebuild-aggregation bound). */
    def layoutHint: Option[String] = {
      val qs = groupCols.filter(parseQuantum(_).isDefined)
      val scalars = groupCols.filterNot(parseQuantum(_).isDefined)
      if (qs.isEmpty && scalars.nonEmpty)
        Some(s"layout hint: no quantum key — point-mutation refolds " +
          s"rescan the full table unless the fact layout clusters by a " +
          s"key (repartitionByRange('${scalars.head}') + " +
          "sortWithinPartitions at write time makes the refold prune " +
          "row groups; 1B measured: clustered 1.96 s vs unclustered 51.4 s)")
      else None
    }
  }

  /** One [[graft.index.Bitmap.segmentIndex]] registration serving every
    * global-count query in `covers`. */
  final case class SegRecommendation(basePath: String, segCol: String,
                                     idCol: String, covers: Seq[Int]) {
    def render: String =
      s"Bitmap.segmentIndex over $basePath: segCol=$segCol idCol=$idCol" +
        s" — serves queries ${covers.mkString("#", ", #", "")}"
  }

  /** Analyze a workload and recommend the minimal covering index set:
    * GroupIndex recommendations for the grouped shapes, segment (roaring
    * bitmap) ones for the global-count shapes.
    *
    * Analysis runs with the REWRITE RULE DISABLED: advising happens on
    * live serving sessions (the `--from-log` workflow), where an
    * already-registered index would substitute the plan before the
    * advisor reads it — the advisor must see the LOGICAL workload shape,
    * not what today's indexes happen to serve. */
  def analyze(queries: Seq[DataFrame])
      : (Seq[Analysis], Seq[Recommendation], Seq[SegRecommendation]) = {
    // thread-local suppression, NOT a session-conf flip: analyze runs on
    // live serving sessions, and flipping the shared conf would turn off
    // index serving for every concurrent production query for the duration
    // (and could interleave with a concurrent build's own save/restore).
    // The optimizedPlan reads below happen on THIS thread, which is exactly
    // the suppression scope.
    val analyses = IndexRewrite.suppress(queries.zipWithIndex.map {
      case (df, i) =>
        shapeOf(df) match {
          case Right(s)  => Analysis(i, Some(s), "index-able")
          case Left(why) => segShapeOf(df) match {
            case Some(ss) => Analysis(i, None, "index-able (segment bitmap)",
              Some(ss))
            case None => Analysis(i, None, why)
          }
        }
    })
    val recs = analyses.flatMap(a => a.shape.map(a.query -> _))
      .groupBy { case (_, s) => (s.path, s.exploded) }
      .toSeq.sortBy(_._1._1)
      .map { case ((path, exploded), members) =>
        val shapes = members.map(_._2)
        // filter-needed keys join the union: they are combo-cuttable
        // dimensions (dimension rollup re-aggregates them away when a
        // query doesn't group by them), and without them the transferred
        // predicates would reference non-key columns and decline
        val (quantumKeys, plainKeys) =
          shapes.flatMap(s => s.groupKeys ++ s.filterKeys).distinct
            .partition(parseQuantum(_).isDefined)
        // per (kind, ts) family: the coarsest unit covering all requests
        val covering = quantumKeys
          .groupBy(k => parseQuantum(k).map { case (s, _, ts) => (s, ts) })
          .values.toSeq.flatMap(fam => coveringKey(fam)).sorted
        Recommendation(path, plainKeys.sorted ++ covering, exploded,
          shapes.flatMap(_.sumCols).distinct.sorted,
          shapes.flatMap(_.distinctCols).distinct.sorted,
          members.map(_._1).sorted)
      }
    val segRecs = analyses.flatMap(a => a.seg.map(a.query -> _))
      .groupBy(_._2).toSeq
      .sortBy { case (ss, _) => (ss.path, ss.segCol) }
      .map { case (ss, members) =>
        SegRecommendation(ss.path, ss.segCol, ss.idCol,
          members.map(_._1).sorted)
      }
    (analyses, recs, segRecs)
  }

  /** The recommendation's key columns materialized on the fact frame —
    * quantum cuts (either kind) derived, set keys left as arrays. */
  private def withKeyCols(spark: org.apache.spark.sql.SparkSession,
                          rec: Recommendation): DataFrame = {
    val facts = spark.read.parquet(rec.basePath)
    val parsed = rec.groupCols.flatMap(k => parseQuantum(k).map(k -> _))
    graft.index.GroupIndex.withQuantumStrs(
      graft.index.GroupIndex.withQuantums(facts,
        parsed.collect { case (_, (false, u, ts)) =>
          graft.index.GroupIndex.Quantum(ts, u) }),
      parsed.collect { case (_, (true, u, ts)) =>
        graft.index.GroupIndex.QuantumStr(ts, u) })
  }

  /** Estimated combo cardinality of a recommendation — ONE
    * `approx_count_distinct` scan over the key tuple (set keys exploded,
    * quantum keys derived), run with the rewrite suppressed. The advisor's
    * shape analysis never reads data; this DOES, so it runs at `--build`
    * time (or on operator demand), where the cost question it answers —
    * "is this index a summary or a copy?" — is about to be paid anyway. */
  def estimateCombos(spark: org.apache.spark.sql.SparkSession,
                     rec: Recommendation): Long = IndexRewrite.suppress {
    import org.apache.spark.sql.functions.{approx_count_distinct, col, explode, struct}
    val prepared = rec.groupCols.foldLeft(withKeyCols(spark, rec)) {
      (acc, c) =>
        if (rec.explodedCols(c)) acc.withColumn(c, explode(col(c))) else acc
    }
    prepared.agg(approx_count_distinct(
      struct(rec.groupCols.map(col): _*))).head().getLong(0)
  }

  /** Build + DURABLY register one recommendation — the advise→build→serve
    * loop closed in one call: quantum keys (either kind) are materialized
    * with the build-session timezone exactly as the rewrite will require
    * at serve time, the index lands at `indexPath`, and the registration
    * persists to the warehouse (when `spark.graft.warehouse` is set) so a
    * bounced process resumes serving it.
    *
    * CARDINALITY GUARD: a workload filter on a near-unique column (`WHERE
    * event_id = 7`) legitimately puts that column in the recommended key
    * set, but the resulting index has ~one combo per fact row — a copy of
    * the table wearing an index's name, all build cost and no serving
    * leverage. The build REFUSES when [[estimateCombos]] exceeds
    * `spark.graft.advisor.maxCombos` (default 50,000,000); raise the conf
    * to override deliberately. */
  def materialize(spark: org.apache.spark.sql.SparkSession,
                  rec: Recommendation, indexPath: String): Long = {
    val est = estimateCombos(spark, rec)
    val maxCombos = spark.conf
      .get("spark.graft.advisor.maxCombos", "50000000").toLong
    require(est <= maxCombos,
      s"estimated $est combos for ${rec.groupCols.mkString("[", ",", "]")} " +
        s"exceeds spark.graft.advisor.maxCombos=$maxCombos — the index " +
        "would be a near-copy of the fact table (a filtered key is likely " +
        "near-unique); drop the key or raise the conf to force the build")
    graft.index.GroupIndex.buildTo(withKeyCols(spark, rec), rec.groupCols,
      rec.sumCols, indexPath, distinctCols = rec.distinctCols)
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val parsed = rec.groupCols.flatMap(k => parseQuantum(k).map(k -> _))
    IndexRegistry.registerGroupDurable(spark, rec.basePath, rec.groupCols,
      rec.explodedCols, rec.sumCols, indexPath, rec.distinctCols,
      quantums = parsed.map { case (k, _) => k -> tz }.toMap)
    IndexRewrite.install(spark)
    est
  }

  /** [[materialize]] for a segment recommendation: roaring bitmap index
    * built and durably registered. */
  def materializeSeg(spark: org.apache.spark.sql.SparkSession,
                     rec: SegRecommendation, indexPath: String): Unit = {
    graft.index.Bitmap.segmentIndex(spark.read.parquet(rec.basePath),
        rec.segCol, rec.idCol)
      .write.mode("overwrite").parquet(indexPath)
    IndexRegistry.registerDurable(spark, rec.basePath, rec.segCol,
      rec.idCol, indexPath)
    IndexRewrite.install(spark)
  }

  /** GLOBAL count shapes → the segment-index recommendation
    * ([[IndexRewrite]]'s rewriteGlobalCount matcher mirrored): a
    * group-key-less Aggregate whose only output is `count(*)` (served by a
    * RECORD-ID index — `_id` unique per record, `reference/index.go:26`)
    * or `count(DISTINCT col)`, over a scan filtered by predicates that all
    * reference ONE column — the segment column. */
  private def segShapeOf(df: DataFrame): Option[SegShape] =
    df.queryExecution.optimizedPlan.collectFirst { case a: Aggregate => a }
      .filter(_.groupingExpressions.isEmpty).flatMap { a =>
        walk(a.child).flatMap { case (path, resolve, exploded, conds) =>
          val idCol = a.aggregateExpressions match {
            case Seq(Alias(AggregateExpression(
                Count(Seq(_: Literal)), _, false, None, _), _))
                if resolve.values.exists(_ == "_id") => Some("_id")
            case Seq(Alias(AggregateExpression(
                Count(Seq(c: AttributeReference)), _, true, None, _), _)) =>
              resolve.get(c.exprId)
            case _ => None
          }
          val condCols = conds.flatMap(_.references.toSeq).map {
            case at: AttributeReference => resolve.get(at.exprId)
            case _ => None
          }
          val segCol = condCols.distinct match {
            case Seq(Some(one)) => Some(one)
            case _ => None
          }
          for {
            id <- idCol
            seg <- segCol
            if exploded.isEmpty && conds.forall(_.deterministic)
          } yield SegShape(path, seg, id)
        }
      }

  /** Extract the grouped-scan shape from a query's optimized plan, or the
    * reason it cannot ride a GroupIndex. Mirrors [[IndexRewrite]]'s
    * matcher (attribute-only Projects, quantum aliases, Explode Generates,
    * filters, one parquet relation). */
  private def shapeOf(df: DataFrame): Either[String, Shape] = {
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val agg = df.queryExecution.optimizedPlan.collectFirst {
      case a: Aggregate => a }
    agg match {
      case None => Left("no grouped aggregate in plan")
      case Some(a) if a.groupingExpressions.isEmpty =>
        Left("global aggregate (no group keys); consider a segment index")
      case Some(a) =>
        walk(a.child) match {
          case None => Left("not a plain grouped parquet scan")
          case Some((path, resolve, exploded, conds)) =>
            val keys = a.groupingExpressions.map {
              case ar: AttributeReference => resolve.get(ar.exprId)
              case Alias(ar: AttributeReference, _) => resolve.get(ar.exprId)
              case _ => None
            }
            if (keys.exists(_.isEmpty)) Left("group key is not a column / quantum cut")
            else {
              var sums = Set.empty[String]
              var dists = Set.empty[String]
              var bad: Option[String] = None
              a.aggregateExpressions.foreach {
                case ar: AttributeReference if resolve.contains(ar.exprId) => ()
                case Alias(ar: AttributeReference, _) if resolve.contains(ar.exprId) => ()
                case Alias(AggregateExpression(Count(Seq(_: Literal)), _, false, None, _), _) => ()
                case Alias(AggregateExpression(Count(Seq(c: AttributeReference)), _, true, None, _), _) =>
                  resolve.get(c.exprId) match {
                    case Some(src) => dists += src
                    case None => bad = Some("count-distinct of a derived column")
                  }
                case Alias(AggregateExpression(f, _, false, None, _), _) =>
                  val child = f match {
                    case s: Sum => Some(s.child); case m: Min => Some(m.child)
                    case m: Max => Some(m.child); case av: Average => Some(av.child)
                    case _ => None
                  }
                  child match {
                    case Some(c: AttributeReference) if resolve.contains(c.exprId) =>
                      sums += resolve(c.exprId)
                    case _ => bad = Some(s"unsupported aggregate ${f.prettyName}")
                  }
                case other => bad = Some(s"unsupported output ${other.sql}")
              }
              bad match {
                case Some(why) => Left(why)
                case None =>
                  val gk = keys.flatten
                  filterNeeds(conds, resolve, exploded, gk, tz).map(fk =>
                    Shape(path, gk, exploded, sums, dists, fk -- gk))
              }
            }
        }
    }
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case x         => Seq(x)
  }

  /** WHERE conjuncts → the index keys they need to TRANSFER, or why they
    * never can. Mirrors [[IndexRewrite]]'s serving rules exactly —
    * recommendations the rewrite would decline are worse than none:
    *
    *  - `>=` / `<` ts bounds whose literal sits on a quantum boundary
    *    become the quantum key of that alignment unit (the covering
    *    computation then keeps the family's index unit at-or-finer, the
    *    same lattice rule as group keys — an aligned-at-day bound is
    *    aligned at hour too, so a finer index still serves it);
    *  - `>` / `<=` ts bounds split a bucket mid-way and decline at serve
    *    time no matter the index ([[IndexRewrite]]'s quantumizeBounds), so
    *    the shape is reported un-index-able rather than under-keyed;
    *  - `isnotnull(ts)` (optimizer-inferred next to any ts bound) rides
    *    whatever quantum key its ts family gets;
    *  - explode-implied guards (`isnotnull(arr)` / `size(arr) > 0` over an
    *    exploded column) are droppable at serve time — no key needed;
    *  - every other conjunct transfers iff its referenced fact columns are
    *    ALL index keys, so those columns join the recommendation (they are
    *    combo-cuttable dimensions; dimension rollup re-aggregates them
    *    away for queries that don't group by them). */
  private def filterNeeds(conds: Seq[Expression],
      resolve: Map[org.apache.spark.sql.catalyst.expressions.ExprId, String],
      exploded: Set[String], groupKeys: Seq[String], tz: String)
      : Either[String, Set[String]] = {
    // quantum KIND already requested for a ts column by the GROUP BY — a
    // dialect (__qs) workload gets a string-cut filter key so ONE family
    // covers both; default kind is the timestamp one
    val strKind: Map[String, Boolean] = groupKeys.flatMap(parseQuantum)
      .map { case (isStr, _, ts) => ts -> isStr }.toMap
    val truncUnits = Seq("year", "month", "day", "hour", "minute", "second")
    val strUnitOf = Map("year" -> "yy", "month" -> "m", "day" -> "d",
      "hour" -> "hh", "minute" -> "mi", "second" -> "s")
    def alignUnit(micros: Long): Option[String] = truncUnits.find(u =>
      TruncTimestamp(
        Literal(org.apache.spark.unsafe.types.UTF8String.fromString(u),
          StringType),
        Literal(micros, TimestampType), Some(tz)).eval(null) == micros)
    def qKey(ts: String, unit: String): String =
      if (strKind.getOrElse(ts, false)) s"__qs_${strUnitOf(unit)}_$ts"
      else s"__q_${unit}_$ts"
    def explodedCol(a: AttributeReference): Boolean =
      resolve.get(a.exprId).exists(exploded)
    var keys = Set.empty[String]
    var notNullTs = Set.empty[String]
    var bad: Option[String] = None
    def tsBound(a: AttributeReference, l: Literal, edgeSplit: Boolean): Boolean =
      a.dataType == TimestampType && l.dataType == TimestampType && {
        if (edgeSplit)
          bad = Some("edge-splitting ts bound (> / <=) can never transfer " +
            "to a quantum key — rewrite the range as >= / <")
        else (resolve.get(a.exprId),
            Option(l.value).collect { case x: java.lang.Long => x.longValue }) match {
          case (Some(ts), Some(micros)) => alignUnit(micros) match {
            case Some(u) => keys += qKey(ts, u)
            case None => bad = Some("ts bound is not on any quantum " +
              "boundary (sub-second) — it bounds rows, not buckets")
          }
          case _ => bad = Some("ts bound on a derived column")
        }
        true
      }
    def generic(c: Expression): Unit = {
      val refs = c.references.toSeq
      val srcs = refs.map {
        case a: AttributeReference => resolve.get(a.exprId)
        case _ => None
      }
      if (srcs.exists(_.isEmpty))
        bad = Some("filter references a derived column — the predicate " +
          "cannot transfer to index keys")
      else keys ++= srcs.flatten
    }
    conds.foreach {
      case _ if bad.isDefined => ()
      case IsNotNull(a: AttributeReference) if explodedCol(a) => ()
      case GreaterThan(Size(a: AttributeReference, _), Literal(v, _))
          if explodedCol(a) && v == 0 => ()
      case c @ GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        if (!tsBound(a, l, edgeSplit = false)) generic(c)
      case c @ LessThanOrEqual(l: Literal, a: AttributeReference) =>
        if (!tsBound(a, l, edgeSplit = false)) generic(c)
      case c @ LessThan(a: AttributeReference, l: Literal) =>
        if (!tsBound(a, l, edgeSplit = false)) generic(c)
      case c @ GreaterThan(l: Literal, a: AttributeReference) =>
        if (!tsBound(a, l, edgeSplit = false)) generic(c)
      case c @ GreaterThan(a: AttributeReference, l: Literal) =>
        if (!tsBound(a, l, edgeSplit = true)) generic(c)
      case c @ LessThan(l: Literal, a: AttributeReference) =>
        if (!tsBound(a, l, edgeSplit = true)) generic(c)
      case c @ LessThanOrEqual(a: AttributeReference, l: Literal) =>
        if (!tsBound(a, l, edgeSplit = true)) generic(c)
      case c @ GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        if (!tsBound(a, l, edgeSplit = true)) generic(c)
      case IsNotNull(a: AttributeReference)
          if a.dataType == TimestampType && resolve.contains(a.exprId) =>
        notNullTs += resolve(a.exprId)
      case other => generic(other)
    }
    // isnotnull(ts) transfers as isnotnull on the ts's quantum key when the
    // family has one (group key or bound); a lone isnotnull(ts) needs the
    // raw column — legal, but cardinality-hostile, so it is keyed plainly
    // and visible in the report
    notNullTs.foreach { ts =>
      if (!(groupKeys ++ keys).exists(k =>
          parseQuantum(k).exists(_._3 == ts)))
        keys += ts
    }
    bad.toLeft(keys)
  }

  /** Child walk → (path, exprId→key-name resolution, exploded fact cols,
    * WHERE conjuncts collected along the way — classified by
    * [[filterNeeds]]). */
  private def walk(p: LogicalPlan)
      : Option[(String, Map[org.apache.spark.sql.catalyst.expressions.ExprId, String], Set[String], Seq[Expression])] =
    p match {
      case Project(projList, child) =>
        walk(child).flatMap { case (path, resolve, ex, cs) =>
          val extra = projList.flatMap {
            case _: AttributeReference => Some(Nil)
            case al @ Alias(a: AttributeReference, _) =>
              Some(resolve.get(a.exprId).map(al.exprId -> _).toList)
            case al @ Alias(TruncTimestamp(Literal(u, StringType),
                a: AttributeReference, _), _) =>
              Some(resolve.get(a.exprId).map(ts =>
                al.exprId -> s"__q_${u.toString.toLowerCase}_$ts").toList)
            case al @ Alias(DateFormatClass(a: AttributeReference,
                Literal(pat, StringType), _), _) =>
              graft.index.GroupIndex.strPatterns.find(_._2 == pat.toString)
                .flatMap { case (unit, _) => resolve.get(a.exprId).map(ts =>
                  List(al.exprId -> s"__qs_${unit}_$ts")) }
            case _ => None
          }
          if (extra.length != projList.length) None
          else Some((path, resolve ++ extra.flatten, ex, cs))
        }
      case Generate(Explode(arr: AttributeReference), _, false, _, Seq(out), child) =>
        walk(child).flatMap { case (path, resolve, ex, cs) =>
          resolve.get(arr.exprId).map(src =>
            (path, resolve + (out.exprId -> src), ex + src, cs))
        }
      case Filter(cond, child) =>
        walk(child).map { case (path, resolve, ex, cs) =>
          (path, resolve, ex, cs ++ splitConj(cond))
        }
      case LogicalRelation(fs: HadoopFsRelation, out, _, _, _) =>
        fs.location.rootPaths.headOption.map(rp =>
          (rp.toString, out.map(a => a.exprId -> a.name).toMap,
            Set.empty[String], Seq.empty[Expression]))
      case _ => None
    }
}

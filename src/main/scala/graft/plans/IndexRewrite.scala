package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, AttributeSet, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.index.BitmapCardinality

/** Index-serving rewrite (SURVEY §7.2 step 8, §4.1
  * `tryToReplaceGroupByWithPQLGroupBy`): the reference answers
  * "count of records per segment" from stored per-(field,value) roaring
  * bitmaps instead of scanning the fact table (`reference/executor.go:3176`,
  * fragments `reference/fragment.go:83`). The Spark-native equivalent is an
  * optimizer [[Rule]]:
  *
  * {{{ SELECT seg, count(DISTINCT id) FROM fact GROUP BY seg }}}
  *
  * over a fact table with a registered segment index (built by
  * [[graft.index.Bitmap.segmentIndex]], stored as a (seg, bm) table) becomes
  * a scan of the index table + [[BitmapCardinality]] — fact-table scan and
  * distinct shuffle both disappear. At 100 TB that turns a
  * count-distinct over billions of rows into reading a few thousand
  * pre-aggregated bitmap rows: the reference's headline capability.
  *
  * Install per-session via [[IndexRewrite.install]] (or cluster-wide with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`); register
  * indexes with [[IndexCatalog.register]].
  */
object IndexCatalog {
  final case class Entry(segCol: String, idCol: String, indexPlan: LogicalPlan)

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), Entry]

  /** Register a materialized segment index for a parquet-backed fact table.
    * `basePath` is the fact table's parquet location; `index` must be the
    * materialized (seg, bm) table (read back from storage — registering a
    * non-materialized plan would re-derive the index per query). */
  def register(basePath: String, segCol: String, idCol: String, index: DataFrame): Unit =
    entries.put((normalize(basePath), segCol, idCol),
      Entry(segCol, idCol, index.queryExecution.optimizedPlan))

  def lookup(paths: Seq[String], segCol: String, idCol: String): Option[Entry] =
    paths.headOption.flatMap(p =>
      Option(entries.get((normalize(p), segCol, idCol))))

  def clear(): Unit = entries.clear()

  private def normalize(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")
}

/** The rewrite rule. Matches
  * `Aggregate([segAttr], [segAttr?, count(DISTINCT idAttr)…], scan(fact))`
  * where scan is an unfiltered (possibly column-pruned) parquet relation with
  * a registered index, and replaces it with
  * `Project([seg, bitmap_cardinality(bm)], indexPlan)`, preserving output
  * exprIds so parent operators (Sort/Project/…) are untouched. */
case class IndexRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Seq(groupExpr), aggExprs, child, _)
        if groupAttr(groupExpr).isDefined =>
      val g = groupAttr(groupExpr).get
      val target = distinctCountTarget(aggExprs, g).map(_.name)
        // plain count(*) per segment: valid against a RECORD-ID index —
        // `_id` is unique per record (the FB data model invariant,
        // `reference/index.go:26`), so per-seg cardinality = row count
        .orElse(if (rowCountShape(aggExprs, Some(g))) Some("_id") else None)
      (scanWithSegFilter(child, g), target) match {
        case (Some((paths, segConds)), Some(idName)) =>
          IndexCatalog.lookup(paths, g.name, idName) match {
            case Some(entry) => substitute(agg, g, segConds, entry).getOrElse(agg)
            case None        => agg
          }
        case _ => agg
      }
    // GLOBAL seg-filtered count — the reference's `Count(Row(seg=v))` /
    // `Count(Union(Row…))` answered from stored fragments
    // (`reference/executor.go:5839,5382`): OR the matching index bitmaps,
    // read one cardinality; no fact-table scan. count(DISTINCT id) against
    // its index; plain count(*) against a record-id (`_id`) index.
    case agg @ Aggregate(Nil, aggExprs, child, _) =>
      val target = globalDistinctTarget(aggExprs).map(_.name)
        .orElse(if (rowCountShape(aggExprs, None)) Some("_id") else None)
      (globalSegFilterScan(child), target) match {
        case (Some((paths, segAttrRef, segConds)), Some(idName)) =>
          IndexCatalog.lookup(paths, segAttrRef.name, idName) match {
            case Some(entry) =>
              substituteGlobal(agg, segAttrRef, segConds, entry).getOrElse(agg)
            case None => agg
          }
        case _ => agg
      }
  }

  /** All (non-group) agg expressions are plain `count(1)`/`count(*)` —
    * non-distinct Count over a literal. */
  private def rowCountShape(aggExprs: Seq[NamedExpression],
      g: Option[Attribute]): Boolean = {
    val nonGroup = aggExprs.filter {
      case a: AttributeReference => !g.exists(_.exprId == a.exprId)
      case Alias(a: AttributeReference, _) => !g.exists(_.exprId == a.exprId)
      case _ => true
    }
    nonGroup.nonEmpty && nonGroup.forall {
      case Alias(AggregateExpression(
        Count(Seq(_: org.apache.spark.sql.catalyst.expressions.Literal)),
        _, false, None, _), _) => true
      case _ => false
    }
  }

  private def groupAttr(e: Expression): Option[Attribute] = e match {
    case a: AttributeReference => Some(a)
    case Alias(a: AttributeReference, _) => Some(a)
    case _ => None
  }

  /** A predicate may move from the fact table onto the index table only if
    * re-evaluating it once per index row instead of once per fact row cannot
    * change its value: it must be deterministic (`seg = 'a' OR rand() < 0.5`
    * references only seg yet is per-row random) and subquery-free (a
    * [[org.apache.spark.sql.catalyst.expressions.PlanExpression]] would be
    * re-planned against the wrong child). */
  private def transferable(cond: Expression): Boolean =
    cond.deterministic &&
      cond.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]).isEmpty

  /** Child must be a (column-pruned) parquet scan: Project of plain
    * attributes over a LogicalRelation, optionally filtered on the SEGMENT
    * column only — such predicates transfer onto the index table's `seg`
    * column (each index row summarizes exactly one segment value, so
    * seg-filtered counts are still answerable without the fact table). Any
    * predicate touching other columns disqualifies. Returns the relation's
    * root paths plus the seg-only predicates. */
  private def scanWithSegFilter(p: LogicalPlan, g: Attribute): Option[(Seq[String], Seq[Expression])] = p match {
    case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      scanWithSegFilter(child, g)
    case Filter(cond, child) if cond.references.subsetOf(AttributeSet(Seq(g))) &&
        transferable(cond) =>
      scanWithSegFilter(child, g).map { case (paths, conds) => (paths, cond +: conds) }
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      Some((fs.location.rootPaths.map(_.toString), Nil))
    case _ => None
  }

  /** All agg expressions must be the group attr (possibly aliased) or
    * `count(DISTINCT idAttr)`; returns the single id attribute counted. */
  private def distinctCountTarget(aggExprs: Seq[NamedExpression],
      g: Attribute): Option[AttributeReference] = {
    val ids = aggExprs.flatMap {
      case a: AttributeReference if a.exprId == g.exprId => Nil
      case Alias(a: AttributeReference, _) if a.exprId == g.exprId => Nil
      case Alias(AggregateExpression(Count(Seq(id: AttributeReference)), _, true, None, _), _) =>
        Seq(Some(id))
      case _ => Seq(None)
    }
    if (ids.nonEmpty && ids.forall(_.isDefined) && ids.flatten.distinct.length == 1)
      ids.head
    else None
  }

  /** Global case: the scan must carry at least one filter, every predicate
    * referencing exactly one attribute — the segment column the index is
    * keyed on. (Unfiltered global distinct is deliberately not rewritten:
    * picking an index would be ambiguous, and a full-table distinct is a
    * scan-shaped query anyway.) */
  private def globalSegFilterScan(p: LogicalPlan)
      : Option[(Seq[String], AttributeReference, Seq[Expression])] = {
    def walk(p: LogicalPlan, conds: Seq[Expression])
        : Option[(Seq[String], Seq[Expression])] = p match {
      case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
        walk(child, conds)
      case Filter(cond, child) if transferable(cond) => walk(child, cond +: conds)
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        Some((fs.location.rootPaths.map(_.toString), conds))
      case _ => None
    }
    walk(p, Nil).flatMap { case (paths, conds) =>
      val refs = conds.flatMap(_.references.toSeq).distinct
      (conds, refs) match {
        case (c, Seq(seg: AttributeReference)) if c.nonEmpty =>
          Some((paths, seg, conds))
        case _ => None
      }
    }
  }

  /** All agg expressions must be `count(DISTINCT id)` of one id attr. */
  private def globalDistinctTarget(aggExprs: Seq[NamedExpression])
      : Option[AttributeReference] = {
    val ids = aggExprs.map {
      case Alias(AggregateExpression(Count(Seq(id: AttributeReference)), _, true, None, _), _) =>
        Some(id)
      case _ => None
    }
    if (ids.nonEmpty && ids.forall(_.isDefined) && ids.flatten.distinct.length == 1)
      ids.head
    else None
  }

  private def substituteGlobal(agg: Aggregate, seg: AttributeReference,
      segConds: Seq[Expression], entry: IndexCatalog.Entry): Option[LogicalPlan] = {
    val idxOut = entry.indexPlan.output
    for {
      segAttr <- idxOut.find(_.name == "seg")
      bmAttr  <- idxOut.find(_.name == "bm")
      if segAttr.dataType == seg.dataType
    } yield {
      val cond = segConds.reduce(And).transform {
        case a: AttributeReference if a.exprId == seg.exprId => segAttr
      }
      val orAgg = AggregateExpression(
        graft.index.BitmapOrAgg(bmAttr),
        org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
        isDistinct = false)
      val projList = agg.aggregateExpressions.map {
        case al @ Alias(AggregateExpression(Count(_), _, _, _, _), name) =>
          Alias(BitmapCardinality(orAgg), name)(exprId = al.exprId)
        case other => other
      }
      Aggregate(Nil, projList, Filter(cond, entry.indexPlan))
    }
  }

  private def substitute(agg: Aggregate, g: Attribute, segConds: Seq[Expression],
      entry: IndexCatalog.Entry): Option[LogicalPlan] = {
    val idxOut = entry.indexPlan.output
    for {
      segAttr <- idxOut.find(_.name == "seg")
      bmAttr  <- idxOut.find(_.name == "bm")
      if segAttr.dataType == g.dataType
    } yield {
      val projList = agg.aggregateExpressions.map {
        case a: AttributeReference if a.exprId == g.exprId =>
          Alias(segAttr, a.name)(exprId = a.exprId)
        case al @ Alias(a: AttributeReference, name) if a.exprId == g.exprId =>
          Alias(segAttr, name)(exprId = al.exprId)
        case al @ Alias(AggregateExpression(Count(_), _, _, _, _), name) =>
          Alias(BitmapCardinality(bmAttr), name)(exprId = al.exprId)
        case other => other
      }
      // seg-value predicates transfer onto the index scan (physical planning
      // pushes them into the index parquet's PushedFilters)
      val source = segConds.reduceOption(And) match {
        case Some(cond) =>
          val onSeg = cond.transform {
            case a: AttributeReference if a.exprId == g.exprId => segAttr
          }
          Filter(onSeg, entry.indexPlan)
        case None => entry.indexPlan
      }
      Project(projList, source)
    }
  }
}

object IndexRewrite {
  /** Install the rule into an existing session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val already = spark.experimental.extraOptimizations.exists {
      case IndexRewrite(_) => true
      case _               => false
    }
    if (!already)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ IndexRewrite(spark)
  }
}

/** SQL names for the native bitmap expressions:
  * `bitmap_cardinality(bm)`, `bitmap_and_cardinality(a,b)`,
  * `bitmap_or_cardinality(a,b)`. */
object BitmapFunctions {
  import graft.index.{BitmapAndCardinality, BitmapAndNotCardinality, BitmapOrCardinality, BitmapXorCardinality}
  def register(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    fr.createOrReplaceTempFunction("bitmap_cardinality",
      es => BitmapCardinality(es.head), "built-in")
    fr.createOrReplaceTempFunction("bitmap_and_cardinality",
      es => BitmapAndCardinality(es(0), es(1)), "built-in")
    fr.createOrReplaceTempFunction("bitmap_or_cardinality",
      es => BitmapOrCardinality(es(0), es(1)), "built-in")
    // PQL Difference/Xor served from the index (`executor.go` difference/xor
    // over row bitmaps)
    fr.createOrReplaceTempFunction("bitmap_andnot_cardinality",
      es => BitmapAndNotCardinality(es(0), es(1)), "built-in")
    fr.createOrReplaceTempFunction("bitmap_xor_cardinality",
      es => BitmapXorCardinality(es(0), es(1)), "built-in")
    fr.createOrReplaceTempFunction("bitmap_build",
      es => graft.index.BitmapBuildAgg(es.head), "built-in")
    fr.createOrReplaceTempFunction("bitmap_or_agg",
      es => graft.index.BitmapOrAgg(es.head), "built-in")
  }
}

/** `--conf spark.sql.extensions=graft.plans.GraftExtensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(IndexRewrite(_))
}

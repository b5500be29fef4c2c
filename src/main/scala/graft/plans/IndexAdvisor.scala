package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, DateFormatClass, Explode, Literal, TruncTimestamp}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.StringType

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
  * Advisory only: it never reads data, so it cannot see combo
  * cardinality — the report carries key counts and the caller sanity-
  * checks against the table's value distributions. */
object IndexAdvisor {
  import QuantumKeys._

  /** One grouped query's index-relevant shape. `groupKeys` use the
    * reserved quantum names for date_trunc / dialect DATE_TRUNC keys. */
  final case class Shape(path: String, groupKeys: Seq[String],
                         exploded: Set[String], sumCols: Set[String],
                         distinctCols: Set[String])

  /** Per-query verdict: its shape if index-able, else why not. */
  final case class Analysis(query: Int, shape: Option[Shape], note: String)

  /** One registration that serves every query in `covers` (indices into
    * the analyzed workload). */
  final case class Recommendation(basePath: String, groupCols: Seq[String],
                                  explodedCols: Set[String],
                                  sumCols: Seq[String],
                                  distinctCols: Seq[String],
                                  covers: Seq[Int]) {
    /** Human/report rendering with the build recipe. */
    def render: String = {
      val qs = groupCols.filter(parseQuantum(_).isDefined)
      s"GroupIndex over $basePath: groupCols=${groupCols.mkString("[", ",", "]")}" +
        (if (explodedCols.nonEmpty) s" exploded=${explodedCols.mkString("[", ",", "]")}" else "") +
        s" sumCols=${sumCols.mkString("[", ",", "]")}" +
        (if (distinctCols.nonEmpty) s" distinctCols=${distinctCols.mkString("[", ",", "]")}" else "") +
        (if (qs.nonEmpty) s" quantums=${qs.mkString("[", ",", "]")}" else "") +
        s" — serves queries ${covers.mkString("#", ", #", "")}"
    }
  }

  /** Analyze a workload and recommend the minimal covering index set. */
  def analyze(queries: Seq[DataFrame]): (Seq[Analysis], Seq[Recommendation]) = {
    val analyses = queries.zipWithIndex.map { case (df, i) =>
      shapeOf(df) match {
        case Right(s)  => Analysis(i, Some(s), "index-able")
        case Left(why) => Analysis(i, None, why)
      }
    }
    val recs = analyses.flatMap(a => a.shape.map(a.query -> _))
      .groupBy { case (_, s) => (s.path, s.exploded) }
      .toSeq.sortBy(_._1._1)
      .map { case ((path, exploded), members) =>
        val shapes = members.map(_._2)
        val (quantumKeys, plainKeys) = shapes.flatMap(_.groupKeys).distinct
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
    (analyses, recs)
  }

  /** Extract the grouped-scan shape from a query's optimized plan, or the
    * reason it cannot ride a GroupIndex. Mirrors [[IndexRewrite]]'s
    * matcher (attribute-only Projects, quantum aliases, Explode Generates,
    * filters, one parquet relation). */
  private def shapeOf(df: DataFrame): Either[String, Shape] = {
    val agg = df.queryExecution.optimizedPlan.collectFirst {
      case a: Aggregate => a }
    agg match {
      case None => Left("no grouped aggregate in plan")
      case Some(a) if a.groupingExpressions.isEmpty =>
        Left("global aggregate (no group keys); consider a segment index")
      case Some(a) =>
        walk(a.child) match {
          case None => Left("not a plain grouped parquet scan")
          case Some((path, resolve, exploded)) =>
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
              bad.toLeft(Shape(path, keys.flatten, exploded, sums, dists))
            }
        }
    }
  }

  /** Child walk → (path, exprId→key-name resolution, exploded fact cols). */
  private def walk(p: LogicalPlan)
      : Option[(String, Map[org.apache.spark.sql.catalyst.expressions.ExprId, String], Set[String])] =
    p match {
      case Project(projList, child) =>
        walk(child).flatMap { case (path, resolve, ex) =>
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
          else Some((path, resolve ++ extra.flatten, ex))
        }
      case Generate(Explode(arr: AttributeReference), _, false, _, Seq(out), child) =>
        walk(child).flatMap { case (path, resolve, ex) =>
          resolve.get(arr.exprId).map(src =>
            (path, resolve + (out.exprId -> src), ex + src))
        }
      case Filter(_, child) => walk(child)
      case LogicalRelation(fs: HadoopFsRelation, out, _, _, _) =>
        fs.location.rootPaths.headOption.map(rp =>
          (rp.toString, out.map(a => a.exprId -> a.name).toMap,
            Set.empty[String]))
      case _ => None
    }
}

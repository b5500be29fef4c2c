package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, ExprId, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** COLLISION-FREE dictionary-encoded grouping (r15 VERDICT item 3).
  *
  * The engine's largest raw-path cost at 1B rows is the 4-string-key
  * HashAggregate over ~3B post-explode rows (the able `hc` GroupBy, and
  * the same aggregation inside GroupIndex builds/refolds): ScanProbe
  * measured the string-keyed aggregation at 43.7–50.3 s vs 27.5–28.9 s
  * for identical grouping on 8-byte hashed keys — but xxhash64 codes can
  * COLLIDE, silently merging two labels into one group, so the hashed
  * variant was rejected twice (r10/r11, recorded in ScanProbe's header).
  *
  * This rule takes the same ~1.6× with exact semantics: group on EXACT
  * per-column dictionary ids instead of hashes. The dictionary is not
  * built with a corpus scan — it is read from the parquet files' OWN
  * dictionary pages (guide §6: the footer metadata already stores every
  * distinct value of a dictionary-encoded column chunk). Soundness:
  * the rewrite fires ONLY when every data page of every chunk of the
  * column is dictionary-encoded (parquet EncodingStats — a column that
  * overflowed its dictionary falls back to PLAIN pages and is declined),
  * so the union of dictionary pages provably contains every value in the
  * column and an encode miss is impossible (it would throw, never
  * mis-group). decode(encode(x)) is byte-exact for every value incl.
  * null (null ids propagate as null, preserving null-grouping), so
  * results are bit-identical to the string-keyed plan.
  *
  * Shape: `Aggregate(ks, res, child)` where a grouping key is a
  * StringType attribute traceable through Project/Filter/Generate(explode)
  * to a parquet column becomes
  * `Aggregate(ids, res', Project(child.* + dict_encode(k) as id, child))`
  * with every grouping-bound use of `k` in `res` replaced by
  * `dict_decode(id)`. Aggregate-function arguments still see the original
  * columns (the Project keeps them), grouping/shuffle/agg-map keys become
  * fixed-width ints, and output attribute ids/names/types are unchanged
  * so parents (HAVING filters, sorts) are untouched.
  *
  * Ordering: installed AFTER [[IndexRewrite]] in the same batch, so an
  * index-served aggregation is substituted before this rule ever sees it;
  * this rule carries the raw path (no index registered, index declined,
  * and the index-BUILD/refold aggregations themselves).
  */
case class DictGroupRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def conf(key: String, dflt: String): String =
    spark.conf.get(key, dflt)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf("spark.graft.groupby.dictEncode", "true") != "true") plan
    else plan.transform {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }
  }

  private def tryRewrite(agg: Aggregate): Option[Aggregate] = {
    // every grouping expression must be a bare attribute (the shape the
    // PQL/SQL surfaces and GroupIndex.build all produce after analysis)
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (groupAttrs.isEmpty) return None
    val maxValues =
      conf("spark.graft.groupby.dictMaxValues", "262144").toInt
    // encodable: string-typed keys that trace to a fully-dictionary-encoded
    // parquet column (directly or as an exploded array element)
    val encoded: Map[ExprId, (AttributeReference, Alias)] = groupAttrs
      .filter(_.dataType == StringType)
      .flatMap { a =>
        traceToParquet(a, agg.child).flatMap { case (rel, leaf) =>
          ParquetDicts.forColumn(spark, rel, leaf, maxValues).map { dict =>
            a.exprId -> (a, Alias(DictEncode(a, dict),
              a.name + "_did")())
          }
        }
      }.toMap
    if (encoded.isEmpty) return None
    val newChild = Project(
      (agg.child.output: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression])
        ++ encoded.values.map(_._2), agg.child)
    val newGrouping: Seq[Expression] = groupAttrs.map(a =>
      encoded.get(a.exprId).map(_._2.toAttribute).getOrElse(a))
    def dictOf(a: AttributeReference): DictTable =
      encoded(a.exprId)._2.child.asInstanceOf[DictEncode].dict
    // replace grouping-bound references to an encoded key with
    // dict_decode(id); leave AggregateExpression subtrees whole — their
    // arguments evaluate against input rows, where the Project still
    // carries the original string columns
    def fix(e: Expression): Expression = e match {
      case ae: AggregateExpression => ae
      case a: AttributeReference if encoded.contains(a.exprId) =>
        DictDecode(encoded(a.exprId)._2.toAttribute, dictOf(a))
      case other => other.mapChildren(fix)
    }
    val newResult = agg.aggregateExpressions.map {
      case a: AttributeReference if encoded.contains(a.exprId) =>
        Alias(DictDecode(encoded(a.exprId)._2.toAttribute, dictOf(a)),
          a.name)(exprId = a.exprId, qualifier = a.qualifier,
          explicitMetadata = Some(a.metadata))
      case al: Alias =>
        Alias(fix(al.child), al.name)(exprId = al.exprId,
          qualifier = al.qualifier,
          explicitMetadata = al.explicitMetadata,
          nonInheritableMetadataKeys = al.nonInheritableMetadataKeys)
      case other => other
    }
    Some(Aggregate(newGrouping, newResult, newChild))
  }

  /** Trace `attr` through Project aliases, Filters and Generate(explode)
    * to a parquet relation column; returns the relation and the parquet
    * LEAF path (`Seq(col)` for a scalar, `Seq(col, "list", "element")`
    * for an exploded array element). Any other node declines. */
  private def traceToParquet(attr: Attribute, plan: LogicalPlan)
      : Option[(HadoopFsRelation, Seq[String])] = plan match {
    case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] &&
        l.output.exists(_.exprId == attr.exprId) =>
      val rel = l.relation.asInstanceOf[HadoopFsRelation]
      val name = l.output.find(_.exprId == attr.exprId).get.name
      rel.dataSchema.find(_.name == name) match {
        case Some(f) if f.dataType == StringType => Some((rel, Seq(name)))
        case _ => None
      }
    case f: Filter => traceToParquet(attr, f.child)
    case p: Project =>
      p.projectList.find(_.exprId == attr.exprId) match {
        case Some(a: AttributeReference) => traceToParquet(a, p.child)
        case Some(Alias(a: AttributeReference, _)) =>
          traceToParquet(a, p.child)
        case _ => None
      }
    case g: Generate =>
      if (g.generatorOutput.exists(_.exprId == attr.exprId)) {
        // the exploded element: trace the ARRAY column to its relation
        g.generator match {
          case org.apache.spark.sql.catalyst.expressions.Explode(
              arr: AttributeReference) =>
            traceArray(arr, g.child)
          case _ => None
        }
      } else traceToParquet(attr, g.child) // pass-through column
    case _ => None
  }

  /** Trace an ARRAY-of-string attribute to its parquet relation; the leaf
    * is the standard 3-level list element path. */
  private def traceArray(attr: Attribute, plan: LogicalPlan)
      : Option[(HadoopFsRelation, Seq[String])] = plan match {
    case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] &&
        l.output.exists(_.exprId == attr.exprId) =>
      val rel = l.relation.asInstanceOf[HadoopFsRelation]
      val name = l.output.find(_.exprId == attr.exprId).get.name
      rel.dataSchema.find(_.name == name) match {
        case Some(f) if f.dataType.isInstanceOf[ArrayType] &&
            f.dataType.asInstanceOf[ArrayType].elementType == StringType =>
          Some((rel, Seq(name, "list", "element")))
        case _ => None
      }
    case f: Filter => traceArray(attr, f.child)
    case p: Project =>
      p.projectList.find(_.exprId == attr.exprId) match {
        case Some(a: AttributeReference) => traceArray(a, p.child)
        case Some(Alias(a: AttributeReference, _)) => traceArray(a, p.child)
        case _ => None
      }
    case g: Generate if !g.generatorOutput.exists(_.exprId == attr.exprId) =>
      traceArray(attr, g.child)
    case _ => None
  }
}

object DictGroupRewrite {
  /** Install into an existing session (idempotent), always AFTER any
    * installed [[IndexRewrite]] — index substitution must get first shot
    * at an aggregation in each optimizer pass. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[DictGroupRewrite]))
      spark.experimental.extraOptimizations = cur :+ DictGroupRewrite(spark)
  }
}

/** An exact (code, label) dictionary: labels sorted in binary order, ids
  * are positions. Ships to executors inside the serialized plan; the
  * lookup table rebuilds lazily per JVM. */
final class DictTable(val labels: Array[UTF8String]) extends Serializable {
  @transient private lazy val map: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](labels.length * 2)
    var i = 0
    while (i < labels.length) { m.put(labels(i), Integer.valueOf(i)); i += 1 }
    m
  }
  def lookup(s: UTF8String): Int = {
    val v = map.get(s)
    if (v == null)
      // structurally impossible when EncodingStats gated the rewrite; a
      // miss means the files changed under the plan — fail loud, never
      // mis-group
      throw new IllegalStateException(
        s"dict-encoded grouping: value not in parquet dictionary: $s")
    v.intValue()
  }
  def label(i: Int): UTF8String = labels(i)
  override def toString: String = s"dict(${labels.length})"
}

/** `dict_encode(col)` — exact dictionary id of a string (null → null). */
case class DictEncode(child: Expression, dict: DictTable)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "dict_encode"
  override protected def nullSafeEval(s: Any): Any =
    dict.lookup(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dict", dict, classOf[DictTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.lookup($c)")
  }
  override protected def withNewChildInternal(c: Expression): DictEncode =
    copy(child = c)
}

/** `dict_decode(id)` — the exact label bytes back (null → null). */
case class DictDecode(child: Expression, dict: DictTable)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "dict_decode"
  override protected def nullSafeEval(i: Any): Any =
    dict.label(i.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dict", dict, classOf[DictTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.label($c)")
  }
  override protected def withNewChildInternal(c: Expression): DictDecode =
    copy(child = c)
}

/** Reads a column's EXACT value set out of parquet dictionary pages.
  * Session-lifetime memo keyed on the file listing (path, size, mtime) —
  * the same identity Spark's own FileIndex cache keys on — so a bench's
  * repeated runs pay the footer reads once; any file change misses. */
object ParquetDicts {
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Option[DictTable]]()

  private[graft] def clearMemo(): Unit = memo.clear()

  def forColumn(spark: SparkSession, rel: HadoopFsRelation,
                leaf: Seq[String], maxValues: Int): Option[DictTable] = {
    if (!rel.fileFormat.isInstanceOf[
        org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])
      return None
    val files = rel.location.listFiles(Nil, Nil).flatMap(_.files)
    if (files.isEmpty) return Some(new DictTable(Array.empty))
    val key = leaf.mkString(".") + "#" + files.map(f =>
      s"${f.getPath}:${f.getLen}:${f.getModificationTime}")
      .sorted.mkString(";")
    memo.computeIfAbsent(key, _ =>
      readDict(spark, files.map(_.getPath.toString), leaf, maxValues))
  }

  /** Internal "this column can't be dict-encoded" signal. */
  private object Decline extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private def readDict(spark: SparkSession, paths: Seq[String],
                       leaf: Seq[String], maxValues: Int)
      : Option[DictTable] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val hconf = spark.sessionState.newHadoopConf()
    val colPath = org.apache.parquet.hadoop.metadata.ColumnPath
      .get(leaf: _*)
    def fileValues(p: String): Seq[UTF8String] = {
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(p), hconf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        val desc = schema.getColumns.asScala
          .find(_.getPath.toSeq == leaf).getOrElse(throw Decline)
        if (desc.getPrimitiveType.getPrimitiveTypeName !=
            org.apache.parquet.schema.PrimitiveType
              .PrimitiveTypeName.BINARY) throw Decline
        val out = scala.collection.mutable.ArrayBuffer[UTF8String]()
        reader.getFooter.getBlocks.asScala.foreach { block =>
          val cc = block.getColumns.asScala
            .find(_.getPath == colPath).getOrElse(throw Decline)
          val stats = cc.getStatistics
          val allNull = stats != null && stats.isNumNullsSet &&
            stats.getNumNulls == cc.getValueCount
          if (!allNull) {
            val es = cc.getEncodingStats
            if (es == null || !es.hasDictionaryPages ||
                es.hasNonDictionaryEncodedPages) throw Decline
            val store: org.apache.parquet.column.page.DictionaryPageReadStore =
              reader.getDictionaryReader(block)
            val dp = store.readDictionaryPage(desc)
            if (dp == null) throw Decline
            val dict = dp.getEncoding.initDictionary(desc, dp)
            var i = 0
            while (i <= dict.getMaxId) {
              out += UTF8String.fromBytes(dict.decodeToBinary(i).getBytes)
              i += 1
            }
          }
        }
        out.toSeq
      } finally reader.close()
    }
    // bounded parallel footer reads; any file that declines aborts all
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, Runtime.getRuntime.availableProcessors()))
    try {
      val tasks = paths.map { p =>
        pool.submit(new java.util.concurrent.Callable[Seq[UTF8String]] {
          override def call(): Seq[UTF8String] = fileValues(p)
        })
      }
      val all = new java.util.HashSet[UTF8String]()
      tasks.foreach { t =>
        t.get().foreach(all.add)
        if (all.size > maxValues) throw Decline
      }
      val labels = all.toArray(new Array[UTF8String](all.size))
      // binary order: deterministic ids across runs/sessions
      java.util.Arrays.sort(labels.asInstanceOf[Array[Object]])
      Some(new DictTable(labels))
    } catch {
      case scala.util.control.NonFatal(_) => None // metadata surprise → raw path
    } finally pool.shutdown()
  }
}

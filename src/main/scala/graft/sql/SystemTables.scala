package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** The reference's `fb_*` system catalog tables
  * (`reference/sql3/planner/opsystemtable.go:22-30`) re-expressed over the
  * SparkSession's own state: cluster facts come from the SparkContext,
  * table DDL is generated from catalog schemas (the reverse of
  * [[Ddl.sparkType]]). Registered as temp views so plain SELECT works. */
object SystemTables {

  def register(spark: SparkSession): Unit = {
    import spark.implicits._
    val sc = spark.sparkContext

    Seq((sc.applicationId, sc.appName, "spark", sc.version,
        sc.defaultParallelism.toLong, sc.startTime))
      .toDF("id", "name", "platform", "version", "node_count", "started_at")
      .createOrReplaceTempView("fb_cluster_info")

    // local mode: the driver is the one "node"; on a cluster one row per
    // executor from the status tracker
    sc.statusTracker.getExecutorInfos.toSeq.map(e => (e.host(), e.numRunningTasks().toLong))
      .toDF("uri", "running_tasks")
      .createOrReplaceTempView("fb_cluster_nodes")

    val ddls = spark.catalog.listTables().collect().toSeq.map { t =>
      val cols = spark.table(t.name).schema.fields
        .map(f => s"${f.name} ${refType(f.dataType)}").mkString(", ")
      (t.name, s"create table ${t.name} ($cols)")
    }
    ddls.toDF("name", "ddl").createOrReplaceTempView("fb_table_ddl")

    // active streaming/exec requests
    spark.streams.active.toSeq.map(q => (q.id.toString, q.name, q.status.message))
      .toDF("request_id", "name", "status")
      .createOrReplaceTempView("fb_exec_requests")

    // reference schema `systemobjects.go:43-52`: fb_views rows are the
    // session's CREATE VIEW definitions (ownership/timestamps untracked)
    val ts0 = new java.sql.Timestamp(0L)
    Ddl.viewDefs.toSeq.sortBy(_._1)
      .map { case (n, b) => (n, n, b, "", "", ts0, ts0) }
      .toDF("_id", "name", "statement", "owner", "updated_by",
        "created_at", "updated_at")
      .createOrReplaceTempView("fb_views")

    // reference schema `opsystemtable.go:271-303`: (nodeid, namespace,
    // subsystem, counter_name, value, counter_type); counters live in
    // graft.core.Metrics (counter_type 0 = CTR_TYPE_RAW)
    (graft.core.Metrics.snapshot.map { case (n, v) =>
      ("local", "pilosa", "", n, v, 0L)
    } ++ graft.core.Metrics.gauges.map { case (n, v) =>
      ("local", "pilosa", "runtime", n, v, 0L)
    }).toDF("nodeid", "namespace", "subsystem", "counter_name", "value", "counter_type")
      .createOrReplaceTempView("fb_performance_counters")
  }

  /** Spark type → reference DDL type (inverse of [[Ddl.sparkType]]). */
  def refType(t: DataType): String = t match {
    case LongType | IntegerType | ShortType => "int"
    case d: DecimalType    => s"decimal(${d.scale})"
    case BooleanType       => "bool"
    case TimestampType     => "timestamp"
    case StringType        => "string"
    case ArrayType(StringType, _) => "stringset"
    case ArrayType(LongType, _)   => "idset"
    case DoubleType | FloatType   => "decimal(4)"
    case other             => other.simpleString
  }
}

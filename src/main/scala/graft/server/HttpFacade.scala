package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** HTTP facade over the engine — the reference's serving surface re-expressed
  * on the JDK's built-in server (zero extra dependencies):
  *
  *   - `POST /sql`                  — reference `http_handler.go:536`
  *   - `POST /index/{index}/query`  — reference `http_handler.go:521` (PQL;
  *                                    multi-call programs return one result
  *                                    per call as `{"results":[…]}` like
  *                                    `handler.go:51-56`; writes advance
  *                                    session state like the reference's
  *                                    mutable fragments and ack as `true`)
  *   - `GET  /schema`               — reference `GET /schema`
  *   - `GET  /status`               — health probe
  *
  * Responses use the reference's wire shape (`wire_response.go`
  * `WireQueryResponse`): `{"schema":{"fields":[{"name":…,"base-type":…}]},
  * "data":[[…]…]}`, errors as `{"error":…}`.
  *
  * Scale note: this facade fronts a SparkSession — on a cluster that is a
  * long-running driver (Spark Connect / a thrift-style gateway being the
  * hardened equivalents). Queries execute distributed; only the result rows
  * stream through this process, and `collect()` here is bounded by the same
  * result-size discipline as the reference's coordinator reduce.
  */
final class HttpFacade(spark: SparkSession, dir: String, port: Int,
                       auth: Option[Auth.Config] = None) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  /** Per-route authn/authz, the reference's `chkAuthZ`
    * (`reference/http_handler.go:733-855`): no-op when auth is off
    * (`:742-745`); otherwise verify the bearer token, let admins through,
    * check the index permission. Route→permission mapping follows the
    * reference's router table: `/sql` Admin (`:536`), `/index/{i}/query`
    * Read escalated to Write when the program mutates (`:521`,`:798-803`),
    * imports Write (`:517-520`), `/schema` Read (`:524`). 403 on denial. */
  private def chk(ex: HttpExchange, index: Option[String],
                  required: Auth.Permission): Unit =
    auth.foreach { cfg =>
      val bearer = Option(ex.getRequestHeaders.getFirst("Authorization"))
        .map(_.stripPrefix("Bearer ").trim).filter(_.nonEmpty)
      Auth.chkAuthZ(cfg, bearer, index, required)
    }

  /** Per-table mutable state: PQL writes and field imports persist across
    * requests for the life of the server — the reference's immediately-
    * queryable mutable fragments. Seeded lazily from the parquet tables;
    * prod swaps this for Delta MERGE so state survives the process. */
  private val state =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]

  private def tableState(name: String): DataFrame =
    state.computeIfAbsent(name, n =>
      if (graft.core.Tables.names.contains(n))
        graft.core.Tables.load(spark, dir, n)
      else spark.table(n)) // DDL-created indexes live in the catalog

  /** Writes since the last materialization, per table. */
  private val writesSince =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]

  /** Successor states stack lazily (Catalyst's ProjectCollapsing fuses the
    * narrow per-write projections) and materialize every Nth write — the
    * round-1 per-request localCheckpoint re-wrote O(table) on EVERY write
    * program; now that cost is amortized 1/16 and a read between writes
    * still sees the exact committed state. */
  private def commitState(name: String, next: DataFrame): Unit = {
    val before = state.get(name)
    if (next ne before) {
      val n = writesSince.merge(name, 1, (a, b) => a + b)
      state.put(name, if (n % 16 == 0) next.localCheckpoint() else next)
    }
  }

  def start(): Int = {
    graft.core.Tables.registerAll(spark, dir)
    server.createContext("/sql", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        chk(ex, None, Auth.PermAdmin) // reference/http_handler.go:536
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        toWire(graft.sql.GraftSql.sql(spark, dir, body))
      }
    })
    server.createContext("/index", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val method = ex.getRequestMethod
        parts match {
          // schema management (`reference/http_handler.go:500-516` router
          // perms: index create/delete admin, field create/delete write,
          // index read read)
          case Array("index", idx) if method == "POST" =>
            chk(ex, None, Auth.PermAdmin); createIndex(idx, body)
          case Array("index", idx) if method == "DELETE" =>
            chk(ex, None, Auth.PermAdmin); dropIndex(idx)
          case Array("index", idx) if method == "GET" =>
            chk(ex, Some(idx), Auth.PermRead); indexInfo(idx)
          case Array("index", idx, "field", f) if method == "POST" =>
            chk(ex, Some(idx), Auth.PermWrite); createField(idx, f, body)
          case Array("index", idx, "field", f) if method == "DELETE" =>
            chk(ex, Some(idx), Auth.PermWrite); dropField(idx, f)
          // `GET mutex-check` (`http_handler.go:518`): records whose mutex
          // field holds >1 value. A scalar column cannot represent that
          // violation — the invariant the reference audits is structural
          // here, so the answer is always the empty map.
          case Array("index", idx, "field", _, "mutex-check") if method == "GET" =>
            chk(ex, Some(idx), Auth.PermRead); "{}"
          case Array("index", idx, "query") =>
            chk(ex, Some(idx),
              if (graft.pql.Pql.writeCallN(body) > 0) Auth.PermWrite
              else Auth.PermRead)
            // one result per top-level call (`reference/handler.go:51-56`
            // `QueryResponse.Results`): reads as tables, writes as the
            // reference's boolean ack
            val (results, next) =
              graft.pql.Pql.programResults(tableState(idx), idx, body)
            val wire = results.map { // materialize before exposing new state
              case Some(df) => toWire(df)
              case None     => "true"
            }.mkString("""{"results":[""", ",", "]}")
            commitState(idx, next)
            wire
          case Array("index", idx, "field", field, "import") =>
            // CSV lines `id,value` applied with Set semantics (the
            // reference's `/import` endpoints, `http_handler.go:517-520`;
            // wire format here is CSV instead of the roaring/proto encoding)
            // bulk path: ALL lines apply through ONE full-outer join
            // (Mutation.setBulk) — per-line plan stacking would make a
            // million-bit import a million-node analysis tree
            chk(ex, Some(idx), Auth.PermWrite)
            val t = tableState(idx)
            import spark.implicits._
            val writes = body.linesIterator.filter(_.nonEmpty).zipWithIndex
              .map { case (line, i) =>
                val Array(id, v) = line.split(",", 2)
                (id.trim, v.trim, i.toLong)
              }.toSeq.toDF("_id", "value", "seq")
            commitState(idx, graft.core.Mutation.setBulk(t, field, writes))
            s"""{"imported":true}"""
          case Array("index", idx, "field", field, "import-roaring", shard) =>
            chk(ex, Some(idx), Auth.PermWrite)
            importRoaring(idx, field, shard.toLong, body)
          case _ => sys.error(
            s"expected /index/{i}/query or /index/{i}/field/{f}/import, got ${ex.getRequestURI.getPath}")
        }
      }
    })
    server.createContext("/schema", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
      chk(ex, None, Auth.PermRead) // reference/http_handler.go:524
      val indexes = graft.core.Tables.names.map { t =>
        val fields = spark.table(t).schema.fields.map(f =>
          s"""{"name":${js(f.name)},"type":${js(f.dataType.simpleString)}}""")
        s"""{"name":${js(t)},"fields":[${fields.mkString(",")}]}"""
      }
      s"""{"indexes":[${indexes.mkString(",")}]}"""
    }})
    server.createContext("/status", handler { _ => """{"state":"NORMAL"}""" })
    // unauthenticated like the reference (`http_handler.go:541`)
    server.createContext("/version", handler { _ => """{"version":"graft-0.1"}""" })
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)

  /** FeatureBase's shard width: ShardWidth = 1 << Exponent, Exponent = 20
    * (`reference/shardwidth/helper.go:14`). A fragment bit at position p in
    * shard s encodes rowID = p / ShardWidth for columnID =
    * s·ShardWidth + p mod ShardWidth (`reference/fragment.go:36,318`). */
  private val ShardWidth = 1L << 20

  /** `POST /index/{i}/field/{f}/import-roaring/{shard}` — the reference's
    * high-throughput pre-sharded ingest (`reference/http_handler.go:519`,
    * client pre-sharding `reference/client/batch.go`). The reference envelope
    * is protobuf (`reference/handler.go:446-455` ImportRoaringRequest:
    * Views map[view]→roaring bytes + Action); here the envelope is JSON with
    * base64 view payloads — no protobuf dependency — but the payload itself
    * is the same idea: ONE serialized roaring bitmap of fragment bit
    * positions per view, applied as a single bulk join (not per-bit writes).
    * Supported: the `standard` view, actions `set` (default) and `clear`. */
  private def importRoaring(idx: String, field: String, shard: Long,
                            body: String): String = {
    val t = tableState(idx)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    val action = Option(node.get("action")).map(_.asText).getOrElse("set")
    require(action == "set" || action == "clear",
      s"action must be set|clear (overwrite is a block-level RBF operation " +
      s"with no table analogue here), got '$action'")
    val views = node.get("views")
    require(views != null && views.isObject, """body must carry {"views":{"standard":"<base64 roaring>"}}""")
    import spark.implicits._
    var next = t
    var bits = 0L
    val names = views.fieldNames()
    while (names.hasNext) {
      val view = names.next()
      require(view == "standard",
        s"only the standard view is supported (time/bsi views pend), got '$view'")
      val bm = graft.index.Bitmap.deserialize(
        java.util.Base64.getDecoder.decode(views.get(view).asText))
      // decode driver-side: the payload is one bounded HTTP body, exactly the
      // work the reference's handler does; the APPLY is one distributed join
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val it = bm.getLongIterator
      var seq = 0L
      while (it.hasNext) {
        val p = it.next()
        buf += ((shard * ShardWidth + p % ShardWidth, p / ShardWidth, seq))
        seq += 1
      }
      val writes = buf.toSeq.toDF("_id", "value", "seq")
      next =
        if (action == "clear") graft.core.Mutation.clearBulk(next, field, writes)
        else graft.core.Mutation.setBulk(next, field, writes)
      bits += seq
    }
    commitState(idx, next)
    s"""{"imported":true,"bits":$bits}"""
  }

  // ------------------------------------------------------ schema endpoints

  /** The reference's successResponse wire shape
    * (`reference/http_handler.go:933-939`). */
  private def success(name: String): String =
    s"""{"success":true,"name":${js(name)}}"""

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** `POST /index/{i}` (`http_handler.go:1893-1930`): body
    * `{"options":{"keys":bool,"trackExistence":bool}}`, creates the table
    * with its `_id` column (string ids when keys=true); 409 on conflict
    * like the reference's ConflictError. Routed through the same DDL layer
    * as CREATE TABLE so the index lands in the catalog (and the durable
    * warehouse when configured). */
  private def createIndex(idx: String, body: String): String = {
    val keys = body.nonEmpty && {
      val n = mapper.readTree(body)
      Option(n.get("options")).flatMap(o => Option(o.get("keys")))
        .exists(_.asBoolean(false))
    }
    val idType = if (keys) "STRING" else "ID"
    graft.sql.Ddl.run(spark, s"CREATE TABLE $idx (_id $idType)")
    success(idx)
  }

  /** `DELETE /index/{i}` (`http_handler.go:1879-1890`). */
  private def dropIndex(idx: String): String = {
    graft.sql.Ddl.run(spark, s"DROP TABLE $idx")
    state.remove(idx)
    success(idx)
  }

  /** `GET /index/{i}` (`http_handler.go:1718-1742`): the IndexInfo shape
    * (name + fields with reference base types); 404 when absent. */
  private def indexInfo(idx: String): String = {
    val df =
      try tableState(idx)
      catch { case _: Exception => sys.error(s"Index $idx Not Found") }
    val fields = df.schema.fields.filter(_.name != "_id").map { f =>
      s"""{"name":${js(f.name)},"options":{"type":${js(
        graft.sql.SystemTables.refType(f.dataType).toLowerCase)}}}"""
    }
    s"""{"name":${js(idx)},"options":{"keys":${
      df.schema.fields.exists(f => f.name == "_id" &&
        f.dataType == org.apache.spark.sql.types.StringType)},"trackExistence":true},"fields":[${fields.mkString(",")}]}"""
  }

  /** `POST /index/{i}/field/{f}` (`http_handler.go:2088-2140`): the
    * fieldOptions JSON (`:2181-2196`) mapped onto our DDL column types —
    * the same storage mapping as CREATE TABLE (SURVEY §1.2). */
  private def createField(idx: String, field: String, body: String): String = {
    val opts = if (body.isEmpty) mapper.createObjectNode()
               else Option(mapper.readTree(body).get("options"))
                 .getOrElse(mapper.createObjectNode())
    def has(k: String) = opts.hasNonNull(k)
    def str(k: String) = opts.get(k).asText
    val keys = has("keys") && opts.get("keys").asBoolean(false)
    val typ = if (has("type")) str("type") else "set"
    val ddlType = typ match {
      case "set"       => if (keys) "STRINGSET" else "IDSET"
      case "mutex"     => if (keys) "STRING" else "ID"
      case "int"       =>
        "INT" + (if (has("min")) s" MIN ${str("min")}" else "") +
                (if (has("max")) s" MAX ${str("max")}" else "")
      case "decimal"   => s"DECIMAL(${if (has("scale")) str("scale") else "0"})"
      case "bool"      => "BOOL"
      case "timestamp" =>
        "TIMESTAMP" + (if (has("timeUnit")) s" TIMEUNIT '${str("timeUnit")}'" else "") +
                      (if (has("epoch")) s" EPOCH '${str("epoch")}'" else "")
      case "time"      =>
        (if (keys) "STRINGSETQ" else "IDSETQ") +
          (if (has("timeQuantum")) s" TIMEQUANTUM '${str("timeQuantum")}'" else "") +
          (if (has("ttl")) s" TTL '${str("ttl")}'" else "")
      case other       => sys.error(s"invalid field type: $other")
    }
    graft.sql.Ddl.run(spark, s"ALTER TABLE $idx ADD COLUMN $field $ddlType")
    state.remove(idx) // next read sees the widened schema
    success(field)
  }

  /** `DELETE /index/{i}/field/{f}` (`http_handler.go:516` DeleteField). */
  private def dropField(idx: String, field: String): String = {
    graft.sql.Ddl.run(spark, s"ALTER TABLE $idx DROP COLUMN $field")
    state.remove(idx)
    success(field)
  }

  private def handler(f: String => String): HttpHandler = new HttpHandler {
    def handle(ex: HttpExchange): Unit = respond(ex) {
      f(new String(ex.getRequestBody.readAllBytes(), UTF_8))
    }
  }

  private def respond(ex: HttpExchange)(f: => String): Unit = {
    val (code, payload) =
      try (200, f)
      catch {
        // StatusForbidden, reference/http_handler.go:763,843-851
        case e: Auth.AuthError => (403, s"""{"error":${js(msg(e))}}""")
        case e: Throwable      => (400, s"""{"error":${js(msg(e))}}""")
      }
    val bytes = payload.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def msg(e: Throwable): String =
    Option(e.getMessage).getOrElse(e.getClass.getSimpleName).linesIterator
      .take(3).mkString(" ")

  /** Hard cap on rows materialized into one HTTP response — the coordinator-
    * node analogue of the reference's result limits; an unbounded SELECT
    * would otherwise collect the whole table into the server's heap. */
  private val MaxWireRows = 100000

  /** DataFrame → reference wire shape. */
  private def toWire(df: DataFrame): String = {
    val fields = df.schema.fields.map(f =>
      s"""{"name":${js(f.name)},"base-type":${js(f.dataType.simpleString)}}""")
    val collected = df.limit(MaxWireRows + 1).collect()
    if (collected.length > MaxWireRows)
      sys.error(s"result exceeds $MaxWireRows rows; add TOP(n) or a filter")
    val rows = collected.map { r =>
      (0 until r.length).map(i => jsAny(r.get(i))).mkString("[", ",", "]")
    }
    s"""{"schema":{"fields":[${fields.mkString(",")}]},"data":[${rows.mkString(",")}]}"""
  }

  private def js(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c    => b.append(c)
    }
    b.append('"').toString
  }

  private def jsAny(v: Any): String = v match {
    case null                 => "null"
    case b: Boolean           => b.toString
    case n: Byte              => n.toString
    case n: Short             => n.toString
    case n: Int               => n.toString
    case n: Long              => n.toString
    case n: Float             => if (n.isNaN || n.isInfinite) js(n.toString) else n.toString
    case n: Double            => if (n.isNaN || n.isInfinite) js(n.toString) else n.toString
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal        => d.bigDecimal.toPlainString
    case s: Seq[_]            => s.map(jsAny).mkString("[", ",", "]")
    case a: Array[_]          => a.map(jsAny).mkString("[", ",", "]")
    case r: org.apache.spark.sql.Row =>
      (0 until r.length).map(i => jsAny(r.get(i))).mkString("[", ",", "]")
    case other                => js(other.toString)
  }
}

/** Standalone entry: `runMain graft.server.HttpFacade <sfDir> [port]`. */
object HttpFacade {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val port = args.lift(1).map(_.toInt).getOrElse(10101)
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-server")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bound = new HttpFacade(spark, dir, port).start()
    println(s"[graft-server] listening on :$bound (POST /sql, POST /index/{i}/query)")
    Thread.currentThread().join()
  }
}

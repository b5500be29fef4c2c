package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

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
                       auth: Option[Auth.Config] = None,
                       tls: Option[Tls.Config] = None) {

  /** Plain HTTP, or HTTPS when a TLS keystore is configured (the
    * reference's server TLS block, `reference/tls.go` GetTLSConfig). */
  private val server = tls match {
    case Some(t) =>
      val s = com.sun.net.httpserver.HttpsServer.create(
        new InetSocketAddress(port), 0)
      s.setHttpsConfigurator(
        new com.sun.net.httpserver.HttpsConfigurator(Tls.sslContext(t)))
      s
    case None => HttpServer.create(new InetSocketAddress(port), 0)
  }

  /** Per-route authn/authz, the reference's `chkAuthZ`
    * (`reference/http_handler.go:733-855`): no-op when auth is off
    * (`:742-745`); otherwise verify the bearer token, let admins through,
    * check the index permission. Route→permission mapping follows the
    * reference's router table: `/sql` Admin (`:536`), `/index/{i}/query`
    * Read escalated to Write when the program mutates (`:521`,`:798-803`),
    * imports Write (`:517-520`), `/schema` Read (`:524`). 403 on denial. */
  private def chk(ex: HttpExchange, index: Option[String],
                  required: Auth.Permission): Option[Auth.UserInfo] =
    auth.map { cfg =>
      val bearer = Option(ex.getRequestHeaders.getFirst("Authorization"))
        .map(_.stripPrefix("Bearer ").trim).filter(_.nonEmpty)
      Auth.chkAuthZ(cfg, bearer, index, required)
    }

  /** The reference's per-query HTTP access line
    * (`reference/http_handler.go:806-817`: ip, ua, url-path, userid,
    * username, query string — newlines stripped; non-query endpoints like
    * /status and /metrics never log, which holds here by construction
    * since only the query handlers call this), emitted when
    * `spark.graft.queryLog` is set — the same switch as the gRPC facade's
    * lines. `[index]`-tagged PQL bodies feed `tools.Advise --from-log`
    * alongside the gRPC records, so production traffic on either facade
    * advises indexes. */
  private def logQuery(ex: HttpExchange, user: Option[Auth.UserInfo],
                       index: String, q: String): Unit =
    if (spark.conf.get("spark.graft.queryLog", "false") == "true") {
      // EVERY client-controlled field is sanitized, not just the body: a
      // User-Agent (or token-derived user name) carrying a newline would
      // forge whole 'HTTP:'/'GRPC:' access lines, which `Advise --from-log`
      // then parses as real production queries — log injection becoming
      // statement injection on the operator's replay. The ua additionally
      // drops ']' so it can never terminate the bracketed field early and
      // shift the path/body columns the parser splits on.
      // ',' is ALSO stripped from the non-body fields (ip/ua/user): the
      // access line is comma-split by Advise.parseLog, so a display name
      // like `x, SELECT …` would shift the parsed columns and prefix forged
      // text into the query body (the no-execute guards cap the impact at
      // recommendation skew — but the forgery shouldn't parse at all)
      def clean(s: String) = s.replace("\n", "").replace("\r", "")
      def cleanField(s: String) = clean(s).replace(",", "")
      val ip = cleanField(Option(ex.getRemoteAddress)
        .flatMap(a => Option(a.getAddress)).map(_.getHostAddress)
        .getOrElse(""))
      val ua = cleanField(Option(ex.getRequestHeaders.getFirst("User-Agent"))
        .getOrElse("")).replace("]", "")
      // the BODY is the line's LAST comma-split field — its commas are real
      // query text and parse fine; only newlines are stripped there
      val body = (if (index.nonEmpty) s"[$index]" else "") + clean(q)
      System.err.println(
        s"HTTP: $ip, [$ua], ${cleanField(ex.getRequestURI.getPath)}, " +
        s"${user.map(u => cleanField(u.userId)).getOrElse("")}, " +
        s"${user.map(u => cleanField(u.userName)).getOrElse("")}, $body")
    }

  /** `reference/http_handler.go:1062-1077` filterSchema: with auth on,
    * non-admin callers see only the indexes on their read-authorized list;
    * identity for admins and when auth is off. */
  private def readable(user: Option[Auth.UserInfo]): String => Boolean =
    (auth, user) match {
      case (Some(cfg), Some(u)) if !cfg.perms.isAdmin(u.groups) =>
        cfg.perms.authorizedIndexes(u.groups, Auth.PermRead).toSet
      case _ => _ => true
    }

  /** Whether writes persist durably: with `spark.graft.warehouse` set, every
    * serving-path write routes through [[graft.core.TableLog]] — parquet
    * pieces + manifest, restart-safe like the reference's RBF storage
    * (`reference/rbf/rbf.go:3-29`). Without it, state is an in-memory
    * successor chain for the life of the server (the dev/test mode). */
  private def durable: Boolean = graft.core.TableLog.isDurable(spark)

  /** key↔id translation for `/internal/translate/...` — warehouse-durable
    * when the facade is (ids must survive a bounce; a client holds them). */
  private val keyTranslate = new KeyTranslate(
    Option(spark.conf.get("spark.graft.warehouse", null))
      .map(w => java.nio.file.Paths.get(w, "_translate.tsv")))

  /** Per-table mutable state (non-durable mode): PQL writes and field
    * imports persist across requests for the life of the server — the
    * reference's immediately-queryable mutable fragments. Seeded lazily
    * from the parquet tables. In durable mode the TableLog-registered temp
    * view is the single source of truth instead. */
  private val state =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]

  private def tableState(name: String): DataFrame =
    if (durable) spark.table(graft.core.Idents.q(name))
    else state.computeIfAbsent(name, n =>
      if (graft.core.Tables.names.contains(n))
        graft.core.Tables.load(spark, dir, n)
      else spark.table(graft.core.Idents.q(n))) // DDL-created indexes live in the catalog

  /** Writes since the last materialization, per table. */
  private val writesSince =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]

  /** Successor states stack lazily (Catalyst's ProjectCollapsing fuses the
    * narrow per-write projections) and materialize every Nth write — the
    * round-1 per-request localCheckpoint re-wrote O(table) on EVERY write
    * program; now that cost is amortized 1/16 and a read between writes
    * still sees the exact committed state. */
  private def commitState(name: String, next: DataFrame,
                          touched: Option[DataFrame] = None): Unit = {
    if (durable) {
      // persist only the touched rows: TableLog upsert is O(delta), the
      // serving-path analogue of the reference's per-shard RBF commit
      import org.apache.spark.sql.functions.col
      val idT = next.schema("_id").dataType
      touched match {
        case Some(ids) =>
          graft.core.TableLog.upsert(spark, name, next.join(
            ids.select(col("_id").cast(idT)).distinct(), Seq("_id"), "left_semi"))
        case None => // no id set known — honest whole-state replace
          graft.core.TableLog.replace(spark, name, next, checkpoint = true)
      }
      invalidateTableCaches(name)
      return
    }
    val before = state.get(name)
    if (next ne before) {
      val n = writesSince.merge(name, 1, (a, b) => a + b)
      state.put(name,
        if (n % 16 == 0) graft.core.Materialize.stable(next) else next)
      invalidateTableCaches(name)
    }
  }

  /** `/schema/details` per-table field-cardinality memo: the endpoint is a
    * metadata probe, and recomputing one agg pass per table per request
    * would turn it into a repeated table scan. Invalidated on write/DDL
    * (and wholesale by `/recalculate-caches`), the same spirit as the
    * reference's cached ranked-cache counts. */
  private val cardinalityCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.Row]

  /** `/internal/shards/max` per-table memo: same metadata-probe discipline
    * as the cardinality memo above — one max(_id) agg per table on first
    * ask, then served driver-side until a write/DDL invalidates (the
    * sites that clear cardinalityCache clear this too via
    * [[invalidateTableCaches]]). */
  private val maxShardCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]

  private def invalidateTableCaches(name: String): Unit = {
    cardinalityCache.remove(name)
    maxShardCache.remove(name)
  }

  /** Query tracker (`reference/tracker.go:11-27`): in-flight queries for
    * `GET /queries`, a bounded ring of finished ones for
    * `GET /query-history`. */
  private case class QueryRec(pql: String, sql: String, index: String,
                              startNs: Long, endNs: Long = 0L,
                              spans: String = "")
  private val activeQueries =
    new java.util.concurrent.ConcurrentHashMap[Long, QueryRec]
  private val querySeq = new java.util.concurrent.atomic.AtomicLong
  private val pastQueries =
    new java.util.concurrent.ConcurrentLinkedDeque[QueryRec]
  private val PastQueriesKept = 100

  /** Per-query span tracing (`reference/tracing/tracing.go:14-58`;
    * `executor.go` wraps each executor section): one ROOT span per tracked
    * request, compiler sections attach as nested children through the
    * thread-local, and the Spark jobs the request launched (matched by job
    * group) attach at close. Spans land on the /query-history record. */
  private val jobSpans = new graft.core.JobSpanListener

  /** Query governance — the reference's context semantics on Spark's
    * mechanism. `validateQueryContext` (`reference/executor.go:8165-8180`)
    * aborts a request whose context is done: deadline → ErrQueryTimeout,
    * cancellation → ErrQueryCancelled (`reference/pilosa.go:55-56`); and
    * `collectStats` logs queries over the configured LongQueryTime
    * (`reference/http_handler.go:397-406`, `server.go:199-204`). Plain-HTTP
    * clients can't carry a Go context, so here the deadline comes from
    * `spark.graft.queryTimeout` and explicit cancellation from the admin
    * `POST /queries/cancel?id=` extension (the reference cancels on client
    * disconnect, which JDK HttpServer does not surface mid-handler).
    * Enforcement is the request's Spark job group: `killWith` cancels it
    * with `interruptOnCancel=true` — running tasks are interrupted and the
    * 32 cores free IMMEDIATELY, the Spark-native form of the reference's
    * per-shard ctx polls. Group cancellation is one-shot and a multi-call
    * program would otherwise launch its next job past it, so the kill also
    * registers the group with [[graft.core.JobSpanListener]].killed: any
    * job that starts in the group after the kill is re-cancelled
    * event-driven from onJobStart. Driver-side call boundaries poll
    * [[graft.core.QueryContext]] like the executor sections do. */
  private final class QueryCtl(val group: String) {
    val kill = new java.util.concurrent.atomic.AtomicReference[String](null)
    private val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def killWith(reason: String): Unit =
      if (!closed.get && kill.compareAndSet(null, reason)) {
        jobSpans.killed.put(group, () => spark.sparkContext.cancelJobGroup(group))
        // deadline.cancel(false) can't stop a watchdog task already past
        // the CAS: if close() raced between our put and its remove, the
        // entry would leak forever — re-check and self-clean
        if (closed.get) jobSpans.killed.remove(group)
        // cancel unconditionally: the killed hook re-cancels jobs that
        // start later, and gating on span-listener liveness would skip the
        // cancel entirely once the listener's group cap is hit (a cancel
        // on an idle group merely logs a scheduler warning)
        else spark.sparkContext.cancelJobGroup(group)
      }
    def close(): Unit = { closed.set(true); jobSpans.killed.remove(group) }
  }
  private val activeCtl =
    new java.util.concurrent.ConcurrentHashMap[Long, QueryCtl]
  /** In-flight JFR recording between /cpu-profile/start and /stop (the
    * reference's pprofCPUProfileBuffer slot, `http_handler.go:1624`). */
  private val cpuProfile =
    new java.util.concurrent.atomic.AtomicReference[jdk.jfr.Recording](null)
  private val watchdog =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-query-watchdog"); t.setDaemon(true); t
    }
  private def confMs(key: String): Long =
    Option(spark.conf.get(key, null)).filter(_.nonEmpty)
      .map(org.apache.spark.network.util.JavaUtils.timeStringAsMs)
      .getOrElse(0L)

  private def tracked[A](pql: String, sql: String, index: String)(f: => A): A = {
    val id = querySeq.incrementAndGet()
    val rec = QueryRec(pql, sql, index, System.nanoTime())
    activeQueries.put(id, rec)
    val group = s"graft-q$id"
    val ctl = new QueryCtl(group)
    activeCtl.put(id, ctl)
    spark.sparkContext.setJobGroup(group, group, interruptOnCancel = true)
    val timeoutMs = confMs("spark.graft.queryTimeout")
    val deadline: Option[java.util.concurrent.ScheduledFuture[_]] =
      if (timeoutMs <= 0) None
      else Some(watchdog.schedule(new Runnable {
        def run(): Unit = ctl.killWith("query timeout") // pilosa.go:56
      }, timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS))
    val check: () => Unit =
      () => Option(ctl.kill.get).foreach(r => throw new RuntimeException(r))
    val root = new graft.core.Trace.Span("request", System.nanoTime())
    try graft.core.Trace.install(root)(graft.core.QueryContext.install(check)(f))
    catch {
      // a killed request surfaces Spark's job-group-cancel wording; answer
      // with the reference's error instead (ErrQueryCancelled/Timeout)
      case e: Throwable => throw Option(ctl.kill.get)
        .map(new RuntimeException(_)).getOrElse(e)
    } finally {
      deadline.foreach(_.cancel(false))
      ctl.close()
      activeCtl.remove(id)
      root.endNs = System.nanoTime()
      spark.sparkContext.clearJobGroup()
      jobSpans.drain(group).foreach(root.children.add)
      activeQueries.remove(id)
      pastQueries.addFirst(rec.copy(endNs = System.nanoTime(),
        spans = root.toJson))
      while (pastQueries.size > PastQueriesKept) pastQueries.pollLast()
      val longNs = confMs("spark.graft.longQueryTime") * 1000000L
      val durNs = root.endNs - rec.startNs
      if (longNs > 0 && durNs > longNs) {
        // http_handler.go:406 log shape (method/URL → index + query text)
        System.err.println(
          s"HTTP query duration ${durNs / 1000000}ms exceeds ${longNs / 1000000}ms: " +
            s"$index ${if (pql.nonEmpty) pql else sql}")
        graft.core.Metrics.inc(graft.core.Metrics.SlowQuery)
      }
    }
  }

  private def queryJson(r: QueryRec, past: Boolean, id: Long = -1L): String = {
    val base = s""""PQL":${js(r.pql)}${if (r.sql.nonEmpty) s""","SQL":${js(r.sql)}""" else ""},"node":"local","index":${js(r.index)}"""
    if (past) {
      val spans = if (r.spans.nonEmpty) s""","spans":${r.spans}""" else ""
      s"""{$base,"runtimeNanoseconds":${r.endNs - r.startNs}$spans}"""
    } else {
      // "id" is additive vs the reference's ActiveQueryStatus
      // (tracker.go:11-17) — it names the query for POST /queries/cancel,
      // our explicit form of its client-disconnect cancellation
      val ref = if (id >= 0) s""","id":$id""" else ""
      s"""{$base,"age":${System.nanoTime() - r.startNs}$ref}"""
    }
  }

  /** Per-table write serialization: requests run on a thread pool (below),
    * and a read-modify-write against the same table from two threads would
    * otherwise lose one of the updates — the reference serializes via its
    * per-shard RBF write transaction (`rbf/rbf.go:3-29`). Reads stay
    * lock-free on immutable DataFrames. */
  private val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]

  /** In durable mode the facade lock alone is not enough: another FRONTEND
    * (gRPC) sharing this SparkSession has its own lock map, so the
    * read→compute-delta→commit sequence must also hold TableLog's
    * per-(session,table) mutation lock — the log's documented contract.
    * Intrinsic locks are reentrant, so paths that already take
    * TableLog.locked deeper down (the PQL durable write path) compose.
    * Ordering is always facade-lock → log-lock, never the reverse. */
  private def writeLock[A](name: String)(f: => A): A =
    tableLocks.computeIfAbsent(name, _ => new Object).synchronized(
      if (durable) graft.core.TableLog.locked(spark, name)(f) else f)

  /** This node's URI JSON as the Go client's StatusURI/fragmentNode
    * parse it (`client.go:1602-1606,1650-1654`). */
  private def nodeUri: String = {
    val scheme = if (tls.isDefined) "https" else "http"
    s"""{"scheme":"$scheme","host":"localhost","port":${server.getAddress.getPort}}"""
  }

  def start(): Int = {
    spark.sparkContext.addSparkListener(jobSpans)
    graft.core.Tables.registerAll(spark, dir)
    // durable mode: re-register warehouse tables over the parquet views so
    // writes from a previous process are visible (restart = restore)
    graft.sql.Ddl.restoreSession(spark)
    server.createContext("/sql", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        val uinfo = chk(ex, None, Auth.PermAdmin) // reference/http_handler.go:536
        // `?plan=true` appends the compiled plan to the envelope
        // (`http_handler.go:1438-1545`: strconv.ParseBool values, 400 on
        // anything else; plan rendered as nested {"_op":...} maps like the
        // sql3 planner's Plan() — ours is the Spark PHYSICAL plan, where
        // pushed filters and exchanges are visible)
        val includePlan = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").collectFirst { case s if s.startsWith("plan=") =>
            s.drop(5) } match {
          case None => false
          case Some(v) if Seq("1", "t", "T", "TRUE", "true", "True").contains(v) => true
          case Some(v) if Seq("0", "f", "F", "FALSE", "false", "False").contains(v) => false
          case Some(v) => sys.error(s"""strconv.ParseBool: parsing "$v": invalid syntax""")
        }
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        logQuery(ex, uinfo, "", body)
        graft.core.Metrics.inc(graft.core.Metrics.SqlQueries)
        tracked("", body, "") {
          val t0 = System.nanoTime()
          val df = graft.sql.GraftSql.sql(spark, dir, body)
          val wire = toWire(df) // collect finalizes the AQE plan
          val plan = if (includePlan) s""","query-plan":${planJson(df)}""" else ""
          // the reference closes every /sql envelope with the execution
          // time in microseconds (http_handler.go:1481-1494)
          wire.dropRight(1) + plan +
            s""","execution-time":${(System.nanoTime() - t0) / 1000}}"""
        }
      }
    })
    // `POST /import-atomic-record` (`http_handler.go:499,3089-3151`
    // handlePostImportAtomicRecord): one record's BSI value imports (Ivr)
    // and bit imports (Ir) applied ATOMICALLY — the reference spans every
    // sub-import with one Qcx and aborts on failure; here all sub-imports
    // fold over one state under the table write lock and commit once (any
    // error throws before the commit). Protobuf-only (415/406); success is
    // the zero-byte importOk.
    server.createContext("/import-atomic-record", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val bodyBytes = ex.getRequestBody.readAllBytes()
        if (Option(ex.getRequestHeaders.getFirst("Content-Type"))
              .getOrElse("") != "application/x-protobuf") {
          plainError(ex, 415, "Unsupported media type"); return
        }
        val simLoss = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").find(_.startsWith("simPowerLossAfter="))
          .map(_.stripPrefix("simPowerLossAfter="))
        if (simLoss.exists(_.toLongOption.isEmpty)) {
          plainError(ex, 400, s"invalid simPowerLossAfter"); return
        }
        val lossAfter = simLoss.flatMap(_.toLongOption).getOrElse(0L)
        // decode the WHOLE envelope inside an error path that still
        // answers 400: a wire-type-confused Index field (varint where
        // bytes are expected) or a malformed sub-import blob must not
        // throw past the handler and kill the exchange responseless
        val decoded: Either[String, (String, Seq[PbQuery.ImportMsg], Seq[PbQuery.ImportMsg])] =
          try {
            val outer = new Proto.Reader(bodyBytes)
            def msgs(f: Int) = outer.fields.getOrElse(f, Seq.empty).collect {
              case b: Array[Byte] => new PbQuery.ImportMsg(b)
            }
            val (ivr, ir) = (msgs(3), msgs(4))
            // outer Index, else the first sub-import that CARRIES one
            val idx = outer.fields.getOrElse(1, Seq.empty).collectFirst {
                case b: Array[Byte] => new String(b, UTF_8)
              }.filter(_.nonEmpty)
              .orElse((ivr.iterator ++ ir.iterator)
                .flatMap(_.strings(1).headOption).find(_.nonEmpty))
              .getOrElse("")
            Right((idx, ivr, ir))
          } catch { case e: Exception => Left(msg(e)) }
        decoded match {
          case Left(m) => plainError(ex, 400, m)
          case Right((idx, ivr, ir)) => protoWrite(ex, idx) {
            if (idx.isEmpty) sys.error("AtomicRecord.Index missing")
            writeLock(idx) {
              // the reference's handlePostImportAtomicRecord error switch
              // (`http_handler.go:3117-3126`) has NO not-found case — a
              // missing index/field falls to the default 500 with the
              // api-layer wrapped wording (`api.go:1377-1380` "getting
              // index"; newNotFoundError renders "<name>: index not found")
              var t = try tableState(idx)
                      catch { case _: Exception =>
                        throw PlainError(500,
                          s"getting index: $idx: index not found") }
              val schema = t.schema
              import spark.implicits._
              val touched = Seq.newBuilder[org.apache.spark.sql.DataFrame]
              // the reference's SimPowerLossAfter QA hook (`api.go:
              // 1358-1412`): abort once the sub-import counter passes the
              // threshold — its Qcx rolls everything back, our
              // single-commit does the same by never committing
              var tot = 0L
              def checkLoss(): Unit = {
                tot += 1
                if (lossAfter > 0 && tot > lossAfter)
                  throw PlainError(500, "error: update was aborted")
              }
              def apply1(field: String, pairs: Seq[(String, String)],
                         clear: Boolean, wrap: String): Unit = {
                // 500, not 404: mirrors `api.go:1400-1417` errors.Wrap over
                // indexField's "getting index and field" over the
                // newNotFoundError rendering
                if (!schema.fields.exists(_.name == field))
                  throw PlainError(500,
                    s"$wrap: getting index and field: $field: field not found")
                if (pairs.nonEmpty) {
                  val writes = pairs.zipWithIndex
                    .map { case ((id, v), i) => (id, v, i.toLong) }
                    .toDF("_id", "value", "seq")
                  t = if (clear) graft.core.Mutation.clearBulk(t, field, writes)
                      else graft.core.Mutation.setBulk(t, field, writes)
                  touched += writes.select("_id")
                }
              }
              ivr.foreach { m => // pb.ImportValueRequest (BSI values)
                checkLoss()
                val field = m.strings(2).headOption.getOrElse(
                  sys.error("ImportValueRequest.Field missing"))
                apply1(field, PbQuery.valuePairs(m),
                  m.longs(12).headOption.exists(_ == 1L),
                  "ImportAtomicRecord ImportValueWithTx")
              }
              ir.foreach { m => // pb.ImportRequest (bits)
                checkLoss()
                val field = m.strings(2).headOption.getOrElse(
                  sys.error("ImportRequest.Field missing"))
                apply1(field, PbQuery.rowPairs(m),
                  m.longs(11).headOption.exists(_ == 1L),
                  "ImportAtomicRecord ImportWithTx")
              }
              val allTouched = touched.result()
              if (allTouched.nonEmpty)
                commitState(idx, t,
                  touched = Some(allTouched.reduce(_ unionByName _)))
            }
          }
        }
      }
    })
    server.createContext("/index", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
        val bodyBytes = ex.getRequestBody.readAllBytes()
        // the reference Go client's native protocol: protobuf QueryRequest/
        // QueryResponse when Content-Type is x-protobuf
        // (`reference/http_handler.go:2516-2523`)
        val isProto = Option(ex.getRequestHeaders.getFirst("Content-Type"))
          .exists(_.startsWith("application/x-protobuf"))
        parts match {
          case Array("index", idx, "query") if isProto =>
            protoQuery(ex, idx, bodyBytes)
          case Array("index", idx, "field", field, "import") if isProto =>
            protoImport(ex, idx, field, bodyBytes)
          // a non-numeric shard path segment answers 400 like the reference's
          // mux (`http_handler.go` route constraints) — an uncaught
          // NumberFormatException would make the JDK server drop the exchange
          case Array("index", idx, "field", field, "import-roaring", shard)
              if isProto =>
            shard.toLongOption match {
              case Some(s) => protoRoaring(ex, idx, field, s, bodyBytes)
              case None => plainError(ex, 400, s"bad shard '$shard'")
            }
          case Array("index", idx, "shard", shard, "import-roaring")
              if isProto =>
            shard.toLongOption match {
              case Some(s) => protoRoaringShard(ex, idx, s, bodyBytes)
              case None => plainError(ex, 400, s"bad shard '$shard'")
            }
          case _ => jsonRoutes(ex, parts, new String(bodyBytes, UTF_8))
        }
      }

      private def jsonRoutes(ex: HttpExchange, parts: Array[String],
                             body: String): Unit = respond(ex) {
        val method = ex.getRequestMethod
        parts match {
          // schema management (`reference/http_handler.go:500-516` router
          // perms: index create/delete admin, field create/delete write,
          // index read read)
          // `GET /index` (`http_handler.go:500` GetIndexes): the schema's
          // index list
          case Array("index") if method == "GET" =>
            val vis = readable(chk(ex, None, Auth.PermRead))
            allIndexNames.filter(vis).map(indexInfo).mkString("[", ",", "]")
          case Array("index", idx) if method == "POST" =>
            chk(ex, None, Auth.PermAdmin); createIndex(idx, body)
          case Array("index", idx) if method == "DELETE" =>
            chk(ex, None, Auth.PermAdmin); dropIndex(idx)
          case Array("index", idx) if method == "GET" =>
            chk(ex, Some(idx), Auth.PermRead); indexInfo(idx)
          // `GET /index/{i}/dataframe` (`http_handler.go:508`,
          // `apply.go:655-686` GetDataframeSchema): the Apply()/Arrow()
          // sidecar schema in the arrow type vocabulary — here the table
          // itself, typed with the changeset cast set (`apply.go:287-303`:
          // int64 / float64 / utf8), `_ID` spelled like the sidecar's.
          case Array("index", idx, "dataframe") if method == "GET" =>
            chk(ex, Some(idx), Auth.PermRead)
            import org.apache.spark.sql.types._
            tableState(idx).schema.fields.map { f =>
              val t = f.dataType match {
                case StringType => "utf8"
                case DoubleType | FloatType | _: DecimalType => "float64"
                case _ => "int64"
              }
              s"""{"Name":${js(if (f.name == "_id") "_ID" else f.name)},"Type":${js(t)}}"""
            }.mkString("[", ",", "]")
          case Array("index", idx, "field", f) if method == "POST" =>
            chk(ex, Some(idx), Auth.PermWrite); createField(idx, f, body)
          case Array("index", idx, "field", f) if method == "DELETE" =>
            chk(ex, Some(idx), Auth.PermWrite); dropField(idx, f)
          // `GET mutex-check` (`http_handler.go:518`, `api.go:2737`): records
          // whose mutex field holds >1 value. A scalar column cannot
          // represent that violation — the invariant the reference audits is
          // structural here, so the answer is always empty. The WIRE shape
          // still tracks the reference's marshaling (`api.go:2931-2981`):
          // details=false collects a LIST of record ids (`result = outIDs`),
          // details=true a record→values MAP — an empty `[]` vs `{}`.
          // Error wire shape matches `handleGetMutexCheck`
          // (`http_handler.go:3263-3297`): 406 unless the Accept header
          // admits application/json; 400 on a non-numeric limit=; 500 (via
          // Go's http.Error, text/plain) when the field is missing
          // (`api.go:2746` newNotFoundError) or not mutex-typed
          // (`api.go:2752` "can only check mutex state for mutex fields").
          case Array("index", idx, "field", f, "mutex-check") if method == "GET" =>
            chk(ex, Some(idx), Auth.PermRead)
            if (!acceptsJson(ex))
              throw PlainError(406, "JSON only acceptable response")
            val qparams = Option(ex.getRequestURI.getQuery).getOrElse("")
              .split("&").toSeq
            qparams.collectFirst { case s if s.startsWith("limit=") =>
              s.stripPrefix("limit=") }.foreach { v =>
              if (scala.util.Try(v.toInt).isFailure)
                throw PlainError(400, "limit must be numeric") }
            val schema = tableState(idx).schema
            val fld = schema.fields.find(_.name == f).getOrElse(
              throw PlainError(500, "field not found"))
            fld.dataType match {
              // STRING/ID columns are the reference's mutex fields (SURVEY
              // §1.2 storage mapping); integer scalars also carry INT (BSI)
              // — indistinguishable in a scalar column, so admitted. Sets,
              // bool, decimal, timestamp are distinct reference field types
              // (`field.go:43-49`) and are rejected like the reference.
              case org.apache.spark.sql.types.StringType |
                   org.apache.spark.sql.types.LongType |
                   org.apache.spark.sql.types.IntegerType |
                   org.apache.spark.sql.types.ShortType => ()
              case _ =>
                throw PlainError(500, "can only check mutex state for mutex fields")
            }
            val details = qparams.contains("details=true")
            if (details) "{}" else "[]"
          case Array("index", idx, "query") =>
            val writes = graft.pql.Pql.writeCallN(body) > 0
            graft.core.Metrics.inc(graft.core.Metrics.PqlQueries)
            val uinfo = chk(ex, Some(idx),
              if (writes) Auth.PermWrite else Auth.PermRead)
            logQuery(ex, uinfo, idx, body)
            // one result per top-level call (`reference/handler.go:51-56`
            // `QueryResponse.Results`): reads as tables, writes as the
            // reference's boolean ack. Write programs hold the table's
            // write lock across state-read -> compute -> commit; pure reads
            // run lock-free on the immutable committed state.
            def run(): String =
              if (durable) {
                // each write call persists its touched rows through the
                // TableLog warehouse — restart-safe, O(delta) per write
                val wire = graft.pql.Pql.programResultsDurable(spark, idx, body).map {
                  case Some(df) => toWire(df)
                  case None     => "true"
                }.mkString("""{"results":[""", ",", "]}")
                if (writes) invalidateTableCaches(idx)
                wire
              } else {
                val (results, next) =
                  graft.pql.Pql.programResults(tableState(idx), idx, body)
                val wire = results.map { // materialize before exposing new state
                  case Some(df) => toWire(df)
                  case None     => "true"
                }.mkString("""{"results":[""", ",", "]}")
                commitState(idx, next)
                wire
              }
            tracked(body, "", idx) {
              if (writes) writeLock(idx)(run()) else run()
            }
          case Array("index", idx, "field", field, "import") =>
            // CSV lines `id,value` applied with Set semantics (the
            // reference's `/import` endpoints, `http_handler.go:517-520`;
            // wire format here is CSV instead of the roaring/proto encoding)
            // bulk path: ALL lines apply through ONE full-outer join
            // (Mutation.setBulk) — per-line plan stacking would make a
            // million-bit import a million-node analysis tree
            chk(ex, Some(idx), Auth.PermWrite)
            writeLock(idx) {
              val t = tableState(idx)
              import spark.implicits._
              val writes = body.linesIterator.filter(_.nonEmpty).zipWithIndex
                .map { case (line, i) =>
                  val Array(id, v) = line.split(",", 2)
                  (id.trim, v.trim, i.toLong)
                }.toSeq.toDF("_id", "value", "seq")
              commitState(idx, graft.core.Mutation.setBulk(t, field, writes),
                touched = Some(writes))
            }
            s"""{"imported":true}"""
          case Array("index", idx, "field", field, "import-roaring", shard) =>
            chk(ex, Some(idx), Auth.PermWrite)
            writeLock(idx)(importRoaring(idx, field, shard.toLong, body))
          case Array("index", idx, "shard", shard, "import-roaring") =>
            chk(ex, Some(idx), Auth.PermWrite)
            writeLock(idx)(importRoaringShard(idx, shard.toLong, body))
          case _ => sys.error(
            s"expected /index/{i}/query or /index/{i}/field/{f}/import, got ${ex.getRequestURI.getPath}")
        }
      }
    })
    // `GET /schema/details` (`http_handler.go:525`): /schema plus per-field
    // cardinality — one agg pass per table (approx_count_distinct: a
    // details probe, not an exact invariant, same spirit as the
    // reference's cached counts).
    server.createContext("/schema/details", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        val vis = readable(chk(ex, None, Auth.PermRead))
        import org.apache.spark.sql.functions.approx_count_distinct
        val indexes = graft.core.Tables.names.filter(vis).map { t =>
          val df = spark.table(graft.core.Idents.q(t))
          val fields = df.schema.fields.filter(_.name != "_id")
          // drop a memo whose shape no longer matches the schema — DDL can
          // arrive through /sql or gRPC without passing this facade's
          // invalidation hooks, and zipping a stale Row with a longer
          // field list would throw on a metadata probe
          val stale = Option(cardinalityCache.get(t)).exists(_.length != fields.length)
          if (stale) invalidateTableCaches(t)
          val cards = cardinalityCache.computeIfAbsent(t, _ =>
            df.select(fields.map(f =>
              approx_count_distinct(f.name).as(f.name)).toSeq: _*).collect()(0))
          val fieldJson = fields.zipWithIndex.map { case (f, i) =>
            s"""{"name":${js(f.name)},"options":{"type":${js(
              graft.sql.SystemTables.refType(f.dataType).toLowerCase)}},"cardinality":${cards.getLong(i)}}"""
          }
          s"""{"name":${js(t)},"fields":[${fieldJson.mkString(",")}]}"""
        }
        s"""{"indexes":[${indexes.mkString(",")}]}"""
      }
    })
    server.createContext("/schema", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
      if (ex.getRequestMethod == "POST") {
        // `POST /schema` (`http_handler.go:1161-1180` ApplySchema): create
        // every index + field in the posted schema; 204 on success
        chk(ex, None, Auth.PermAdmin)
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val root = mapper.readTree(body)
        val idxs = Option(root.get("indexes")).filter(_.isArray)
          .getOrElse(sys.error("decoding request as JSON Pilosa schema"))
        idxs.forEach { ix =>
          val name = Option(ix.get("name")).map(_.asText)
            .getOrElse(sys.error("index missing name"))
          if (!spark.catalog.tableExists(name))
            createIndex(name, Option(ix.get("options"))
              .map(o => s"""{"options":${o.toString}}""").getOrElse(""))
          Option(ix.get("fields")).filter(_.isArray).foreach(_.forEach { f =>
            val fname = Option(f.get("name")).map(_.asText)
              .getOrElse(sys.error("field missing name"))
            if (!spark.table(graft.core.Idents.q(name)).columns.contains(fname))
              createField(name, fname, Option(f.get("options"))
                .map(o => s"""{"options":${o.toString}}""").getOrElse(""))
          })
        }
        "" // → 204 No Content like the reference
      } else {
      // The SchemaInfo shape the reference Go client unmarshals
      // (`client.go:1666-1700` SchemaInfo/SchemaIndex/SchemaField):
      // fields carry an options envelope in the reference's field-type
      // vocabulary, and the index carries the shardWidth the client uses
      // to route imports.
      val vis = readable(chk(ex, None, Auth.PermRead)) // http_handler.go:524
      val indexes = allIndexNames.filter(vis).map(indexInfo)
      s"""{"indexes":[${indexes.mkString(",")}]}"""
    }}})
    // ANN serving surface: build a residual IVF-PQ index over a registered
    // table's embedding column, then query it with PER-REQUEST recall/
    // latency dials (nProbe, shortlist) — see [[AnnServe]] for the
    // documented tradeoffs. Engine-side extension (the reference has no
    // vector surface); admin-gated like /sql.
    server.createContext("/ann", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        chk(ex, None, Auth.PermAdmin)
        val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        (ex.getRequestMethod, parts) match {
          case ("POST", Array("ann", name, "build")) =>
            val n = mapper.readTree(body)
            def str(f: String, d: String): String =
              Option(n.get(f)).map(_.asText).getOrElse(
                if (d == null) sys.error(s"ann build: '$f' required") else d)
            def int(f: String, d: Int): Int =
              Option(n.get(f)).map(_.asInt).getOrElse(d)
            val (cells, rows) = AnnServe.build(spark, name,
              str("table", null), str("id", "_id"), str("vec", null),
              int("dim", 64), int("nCells", 64), int("m", 16), int("k", 256))
            s"""{"name":${js(name)},"cells":$cells,"rows":$rows}"""
          case ("POST", Array("ann", name, "append")) =>
            val n = mapper.readTree(body)
            val table = Option(n.get("table")).map(_.asText).getOrElse(
              sys.error("ann append: 'table' required"))
            val where = Option(n.get("where")).map(_.asText)
            val added = AnnServe.append(spark, name, table, where)
            s"""{"name":${js(name)},"appended":$added}"""
          case ("POST", Array("ann", name, "query")) =>
            val n = mapper.readTree(body)
            val qArr = Option(n.get("query")).filter(_.isArray)
              .getOrElse(sys.error("ann query: 'query' array required"))
            val q = (0 until qArr.size).map(i => qArr.get(i).asDouble.toFloat)
            def int(f: String, d: Int): Int =
              Option(n.get(f)).map(_.asInt).getOrElse(d)
            val exclude = Option(n.get("exclude")).map(_.asLong)
            val df = AnnServe.query(spark, name, q, int("k", 10),
              int("nProbe", 0), int("shortlist", 500), exclude)
            val rows = df.collect().map(r =>
              s"""{"id":${r.getLong(0)},"sim":${r.getDouble(1)}}""")
            s"""{"matches":[${rows.mkString(",")}]}"""
          // drift telemetry: residual-norm stats an operator reads to
          // decide WHEN to re-build (append degrades partial-probe recall
          // only as far as the distribution drifts from the fitted
          // centroids — see AnnServe.append)
          case ("GET", Array("ann", name)) => AnnServe.statsJson(name)
          case _ =>
            sys.error("use GET /ann/{name}, or POST /ann/{name}/build, " +
              "/ann/{name}/append or /ann/{name}/query")
        }
      }
    })
    // `GET /info` (`http_handler.go:522,1260`): node/system facts, admin
    server.createContext("/info", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        chk(ex, None, Auth.PermAdmin)
        val rt = Runtime.getRuntime
        s"""{"shardWidth":$ShardWidth,"cpuLogicalCores":${rt.availableProcessors},"memory":${rt.maxMemory}}"""
      }
    })
    // getStatusResponse shape (`http_handler.go:1264-1269`): one logical
    // node — Spark executors are the scale-out unit underneath. Read-level
    // like the reference router (`http_handler.go:523` chkAuthZ Read).
    server.createContext("/status", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        chk(ex, None, Auth.PermRead)
        // node uri block: the Go client's Status()/fetchPrimaryNode
        // (`client.go:629-648`, StatusNode `client.go:1643-1654`) routes
        // every primary-bound request through it
        // staleIndexes (graft extension): registrations whose maintenance
        // was refused and that decline serving until rebuilt — surfaced
        // here so an operator sees the needed rebuild without tailing
        // stderr (the reference has no analogous hazard; its fragments ARE
        // the storage)
        val stale = graft.plans.IndexRegistry.staleRecords(spark).map {
          case (kind, bp, key, idx, reason) =>
            s"""{"kind":${js(kind)},"basePath":${js(bp)},"key":${js(key)},""" +
              s""""indexPath":${js(idx)},"reason":${js(reason)}}"""
        }.mkString("[", ",", "]")
        s"""{"state":"NORMAL","nodes":[{"id":"local","state":"STARTED","isPrimary":true,"uri":$nodeUri}],"localID":"local","clusterName":"graft","staleIndexes":$stale}"""
      }
    })
    // The single-node answers to the Go client's shard-routing probes:
    // `/internal/fragment/nodes?shard=N&index=I` (`client.go:608-627`,
    // every shard lives here) and `/internal/shards/max` (`client.go:
    // 808-821`, max shard per index from the `_id` range)
    server.createContext("/internal/fragment/nodes", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        chk(ex, None, Auth.PermRead)
        s"""[{"uri":$nodeUri,"grpc-uri":$nodeUri}]"""
      }
    })
    server.createContext("/internal/shards/max", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        chk(ex, None, Auth.PermRead)
        import org.apache.spark.sql.functions.{col, max}
        val w = graft.pql.Compiler.ShardWidth
        val entries = allIndexNames.map { n =>
          // compute OUTSIDE computeIfAbsent: a Spark job must not run while
          // holding the map's bin lock, and a transient failure must not be
          // memoized as 0 (only successful probes are cached)
          val maxShard = Option(maxShardCache.get(n)).map(_.longValue()).getOrElse {
            val v: Option[Long] = try {
              val df = tableState(n)
              if (df.schema("_id").dataType ==
                  org.apache.spark.sql.types.LongType)
                Some(df.agg(max(col("_id"))).head.getAs[Any](0) match {
                  case l: java.lang.Long => l.longValue() / w
                  case _ => 0L
                })
              else Some(0L) // keyed index: key-hash shards unknowable here
            } catch { case e: Exception =>
              System.err.println(s"[graft-server] shards/max probe failed for '$n': ${e.getMessage}")
              None }
            v.foreach(x => maxShardCache.put(n, java.lang.Long.valueOf(x)))
            v.getOrElse(0L)
          }
          s"${js(n)}:$maxShard"
        }
        s"""{"standard":{${entries.mkString(",")}}}"""
      }
    })
    // `POST /internal/translate/index/{i}/keys/{find|create}` and
    // `/internal/translate/field/{i}/{f}/keys/{find|create}`
    // (`http_handler.go:574-579,3610-3691` handleFindOrCreateKeys): a JSON
    // string array in, `{key: id}` out — the reference batch ingester's
    // pre-translation surface (`client/client.go:1042-1140`). Ids come from
    // [[KeyTranslate]] (sequential per scope, warehouse-durable); error
    // shapes follow the handler exactly: 415 non-JSON Content-Type, 406
    // unacceptable Accept, 400 undecodable body, 500 "translating keys: …"
    // for translation-layer failures (`cluster.go:258-276,358-380,567-700`
    // wordings).
    server.createContext("/internal/translate", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        val pathSegs = ex.getRequestURI.getPath
          .stripPrefix("/internal/translate").stripPrefix("/").split("/")
        // `POST …/field/{i}/{f}/keys/like` (`http_handler.go:580,3691-3727`
        // handleMatchField, authz.Read): body is a RAW SQL-LIKE pattern
        // (`like.go` — `%` any run, `_` one char), answer is the JSON id
        // array of matching field keys in key order; a missing index/field
        // is the handler's blanket 500 (api.MatchField's nil-field error).
        if (pathSegs.length == 5 && pathSegs(0) == "field" &&
            pathSegs(3) == "keys" && pathSegs(4) == "like") {
          chk(ex, None, Auth.PermRead)
          if (!acceptsJson(ex)) throw PlainError(406, "Not acceptable")
          val (idx, f) = (pathSegs(1), pathSegs(2))
          val like = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          val fieldExists =
            (try Some(tableState(idx).schema)
             catch { case _: Exception => None })
              .exists(_.fields.exists(_.name == f))
          if (!fieldExists) throw PlainError(500, "failed to match pattern")
          val ids = keyTranslate.matchLike(s"fld:$idx/$f", like)
          // json.Encoder on Go's nil slice renders null
          if (ids.isEmpty) "null" else ids.mkString("[", ",", "]")
        } else {
        chk(ex, None, Auth.PermAdmin)
        if (Option(ex.getRequestHeaders.getFirst("Content-Type"))
              .getOrElse("") != "application/json")
          throw PlainError(415, "Unsupported media type")
        if (!acceptsJson(ex)) throw PlainError(406, "Not acceptable")
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val keys: Seq[String] =
          try {
            val node = mapper.readTree(body)
            require(node.isArray, "expected a JSON array of strings")
            node.elements().asScala.map(_.asText).toSeq
          } catch { case e: Exception =>
            throw PlainError(400, s"failed to decode request: ${msg(e)}")
          }
        def err500(m: String) = PlainError(500, s"translating keys: $m")
        import org.apache.spark.sql.types.{ArrayType, StringType, StructType}
        def isKeyedField(dt: org.apache.spark.sql.types.DataType): Boolean =
          dt match {
            case StringType                   => true // keyed mutex
            case ArrayType(StringType, _)     => true // stringset
            case ArrayType(s: StructType, _)  =>      // stringsetq
              s.fields.exists(f => f.name == "value" && f.dataType == StringType)
            case _                            => false
          }
        pathSegs match {
          case Array("index", idx, "keys", op) if op == "find" || op == "create" =>
            val sch =
              try tableState(idx).schema
              catch { case _: Exception => throw err500("index not found") }
            if (sch("_id").dataType != StringType)
              throw err500(s"cannot $op keys on unkeyed index ${js(idx)}")
            val m = if (op == "create") keyTranslate.create(s"idx:$idx", keys)
                    else keyTranslate.find(s"idx:$idx", keys)
            "{" + m.map { case (k, v) => s"${js(k)}:$v" }.mkString(",") + "}"
          case Array("field", idx, f, "keys", op) if op == "find" || op == "create" =>
            // holder.Field(index, field) answers nil for a missing index OR
            // field — both surface as "<f>: field not found" (api.go:2335)
            val fld =
              (try Some(tableState(idx).schema)
               catch { case _: Exception => None })
                .flatMap(_.fields.find(_.name == f))
                .getOrElse(throw err500(s"$f: field not found"))
            if (!isKeyedField(fld.dataType))
              throw err500(s"cannot $op keys on unkeyed field ${js(f)}")
            val m = if (op == "create") keyTranslate.create(s"fld:$idx/$f", keys)
                    else keyTranslate.find(s"fld:$idx/$f", keys)
            "{" + m.map { case (k, v) => s"${js(k)}:$v" }.mkString(",") + "}"
          case _ => throw PlainError(404, "404 page not found")
        }
        }
      }
    })
    // `GET /internal/index/{index}/shards` (`http_handler.go:570,1670-1689`
    // handleGetIndexAvailableShards): `{"shards":[...]}` — every shard with
    // data; a single node owns 0..maxShard contiguously.
    server.createContext("/internal/index", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        val segs = ex.getRequestURI.getPath
          .stripPrefix("/internal/index").stripPrefix("/").split("/")
        segs match {
          case Array(idx, "shards") =>
            chk(ex, Some(idx), Auth.PermRead)
            if (!acceptsJson(ex))
              throw PlainError(406, "JSON only acceptable response")
            s"""{"shards":[${(0L to maxShardOf(idx)).mkString(",")}]}"""
          case _ => throw PlainError(404, "404 page not found")
        }
      }
    })
    // `GET /internal/mem-usage` (`http_handler.go:560,1182-1199`,
    // `util.go:45-57`): host memory {capacity, totalUsed}; 406 unless the
    // Accept header admits JSON (validHeaderAcceptJSON)
    server.createContext("/internal/mem-usage", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        chk(ex, None, Auth.PermRead)
        if (!acceptsJson(ex)) throw PlainError(406, "JSON only acceptable response")
        val (cap, used) = hostMemory()
        s"""{"capacity":$cap,"totalUsed":$used}"""
      }
    })
    // `GET /internal/disk-usage[/{index}]` (`http_handler.go:558-559,
    // 1201-1224`, `util.go:59-84`): recursive byte size of the data dir
    // (the warehouse when durable, the parquet dir otherwise) or one
    // index's storage; a bad path answers 500 with the walk error like
    // Go's http.Error
    server.createContext("/internal/disk-usage", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        chk(ex, None, Auth.PermRead)
        if (!acceptsJson(ex)) throw PlainError(406, "JSON only acceptable response")
        val base = Option(spark.conf.get("spark.graft.warehouse", null))
          .getOrElse(dir)
        val rest = ex.getRequestURI.getPath
          .stripPrefix("/internal/disk-usage").stripPrefix("/")
        // `..` segments must not escape the data roots: a PermRead caller
        // could otherwise size (and expensively walk) arbitrary directories.
        val roots = Seq(base, dir).map(r =>
          java.nio.file.Paths.get(r).toAbsolutePath.normalize)
        def inRoots(p: java.nio.file.Path): Boolean = {
          val n = p.toAbsolutePath.normalize
          roots.exists(n.startsWith)
        }
        val target =
          if (rest.isEmpty) java.nio.file.Paths.get(base)
          else {
            val cands = Seq(
              java.nio.file.Paths.get(base, rest),
              java.nio.file.Paths.get(dir, s"$rest.parquet"),
              java.nio.file.Paths.get(dir, rest)).filter(inRoots)
            cands.find(java.nio.file.Files.exists(_)).getOrElse(
              throw PlainError(500, s"lstat $rest: no such file or directory"))
          }
        var size = 0L
        val st = java.nio.file.Files.walk(target)
        try st.forEach { p =>
          if (java.nio.file.Files.isRegularFile(p)) size += java.nio.file.Files.size(p)
        } finally st.close()
        s"""{"usage":$size}"""
      }
    })
    // `GET /internal/nodes` (`http_handler.go:2782-2797` handleGetNodes):
    // all cluster hosts — this single logical node
    server.createContext("/internal/nodes", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        chk(ex, None, Auth.PermRead)
        if (!acceptsJson(ex)) throw PlainError(406, "JSON only acceptable response")
        s"""[{"id":"local","state":"STARTED","isPrimary":true,"uri":$nodeUri,"grpc-uri":$nodeUri}]"""
      }
    })
    // `GET /internal/partition/nodes?partition=N` (`http_handler.go:564,
    // 2750-2778`): owner nodes of a key partition; non-numeric partition
    // answers the reference's own (mislabeled) 400 text
    server.createContext("/internal/partition/nodes", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        chk(ex, None, Auth.PermRead)
        if (!acceptsJson(ex)) throw PlainError(406, "JSON only acceptable response")
        val part = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").collectFirst { case s if s.startsWith("partition=") =>
            s.stripPrefix("partition=") }.getOrElse("")
        if (scala.util.Try(part.toLong).isFailure)
          throw PlainError(400, "shard should be an unsigned integer")
        s"""[{"id":"local","state":"STARTED","isPrimary":true,"uri":$nodeUri,"grpc-uri":$nodeUri}]"""
      }
    })
    // unauthenticated like the reference (`http_handler.go:541`)
    server.createContext("/version", handler { _ => """{"version":"graft-0.1"}""" })
    // embedded admin console at `/` + the reference's lattice mounts
    // (`http_handler.go:613-624`: `/`, `/static` prefix, favicons,
    // manifest, and the SPA routes rewritten to the page — statikHandler's
    // refresh behavior, `:921-927`). The JDK server's "/" context is the
    // fallback for every unmatched path, so this handler also owns the
    // router's 404 (gorilla mux's plain "404 page not found").
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        val isCurl = Option(ex.getRequestHeaders.getFirst("User-Agent"))
          .exists(_.startsWith("curl"))
        def send(code: Int, body: Array[Byte], ctype: String): Unit = {
          ex.getResponseHeaders.set("Content-Type", ctype)
          ex.sendResponseHeaders(code, body.length.toLong)
          ex.getResponseBody.write(body)
          ex.close()
        }
        def text(code: Int, s: String): Unit =
          send(code, (s + "\n").getBytes(UTF_8), "text/plain; charset=utf-8")
        val uiPaths = "/" +: AdminUi.LatticeRoutes
        path match {
          case p if uiPaths.contains(p) =>
            // curl gets the reference's 404 welcome line, a browser the
            // console (`http_handler.go:904-911`)
            if (isCurl) text(404, AdminUi.curlWelcome("v0.1"))
            else send(200, AdminUi.page("graft-0.1").getBytes(UTF_8),
              "text/html; charset=utf-8")
          case "/favicon.svg" =>
            send(200, AdminUi.faviconSvg.getBytes(UTF_8), "image/svg+xml")
          case "/favicon.png" => // single-file UI: the svg serves both
            send(200, AdminUi.faviconSvg.getBytes(UTF_8), "image/svg+xml")
          case "/manifest.json" =>
            send(200, AdminUi.manifest.getBytes(UTF_8), "application/json")
          case p if p.startsWith("/static") =>
            // the console is one self-contained page — no asset tree
            text(404, "static asset not found")
          case _ => text(404, "404 page not found")
        }
      }
    })
    // `GET /health` (`http_handler.go:606,4189-4191`): bare 200, no auth —
    // the load-balancer liveness probe must work before tokens do
    server.createContext("/health", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        ex.sendResponseHeaders(200, -1L); ex.close()
      }
    })
    // `GET /cpu-profile/start|stop` (`http_handler.go:596-597,1624-1668`,
    // admin): the reference buffers a Go pprof CPU profile between the two
    // calls; the JVM-native artifact is a JFR recording under the JDK's
    // "profile" configuration — same lifecycle, same error wordings, same
    // attachment response shape; the bytes are .jfr (JDK Mission Control /
    // `jfr print`) instead of pprof protobuf, the one divergence a Go
    // runtime's absence forces.
    server.createContext("/cpu-profile/start", new HttpHandler {
      def handle(ex: HttpExchange): Unit =
        try {
          chk(ex, None, Auth.PermAdmin)
          val r = new jdk.jfr.Recording(
            jdk.jfr.Configuration.getConfiguration("profile"))
          if (!cpuProfile.compareAndSet(null, r)) {
            r.close()
            plainError(ex, 400, "cpu profile already in progress")
          } else {
            try r.start()
            catch { case e: Exception =>
              cpuProfile.set(null); r.close()
              plainError(ex, 400, msg(e)); return }
            ex.sendResponseHeaders(200, -1L); ex.close()
          }
        } catch {
          case e: Auth.AuthError => plainError(ex, 403, msg(e))
          case e: Exception      => plainError(ex, 400, msg(e))
        }
    })
    server.createContext("/cpu-profile/stop", new HttpHandler {
      def handle(ex: HttpExchange): Unit =
        try {
          chk(ex, None, Auth.PermAdmin)
          val r = cpuProfile.getAndSet(null)
          if (r == null) plainError(ex, 400, "no cpu profile in progress")
          else {
            r.stop()
            val tmp = java.nio.file.Files.createTempFile("graft-cpu", ".jfr")
            try {
              r.dump(tmp)
              val by = java.nio.file.Files.readAllBytes(tmp)
              // `http_handler.go:1647-1662`: pprof-handler response shape
              ex.getResponseHeaders.set("Content-Disposition",
                "attachment; filename=\"profile\"")
              ex.getResponseHeaders.set("Content-Type", "application/octet-stream")
              ex.getResponseHeaders.set("X-Content-Type-Options", "nosniff")
              ex.sendResponseHeaders(200, by.length.toLong)
              ex.getResponseBody.write(by)
              ex.close()
            } finally { r.close(); java.nio.file.Files.deleteIfExists(tmp) }
          }
        } catch {
          case e: Auth.AuthError => plainError(ex, 403, msg(e))
          case e: Exception      => plainError(ex, 400, msg(e))
        }
    })
    // `GET /debug/pprof/…` (`http_handler.go:493` mounts Go's
    // net/http/pprof mux): the two JVM analogues that answer the same
    // operator questions — `goroutine` as a full thread dump and `heap`
    // as the memory-pool table, both plain text. The reference mounts
    // these UNAUTHENTICATED; stacks are internals, so ours require admin
    // when auth is enabled (documented hardening divergence).
    server.createContext("/debug/pprof/", new HttpHandler {
      def handle(ex: HttpExchange): Unit =
        try {
          chk(ex, None, Auth.PermAdmin)
          import scala.jdk.CollectionConverters._
          val sb = new StringBuilder
          ex.getRequestURI.getPath.stripPrefix("/debug/pprof/") match {
            case "goroutine" =>
              val all = Thread.getAllStackTraces.asScala.toSeq
                .sortBy(_._1.getName)
              sb.append(s"threads: ${all.size}\n\n")
              all.foreach { case (t, frames) =>
                sb.append(s"${t.getName} [${t.getState}]" +
                  s"${if (t.isDaemon) " daemon" else ""}\n")
                frames.foreach(f => sb.append(s"\t$f\n"))
                sb.append("\n")
              }
            case "heap" =>
              val heap = java.lang.management.ManagementFactory
                .getMemoryMXBean.getHeapMemoryUsage
              sb.append(s"heap: used=${heap.getUsed} " +
                s"committed=${heap.getCommitted} max=${heap.getMax}\n")
              java.lang.management.ManagementFactory.getMemoryPoolMXBeans
                .asScala.foreach { p =>
                  val u = p.getUsage
                  sb.append(s"pool ${p.getName}: used=${u.getUsed} " +
                    s"committed=${u.getCommitted}\n")
                }
            case _ => plainError(ex, 404, "404 page not found"); return
          }
          val by = sb.toString.getBytes(UTF_8)
          ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
          ex.sendResponseHeaders(200, by.length.toLong)
          ex.getResponseBody.write(by)
          ex.close()
        } catch {
          case e: Auth.AuthError => plainError(ex, 403, msg(e))
          case e: Exception      => plainError(ex, 400, msg(e))
        }
    })
    // `GET /userinfo` (`http_handler.go:603,4002-4020`): 204 with auth off,
    // else the authenticated caller's identity
    server.createContext("/userinfo", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        auth match {
          case None => "" // → 204 No Content like the reference
          case Some(cfg) =>
            val bearer = Option(ex.getRequestHeaders.getFirst("Authorization"))
              .map(_.stripPrefix("Bearer ").trim).filter(_.nonEmpty)
              .getOrElse(throw new Auth.AuthError("auth token is empty"))
            val u = cfg.verifier.authenticate(bearer)
            s"""{"userid":${js(u.userId)},"username":${js(u.userName)}}"""
        }
      }
    })
    // `GET /metrics` — Prometheus text, unauthenticated like the
    // reference's promhttp mount (`http_handler.go:495`)
    server.createContext("/metrics", new HttpHandler {
      def handle(ex: HttpExchange): Unit =
        if (ex.getRequestURI.getPath == "/metrics.json") respond(ex) {
          // `/metrics.json` is Admin (`http_handler.go:497`)
          chk(ex, None, Auth.PermAdmin)
          val rows = (graft.core.Metrics.snapshot ++ graft.core.Metrics.gauges)
            .map { case (n, v) => s"${js(n)}:$v" }
          s"""{"local":{${rows.mkString(",")}}}"""
        } else {
          val bytes = graft.core.Metrics.prometheus.getBytes(UTF_8)
          ex.getResponseHeaders.set("Content-Type",
            "text/plain; version=0.0.4; charset=utf-8")
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
    })
    // `GET /export?index=i&field=f&shard=s`, Accept: text/csv
    // (`http_handler.go:2687-2718`, `api.go:797-860` ExportCSV): one line per
    // bit of the standard view — `value,recordId` (keys verbatim, sets one
    // line per member). Streamed via toLocalIterator: a shard is ≤ 2^20
    // records, never the whole table.
    server.createContext("/export", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        if (!Option(ex.getRequestHeaders.getFirst("Accept")).contains("text/csv"))
          sys.error("Not acceptable")
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        val params = q.split("&").filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2); k -> v
        }.toMap
        val idx = params.getOrElse("index", sys.error("index required"))
        val field = params.getOrElse("field", sys.error("field required"))
        val shard = params.getOrElse("shard", sys.error("invalid shard")).toLong
        chk(ex, Some(idx), Auth.PermRead) // http_handler.go:498
        exportCsv(idx, field, shard)
      }
    })
    // query tracker endpoints (`http_handler.go:534,540`, admin)
    server.createContext("/queries", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        chk(ex, None, Auth.PermAdmin)
        import scala.jdk.CollectionConverters._
        s"""{"queries":[${activeQueries.entrySet.asScala.toSeq.sortBy(_.getKey)
          .map(e => queryJson(e.getValue, past = false, id = e.getKey))
          .mkString(",")}]}"""
      }
    })
    // POST /queries/cancel?id=N (admin; engine-native extension): explicit
    // cancellation of an in-flight query by the id /queries reports. The
    // reference cancels by killing the client connection (Go's http server
    // cancels r.Context(), validateQueryContext turns it into
    // ErrQueryCancelled, executor.go:8165-8180); JDK HttpServer gives the
    // handler no disconnect signal, so an admin names the query instead.
    // Same downstream semantics: the job group dies, the cores free, the
    // caller gets `{"error":"query cancelled"}` (pilosa.go:55 wording).
    server.createContext("/queries/cancel", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        chk(ex, None, Auth.PermAdmin)
        val id = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").collectFirst { case s if s.startsWith("id=") =>
            s.drop(3).toLong }
          .getOrElse(sys.error("id required"))
        activeCtl.get(id) match {
          case null => throw PlainError(404, s"no active query $id")
          case ctl  => ctl.killWith("query cancelled"); s"""{"cancelled":$id}"""
        }
      }
    })
    server.createContext("/query-history", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        chk(ex, None, Auth.PermAdmin)
        import scala.jdk.CollectionConverters._
        s"""[${pastQueries.iterator.asScala.map(queryJson(_, past = true)).mkString(",")}]"""
      }
    })
    // `POST /recalculate-caches` (`http_handler.go:528`, admin): the
    // reference rebuilds TopN ranked caches; our TopN/TopK are exact (no
    // cache), so the contract is an immediate success ack. Also drops the
    // /schema/details cardinality memo so the next probe recomputes.
    server.createContext("/recalculate-caches", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        chk(ex, None, Auth.PermAdmin)
        cardinalityCache.clear(); maxShardCache.clear()
        graft.core.Metrics.inc(graft.core.Metrics.RecalculateCache)
        ""
      }
    })
    // `/transaction*` (`http_handler.go:528-533`): named transactions with
    // exclusive-activation semantics (`transaction.go:20-45`). Spark jobs
    // are independently atomic here, so the registry provides the reference
    // wire contract (create/inspect/finish/list), not a lock the engine
    // needs.
    server.createContext("/transactions", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        chk(ex, None, Auth.PermRead) // http_handler.go:534 chkAuthZ Read
        import scala.jdk.CollectionConverters._
        s"""{"transactions":[${transactions.values.asScala.map(txJson).mkString(",")}]}"""
      }
    })
    // `GET /ui/transaction[/]` (`http_handler.go:544-545,2333-2366`
    // handleGetTransactionList): the same registry as a JSON ARRAY in
    // creation order (the reference sorts by CreatedAt; `seq` is ours)
    server.createContext("/ui/transaction", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        chk(ex, None, Auth.PermRead)
        if (!acceptsJson(ex))
          throw PlainError(406, "JSON only acceptable response")
        import scala.jdk.CollectionConverters._
        transactions.values.asScala.toSeq.sortBy(_.seq)
          .map(txJson).mkString("[", ",", "]")
      }
    })
    // `GET /ui/shard-distribution` (`http_handler.go:546,1226-1233`;
    // `api.go:2038-2051` ShardDistribution, `cluster.go:174-205`
    // shardDistributionByIndex): {index: {nodeID: {"primary-shards":[…],
    // "replica-shards":[…]}}} — one node here, so it owns every shard as
    // primary and replicas are empty
    server.createContext("/ui/shard-distribution", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        chk(ex, None, Auth.PermAdmin)
        val dist = allIndexNames.sorted.map { idx =>
          val shards = (0L to maxShardOf(idx)).mkString(",")
          s"""${js(idx)}:{"local":{"primary-shards":[$shards],"replica-shards":[]}}"""
        }
        dist.mkString("{", ",", "}")
      }
    })
    server.createContext("/transaction", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex) {
        chk(ex, None, Auth.PermRead) // http_handler.go:528-533 chkAuthZ Read
        val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
        (ex.getRequestMethod, parts) match {
          case ("POST", Array("transaction", id, "finish")) =>
            val tx = Option(transactions.remove(id))
              .getOrElse(sys.error(s"transaction with id $id not found"))
            graft.core.Metrics.inc(graft.core.Metrics.TransactionEnd)
            // `reference/transaction.go` finish: once nothing is active,
            // the OLDEST queued exclusive activates; with no exclusive
            // queued, every blocked non-exclusive resumes
            transactions.synchronized {
              import scala.jdk.CollectionConverters._
              if (!transactions.values.asScala.exists(_.active)) {
                val pending = transactions.values.asScala.toSeq.sortBy(_.seq)
                pending.find(_.exclusive) match {
                  case Some(e) => transactions.put(e.id, e.copy(active = true))
                  case None => pending.foreach(t =>
                    transactions.put(t.id, t.copy(active = true)))
                }
              }
            }
            s"""{"transaction":${txJson(tx)}}"""
          case ("GET", Array("transaction", id)) =>
            val tx = Option(transactions.get(id))
              .getOrElse(sys.error(s"transaction with id $id not found"))
            s"""{"transaction":${txJson(tx)}}"""
          case ("POST", Array("transaction", rest @ _*)) =>
            val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
            val node = if (body.isEmpty) mapper.createObjectNode()
                       else mapper.readTree(body)
            val timeout = Option(node.get("timeout")).map(_.asLong(0)).getOrElse(0L)
            if (timeout == 0) sys.error("timeout is required and cannot be 0")
            val id = rest.headOption.getOrElse(
              Option(node.get("id")).map(_.asText)
                .filter(_.nonEmpty)
                .getOrElse(java.util.UUID.randomUUID().toString))
            if (transactions.containsKey(id))
              sys.error(s"transaction with id $id already exists")
            val exclusive = Option(node.get("exclusive")).exists(_.asBoolean(false))
            val tx = transactions.synchronized {
              import scala.jdk.CollectionConverters._
              // an exclusive transaction is active only when alone, and ANY
              // new transaction queues behind an exclusive one whether that
              // exclusive is active OR still waiting (`transaction.go:
              // 24-31`) — otherwise a stream of non-exclusive arrivals
              // keeps jumping the queue and the exclusive never activates
              val exclusivePresent =
                transactions.values.asScala.exists(_.exclusive)
              val active =
                if (exclusive) transactions.isEmpty else !exclusivePresent
              val t = Tx(id, active, exclusive, timeout, txSeq.incrementAndGet())
              transactions.put(id, t)
              graft.core.Metrics.inc(graft.core.Metrics.TransactionStart)
              t
            }
            s"""{"transaction":${txJson(tx)}}"""
          case (m, p) => sys.error(s"unsupported $m ${p.mkString("/")}")
        }
      }
    })
    // concurrent request handling (the reference's HTTP server is
    // concurrent by default); per-table write locks above keep mutations
    // serializable
    requestPool = java.util.concurrent.Executors.newFixedThreadPool(8)
    server.setExecutor(requestPool)
    server.start()
    server.getAddress.getPort
  }

  private var requestPool: java.util.concurrent.ExecutorService = null

  def stop(): Unit = {
    // unregister from the SHARED session: specs start many facades on one
    // SparkContext, and leaked listeners would accumulate per facade
    spark.sparkContext.removeSparkListener(jobSpans)
    watchdog.shutdownNow()
    server.stop(0)
    // HttpServer.stop does NOT stop its executor: the 8 NON-DAEMON pool
    // threads outlive the facade — 8 leaked threads per serving bounce,
    // and a plain main() that booted a facade never exits the JVM (found
    // by Verify hanging after the /ann oracle row)
    if (requestPool != null) requestPool.shutdown()
  }

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
    // keyed targets: a roaring payload carries TRANSLATED ids (the batch
    // ingester pre-translates keys through /internal/translate/... and
    // builds bitmaps over the returned uint64s, `batch/batch.go:1380-1470`)
    // — map record positions and row ids back through [[KeyTranslate]] so
    // the fbbatch flow round-trips: CreateIndexKeys → import-roaring →
    // query by key.
    val idKeyed = t.schema("_id").dataType ==
      org.apache.spark.sql.types.StringType
    val fldKeyed = t.schema(field).dataType match {
      case org.apache.spark.sql.types.StringType => true
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }
    def recKey(id: Long): String =
      keyTranslate.keyOf(s"idx:$idx", id).getOrElse(
        sys.error(s"translating id $id: key not found"))
    def rowKey(r: Long): String =
      keyTranslate.keyOf(s"fld:$idx/$field", r).getOrElse(
        sys.error(s"translating row $r: key not found"))
    var next = t
    var bits = 0L
    val touchedL = scala.collection.mutable.LinkedHashSet.empty[Long]
    val touchedS = scala.collection.mutable.LinkedHashSet.empty[String]
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
      // translate each bit's record id ONCE and reuse the mapped tuples for
      // the touched set — recKey holds the KeyTranslate lock, so a second
      // per-bit pass doubled time under it on the bulk-ingest hot path
      val keyed = if (idKeyed) buf.toSeq.map(x => (recKey(x._1), x._2, x._3))
                  else Seq.empty
      val writes = (idKeyed, fldKeyed) match {
        case (false, false) => buf.toSeq.toDF("_id", "value", "seq")
        case (true, false)  => keyed.toDF("_id", "value", "seq")
        case (false, true) =>
          buf.toSeq.map(x => (x._1, rowKey(x._2), x._3)).toDF("_id", "value", "seq")
        case (true, true) =>
          keyed.map(x => (x._1, rowKey(x._2), x._3)).toDF("_id", "value", "seq")
      }
      next =
        if (action == "clear") graft.core.Mutation.clearBulk(next, field, writes)
        else graft.core.Mutation.setBulk(next, field, writes)
      if (idKeyed) touchedS ++= keyed.map(_._1)
      else touchedL ++= buf.map(_._1)
      bits += seq
    }
    commitState(idx, next,
      touched = Some(if (idKeyed) touchedS.toSeq.toDF("_id")
                     else touchedL.toSeq.toDF("_id")))
    graft.core.Metrics.add(graft.core.Metrics.ImportedN, bits)
    s"""{"imported":true,"bits":$bits}"""
  }

  // --------------------------------------------------- export/transactions

  /** `reference/transaction.go:20-45` wire fields; `seq` is creation order
    * for oldest-pending-exclusive activation (not on the wire). */
  private case class Tx(id: String, active: Boolean, exclusive: Boolean,
                        timeout: Long, seq: Long = 0L)
  private val transactions =
    new java.util.concurrent.ConcurrentHashMap[String, Tx]
  private val txSeq = new java.util.concurrent.atomic.AtomicLong

  private def txJson(t: Tx): String =
    s"""{"id":${js(t.id)},"active":${t.active},"exclusive":${t.exclusive},"timeout":${t.timeout}}"""

  /** `value,recordId` CSV lines for one field × shard (the reference's
    * per-fragment `fn(rowID, columnID)` dump, `api.go:842-848`). */
  private def exportCsv(idx: String, field: String, shard: Long): String = {
    import org.apache.spark.sql.functions._
    val t = tableState(idx)
    val isSet = t.schema(field).dataType
      .isInstanceOf[org.apache.spark.sql.types.ArrayType]
    val inShard = t.filter(col("_id") >= shard * ShardWidth &&
      col("_id") < (shard + 1) * ShardWidth)
    val rows =
      if (isSet) inShard.select(explode(col(field)).as("v"), col("_id"))
      else inShard.filter(col(field).isNotNull).select(col(field).as("v"), col("_id"))
    val sb = new StringBuilder
    val it = rows.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      sb.append(String.valueOf(r.get(0))).append(',')
        .append(String.valueOf(r.get(1))).append('\n')
    }
    sb.toString
  }

  /** `POST /index/{i}/shard/{s}/import-roaring` (`http_handler.go:3414`,
    * `handler.go:459-493` ImportRoaringShardRequest): updates for MULTIPLE
    * fields applied in one transaction. JSON envelope mirroring the proto:
    * `{"views":[{"field":f,"view":"standard","set":b64,"clear":b64,
    * "clearRecords":bool}]}`. All updates chain onto one successor state and
    * commit with a single swap — per-shard atomicity like the reference's
    * single Tx. */
  private def importRoaringShard(idx: String, shard: Long, body: String): String = {
    import spark.implicits._
    val t = tableState(idx)
    val node = mapper.readTree(body)
    val views = Option(node.get("views")).filter(_.isArray)
      .getOrElse(sys.error("""body must carry {"views":[...]}"""))
    var next = t
    var bits = 0L
    val touchedIds = scala.collection.mutable.LinkedHashSet.empty[Long]
    views.forEach { v =>
      val field = Option(v.get("field")).map(_.asText)
        .getOrElse(sys.error("view update missing field"))
      val view = Option(v.get("view")).map(_.asText).getOrElse("standard")
      require(view == "standard",
        s"only the standard view is supported, got '$view'")
      val clearRecords = Option(v.get("clearRecords")).exists(_.asBoolean(false))
      def decode(key: String): Option[Seq[(Long, Long, Long)]] =
        Option(v.get(key)).map { b64 =>
          val bm = graft.index.Bitmap.deserialize(
            java.util.Base64.getDecoder.decode(b64.asText))
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          val it = bm.getLongIterator
          var seq = 0L
          while (it.hasNext) {
            val p = it.next()
            buf += ((shard * ShardWidth + p % ShardWidth, p / ShardWidth, seq))
            seq += 1
          }
          buf.toSeq
        }
      decode("clear").foreach { ps =>
        bits += ps.length
        touchedIds ++= ps.map(_._1)
        if (clearRecords)
          // Clear is a single row of record bits subtracted from every row
          // (`handler.go:489-492`): null the whole field for those records
          next = graft.core.Mutation.storeIds(next,
            ps.map(_._1).distinct.toDF("_id"), field,
            org.apache.spark.sql.functions.lit(null))
        else
          next = graft.core.Mutation.clearBulk(next, field,
            ps.toDF("_id", "value", "seq"))
      }
      decode("set").foreach { ps =>
        bits += ps.length
        touchedIds ++= ps.map(_._1)
        next = graft.core.Mutation.setBulk(next, field,
          ps.toDF("_id", "value", "seq"))
      }
    }
    commitState(idx, next, touched = Some(touchedIds.toSeq.toDF("_id")))
    graft.core.Metrics.add(graft.core.Metrics.ImportedN, bits)
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
    graft.core.Metrics.inc(graft.core.Metrics.CreateIndex)
    success(idx)
  }

  /** `DELETE /index/{i}` (`http_handler.go:1879-1890`). */
  private def dropIndex(idx: String): String = {
    graft.sql.Ddl.run(spark, s"DROP TABLE $idx")
    state.remove(idx)
    invalidateTableCaches(idx)
    graft.core.Metrics.inc(graft.core.Metrics.DeleteIndex)
    success(idx)
  }

  /** Every index the serving surface knows: the parquet test tables plus
    * DDL-created catalog tables, minus fb_* system views and CREATE VIEW
    * definitions (the reference's /schema lists indexes, not views). A
    * driver-side catalog listing — no Spark job. */
  /** Highest `_id`-range shard with data; a single node owns 0..maxShard
    * contiguously (keyed tables collapse to shard 0 on this node). */
  private def maxShardOf(idx: String): Long = {
    // a MISSING index must keep throwing (the shards endpoint 400s on it),
    // but an EXISTING one the probe can't read — a foreign temp view with
    // no `_id` (any Spark user can create one on the shared session) or
    // backing files gone — reports shard 0 instead of failing the whole
    // diagnostics response (same graceful-skip as the shards/max probe)
    val df = tableState(idx)
    try {
      if (df.schema.fields.exists(f => f.name == "_id" &&
          f.dataType == org.apache.spark.sql.types.LongType))
        Option(df.agg(org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.col("_id"))).head.get(0))
          .map { case l: java.lang.Long =>
            l.longValue / graft.pql.Compiler.ShardWidth }
          .getOrElse(0L)
      else 0L
    } catch { case e: Exception =>
      System.err.println(
        s"[graft-server] shard-distribution probe failed for '$idx': ${e.getMessage}")
      0L
    }
  }

  private def allIndexNames: Seq[String] = {
    // SessionCatalog API: pure driver-side metadata (the Dataset-returning
    // spark.catalog.listTables would launch a Spark job per probe)
    val cat = spark.sessionState.catalog.listTables("default").map(_.table)
      .filterNot(_.startsWith("fb_"))
      .filterNot(graft.sql.Ddl.viewDefs.contains)
    (graft.core.Tables.names ++ cat).distinct
  }

  /** FieldInfo.Options (`reference/field.go:2166-2198`) in the reference's
    * field-type vocabulary (`field.go:43-49`) — the reference has no
    * "string" field type: keyed scalars are mutex with keys:true, keyed
    * sets set with keys:true. `keys` has no omitempty tag, so it is always
    * present, matching the reference's marshaling. */
  private def fieldOptions(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType                 => """{"type":"mutex","keys":true}"""
      case LongType | IntegerType | ShortType
                                      => """{"type":"int","keys":false}"""
      case BooleanType                => """{"type":"bool","keys":false}"""
      case TimestampType              => """{"type":"timestamp","keys":false}"""
      case d: DecimalType => s"""{"type":"decimal","scale":${d.scale},"keys":false}"""
      case DoubleType | FloatType     => """{"type":"decimal","scale":4,"keys":false}"""
      case ArrayType(StringType, _)   => """{"type":"set","keys":true}"""
      case ArrayType(LongType, _)     => """{"type":"set","keys":false}"""
      case ArrayType(_: StructType, _) => """{"type":"time","keys":true}"""
      case other => s"""{"type":${js(other.simpleString)},"keys":false}"""
    }
  }

  /** `GET /index/{i}` (`http_handler.go:1718-1742`): the IndexInfo shape
    * (name, options, fields-with-options, shardWidth — the width the Go
    * client uses to route imports, `client.go:1677`); 404 when absent. */
  private def indexInfo(idx: String): String = {
    val df =
      try tableState(idx)
      catch { case _: Exception => sys.error(s"Index $idx Not Found") }
    val fields = df.schema.fields.filter(_.name != "_id").map { f =>
      s"""{"name":${js(f.name)},"options":${fieldOptions(f.dataType)}}"""
    }
    s"""{"name":${js(idx)},"options":{"keys":${
      df.schema.fields.exists(f => f.name == "_id" &&
        f.dataType == org.apache.spark.sql.types.StringType)},"trackExistence":true},"fields":[${
      fields.mkString(",")}],"shardWidth":${graft.pql.Compiler.ShardWidth}}"""
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
    invalidateTableCaches(idx)
    graft.core.Metrics.inc(graft.core.Metrics.CreateField)
    success(field)
  }

  /** `DELETE /index/{i}/field/{f}` (`http_handler.go:516` DeleteField). */
  private def dropField(idx: String, field: String): String = {
    graft.sql.Ddl.run(spark, s"ALTER TABLE $idx DROP COLUMN $field")
    state.remove(idx)
    invalidateTableCaches(idx)
    graft.core.Metrics.inc(graft.core.Metrics.DeleteField)
    success(field)
  }

  private def handler(f: String => String): HttpHandler = new HttpHandler {
    def handle(ex: HttpExchange): Unit = respond(ex) {
      f(new String(ex.getRequestBody.readAllBytes(), UTF_8))
    }
  }

  /** POST /index/{i}/query in the Go client's protobuf mode
    * (`reference/client/client.go:281-313`): pb.QueryRequest body,
    * pb.QueryResponse answer with Content-Type `application/protobuf`
    * (`reference/http_handler.go:2593-2599`; we always answer protobuf in
    * this mode — the reference would render JSON on an explicit
    * `Accept: application/json`, which the client never sends).
    * QueryRequest.Shards prunes execution to `_id` shard ranges exactly
    * like Options(shards=); combined with writes it errors rather than
    * committing a shard-filtered state. */
  private def protoQuery(ex: HttpExchange, idx: String,
                         body: Array[Byte]): Unit = {
    graft.core.Metrics.inc(graft.core.Metrics.HttpRequest)
    val (code, payload) =
      try {
        val (query, shards) = PbQuery.decodeRequest(body)
        val writes = graft.pql.Pql.writeCallN(query) > 0
        graft.core.Metrics.inc(graft.core.Metrics.PqlQueries)
        val uinfo =
          chk(ex, Some(idx), if (writes) Auth.PermWrite else Auth.PermRead)
        logQuery(ex, uinfo, idx, query)
        if (shards.nonEmpty && writes)
          sys.error("shards restriction unsupported on write programs")
        val calls = graft.pql.Parser.parse(query)
        def run(): Array[Byte] =
          if (durable) {
            val rs = graft.pql.Pql.programResultsDurable(spark, idx, query)
            if (writes) invalidateTableCaches(idx)
            PbQuery.encodeResponse(calls.zip(rs), MaxWireRows)
          } else {
            import org.apache.spark.sql.functions.col
            val base0 = tableState(idx)
            val base =
              if (shards.isEmpty) base0
              else {
                val w = graft.pql.Compiler.ShardWidth
                base0.filter(shards.map(s =>
                  col("_id") >= s * w && col("_id") < (s + 1) * w)
                  .reduceLeft(_ || _))
              }
            val (rs, next) = graft.pql.Pql.programResults(base, idx, query)
            val wire = PbQuery.encodeResponse(calls.zip(rs), MaxWireRows)
            if (writes) commitState(idx, next)
            wire
          }
        (200, tracked(query, "", idx) {
          if (writes) writeLock(idx)(run()) else run()
        })
      } catch {
        case e: Auth.AuthError => (403, PbQuery.errResponse(msg(e)))
        case e: Throwable      => (400, PbQuery.errResponse(msg(e)))
      }
    ex.getResponseHeaders.set("Content-Type", "application/protobuf")
    ex.sendResponseHeaders(code, payload.length.toLong)
    ex.getResponseBody.write(payload)
    ex.close()
  }

  /** POST /index/{i}/field/{f}/import in the Go client's protobuf mode
    * (`client.go:509-607` EncodeImport/EncodeImportValues →
    * `http_handler.go:3040-3147` handlePostImport). The client encodes
    * `pb.ImportRequest` for set/mutex columns — RowIDs/RowKeys are the
    * VALUES, ColumnIDs/ColumnKeys the record ids — and
    * `pb.ImportValueRequest` for int/decimal/timestamp columns
    * (ColumnIDs + Values/FloatValues/StringValues); the server picks the
    * unmarshal type from the target column's type the same way the
    * reference picks from `field.Type()`. `?clear=true` routes through
    * clearBulk like the handler's OptImportOptionsClear. Success answers
    * the reference's `importOk` — a marshaled `ImportResponse{Err:""}`,
    * which is zero bytes — with 200; errors follow the handler's
    * `http.Error` shape (406 non-protobuf Accept, 404 unknown index/field,
    * 400 undecodable body).
    *
    * One divergence, inherent to the storage mapping: an unkeyed mutex
    * ("ID") column and an int (BSI) column are both LongType here, so both
    * decode as ImportValueRequest; a client importing an unkeyed-mutex
    * field with ImportRequest framing is mis-read (keyed mutex — STRING —
    * columns take the ImportRequest path correctly). */
  /** Shared rim of the protobuf-mode write routes: auth + the reference's
    * `validateProtobufHeader` Accept check (`http_handler.go:2621-2629`),
    * Go `http.Error`-shaped failures, and the zero-byte 200 ack (importOk —
    * a marshaled `ImportResponse{Err:""}` is empty). */
  /** Route-level Go-`http.Error` shape (for failures before a handler's own
    * error machinery is in scope, e.g. a malformed shard path segment). */
  private def plainError(ex: HttpExchange, code: Int, text: String): Unit = {
    val bytes = (text + "\n").getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
    ex.getResponseHeaders.set("X-Content-Type-Options", "nosniff")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def protoWrite(ex: HttpExchange, idx: String)(f: => Unit): Unit = {
    graft.core.Metrics.inc(graft.core.Metrics.HttpRequest)
    val outcome: Either[PlainError, Unit] =
      try {
        chk(ex, Some(idx), Auth.PermWrite)
        if (Option(ex.getRequestHeaders.getFirst("Accept"))
              .getOrElse("") != "application/x-protobuf")
          throw PlainError(406, "Not acceptable")
        f
        Right(())
      } catch {
        case e: PlainError     => Left(e)
        case e: Auth.AuthError => Left(PlainError(403, msg(e)))
        case e: Throwable      => Left(PlainError(400, msg(e)))
      }
    outcome match {
      case Left(PlainError(code, text)) =>
        val bytes = (text + "\n").getBytes(UTF_8)
        ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
        ex.getResponseHeaders.set("X-Content-Type-Options", "nosniff")
        ex.sendResponseHeaders(code, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
      case Right(()) =>
        ex.sendResponseHeaders(200, -1L)
    }
    ex.close()
  }

  private def protoImport(ex: HttpExchange, idx: String, field: String,
                          body: Array[Byte]): Unit = protoWrite(ex, idx) {
    import org.apache.spark.sql.types._
    {
        val schema =
          try tableState(idx).schema
          catch { case _: Exception => throw PlainError(404, "index not found") }
        val fld = schema.fields.find(_.name == field).getOrElse(
          throw PlainError(404, "field not found"))
        val doClear = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").contains("clear=true")
        val m = new PbQuery.ImportMsg(body)
        // (record id, value) pairs by column type, stringified onto the
        // same bulk path as the CSV wire (setBulk casts to the column
        // type). Decode shapes are shared with /import-atomic-record
        // ([[PbQuery.valuePairs]]/[[PbQuery.rowPairs]]); the value path
        // additionally tolerates ImportRequest framing for unkeyed MUTEX
        // columns (they share LongType with INT, so this type dispatch
        // can't distinguish — rowIdFallback reads RowIDs(4) as values
        // when no value list is present).
        val pairs: Seq[(String, String)] = fld.dataType match {
          case LongType | IntegerType | ShortType | DoubleType | FloatType |
               TimestampType | _: DecimalType =>
            PbQuery.valuePairs(m, rowIdFallback = true)
          case _ => // keyed mutex / string / set columns: ImportRequest
            PbQuery.rowPairs(m)
        }
        writeLock(idx) {
          val t = tableState(idx)
          import spark.implicits._
          val writes = pairs.zipWithIndex
            .map { case ((id, v), i) => (id, v, i.toLong) }
            .toDF("_id", "value", "seq")
          val next =
            if (doClear) graft.core.Mutation.clearBulk(t, field, writes)
            else graft.core.Mutation.setBulk(t, field, writes)
          commitState(idx, next, touched = Some(writes))
        }
    }
  }

  /** The Go client's roaring import wires, translated onto the existing
    * JSON-envelope handlers (same decode, same bulk-join apply):
    * `pb.ImportRoaringRequest` (`importRoaringBitmap`, `client.go:694-733`
    * — view Name "" is the standard view, Clear flag → action) and
    * `pb.ImportRoaringShardRequest` (`ImportRoaringShard`,
    * `client.go:661-680` — per-field Set/Clear roaring payloads +
    * ClearRecords, one transaction). */
  private def protoRoaring(ex: HttpExchange, idx: String, field: String,
                           shard: Long, body: Array[Byte]): Unit =
    protoWrite(ex, idx) {
      val m = new PbQuery.ImportMsg(body)
      val doClear = m.longs(1).contains(1L)
      val views = new Proto.Reader(body).fields.getOrElse(2, Seq.empty)
        .collect { case b: Array[Byte] =>
          val v = new Proto.Reader(b)
          val name = v.str(1).filter(_.nonEmpty).getOrElse("standard")
          val data = v.fields.get(2).flatMap(_.headOption)
            .collect { case d: Array[Byte] => d }.getOrElse(Array.emptyByteArray)
          s"""${js(name)}:${js(java.util.Base64.getEncoder.encodeToString(data))}"""
        }
      val action = if (doClear) "clear" else "set"
      val json = s"""{"action":"$action","views":{${views.mkString(",")}}}"""
      writeLock(idx)(importRoaring(idx, field, shard, json))
    }

  private def protoRoaringShard(ex: HttpExchange, idx: String, shard: Long,
                                body: Array[Byte]): Unit =
    protoWrite(ex, idx) {
      val updates = new Proto.Reader(body).fields.getOrElse(2, Seq.empty)
        .collect { case b: Array[Byte] =>
          val v = new Proto.Reader(b)
          def b64(f: Int): Option[String] = v.fields.get(f)
            .flatMap(_.headOption).collect { case d: Array[Byte] if d.nonEmpty =>
              java.util.Base64.getEncoder.encodeToString(d) }
          val parts = Seq(
            Some(s""""field":${js(v.str(1).getOrElse(sys.error("RoaringUpdate.Field missing")))}"""),
            Some(s""""view":${js(v.str(2).filter(_.nonEmpty).getOrElse("standard"))}"""),
            b64(3).map(s => s""""clear":${js(s)}"""),
            b64(4).map(s => s""""set":${js(s)}"""),
            Some(s""""clearRecords":${v.fields.get(5).exists(_.headOption.contains(1L))}""")
          ).flatten
          parts.mkString("{", ",", "}")
        }
      val json = s"""{"views":[${updates.mkString(",")}]}"""
      writeLock(idx)(importRoaringShard(idx, shard, json))
    }

  /** An error answered the way Go's `http.Error` does — text/plain body of
    * `text\n` with an explicit status — for routes whose reference handler
    * bypasses the JSON error envelope (mutex-check's 406/400/500). */
  private case class PlainError(code: Int, text: String)
    extends RuntimeException(text)

  /** Host memory (capacity, used) — /proc/meminfo, standing in for the
    * reference's gopsutil VirtualMemory (`util.go:50-57`); JVM numbers as
    * the non-Linux fallback. */
  private def hostMemory(): (Long, Long) =
    try {
      val src = scala.io.Source.fromFile("/proc/meminfo")
      try {
        val kv = src.getLines().flatMap { l =>
          l.split(":\\s+") match {
            case Array(k, v) =>
              v.trim.split(" ")(0).toLongOption.map(n => k -> n * 1024L)
            case _ => None
          }
        }.toMap
        val total = kv("MemTotal")
        (total, total - kv.getOrElse("MemAvailable", 0L))
      } finally src.close()
    } catch { case _: Exception =>
      val rt = Runtime.getRuntime
      (rt.maxMemory, rt.totalMemory - rt.freeMemory)
    }

  /** `validHeaderAcceptJSON` (`http_handler.go:1015-1045`): no Accept
    * header accepts anything; otherwise some listed media type must match
    * application/json with * wildcards on either side. */
  private def acceptsJson(ex: HttpExchange): Boolean = {
    val vs = ex.getRequestHeaders.get("Accept")
    if (vs == null || vs.isEmpty) true
    else vs.asScala.flatMap(_.split(",")).exists { v =>
      v.trim.takeWhile(_ != ';').trim.split("/", 2) match {
        case Array(t, s) =>
          (t == "application" || t == "*") && (s == "json" || s == "*")
        case _ => false
      }
    }
  }

  private def respond(ex: HttpExchange)(f: => String): Unit = {
    graft.core.Metrics.inc(graft.core.Metrics.HttpRequest)
    val outcome: Either[PlainError, (Int, String)] =
      try Right((200, f))
      catch {
        case e: PlainError     => Left(e)
        // StatusForbidden, reference/http_handler.go:763,843-851
        case e: Auth.AuthError => Right((403, s"""{"error":${js(msg(e))}}"""))
        case e: Throwable      => Right((400, s"""{"error":${js(msg(e))}}"""))
      }
    outcome match {
      case Left(PlainError(code, text)) =>
        // Go http.Error byte shape (`net/http/server.go` Error): text/plain;
        // charset=utf-8, nosniff, message + "\n"
        val bytes = (text + "\n").getBytes(UTF_8)
        ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
        ex.getResponseHeaders.set("X-Content-Type-Options", "nosniff")
        ex.sendResponseHeaders(code, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
        return
      case Right(_) => ()
    }
    val (code, payload) = outcome.toOption.get
    val bytes = payload.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    if (code == 200 && bytes.isEmpty) // ApplySchema-style 204 No Content
      ex.sendResponseHeaders(204, -1L)
    else {
      ex.sendResponseHeaders(code, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
    }
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
  /** The `?plan=true` operator tree — the reference renders its sql3 plan
    * as nested maps with `_op`/`_schema` plus op-specific keys
    * (`sql3/planner/opprojection.go:61-75`). Ours renders the FINAL Spark
    * physical plan (post-AQE), because that's where the answers to "did
    * the filter push down, where are the exchanges, did the join
    * broadcast" live. Depth-capped so a pathological plan can't produce an
    * unbounded response. */
  private def planJson(df: DataFrame): String = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def node(p: SparkPlan, depth: Int): String = {
      val unwrapped = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other                    => other
      }
      val schema = unwrapped.output
        .map(a => js(s"${a.name}:${a.dataType.simpleString}"))
        .mkString("[", ",", "]")
      val details = js(unwrapped.simpleString(25).take(800))
      val kids =
        if (depth >= 40 || unwrapped.children.isEmpty) ""
        else if (unwrapped.children.length == 1)
          s""","child":${node(unwrapped.children.head, depth + 1)}"""
        else
          s""","children":[${unwrapped.children.map(node(_, depth + 1)).mkString(",")}]"""
      s"""{"_op":${js(unwrapped.nodeName)},"_schema":$schema,"details":$details$kids}"""
    }
    node(df.queryExecution.executedPlan, 0)
  }

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
    val spark = graft.core.EngineConf(SparkSession.builder().master("local[4]")
      .appName("graft-server")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bound = new HttpFacade(spark, dir, port).start()
    println(s"[graft-server] listening on :$bound (POST /sql, POST /index/{i}/query)")
    Thread.currentThread().join()
  }
}

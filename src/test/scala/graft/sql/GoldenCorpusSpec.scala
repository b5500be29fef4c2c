package graft.sql

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The reference's COMPLETE golden SQL corpus, swept end-to-end:
  * `reference/sql3/test/defs/defs_*.go` (153 TableTests, 1,812 cases, 1,856
  * SQL statements) parsed by [[GoldenDefs]] at test time and executed by
  * [[GoldenRunner]] with the reference runner's own compare modes
  * (`sql3/sql_test.go:34-160`).
  *
  * Every statement must pass except the divergences enumerated below, each
  * with its reason. The list is exact — a newly-failing statement fails this
  * suite, and a divergence that STARTS passing fails it too (so the ledger
  * can't rot).
  */
class GoldenCorpusSpec extends AnyFunSuite {

  /** Documented divergences, keyed by (TableTest var, case name, SQL prefix).
    * A key matches a result when the sql starts with the given prefix. */
  private val knownDivergences: Seq[(String, String, String)] = Seq(
    // The reference test encodes its own BSI-offset bug — its TODO lists the
    // "correct results below", which are exactly what we return
    // (`defs_minmaxnegative.go:34-39`).
    ("minmaxnegatives", "select-all", "select * from minmaxnegatives"),
    // Nanosecond precision: reference timestamps carry ns, Spark µs — the
    // sub-µs digits of 'NS' parts are zero here (SURVEY §8 divergence).
    ("dateTimePartTests", "DateTimePartNS", "select _id, datetimepart('ns', ts)"),
    ("datetimeAddTests", "", "select _id, datetimepart('NS',datetimeadd('NS', 1, ts))"),
    ("datetimeAddTests", "", "select _id, datetimepart('NS',datetimeadd('NS', 700, ts))"),
    ("dateTruncTests", "DateTruncOnNanoS", "select _id, date_trunc('ns', ts)"),
    ("dateTruncTests", "VerifyTimeStamp", "select _id, datetimename('ns', ts)"),
    ("datetimedifftests", "DatetimeDiffNS", "select datetimediff('ns', startTime, endTime)"),
    // PQLTests run only under the reference's DAX (serverless) harness
    // (`dax/test/dax/dax_test.go:171-196`); its MinRow/MaxRow counts
    // reflect per-partition sharding (count=1), not the single-node
    // executor's column count (`executor.go:1604` — ours, 3 here).
    ("keyed", "minrow", "MinRow(field=an_id_set)"))

  private def isKnown(r: GoldenRunner.CaseResult): Boolean =
    knownDivergences.exists { case (tbl, name, prefix) =>
      r.table == tbl && r.name == name && r.sql.startsWith(prefix)
    }

  test("golden corpus: 1,865 reference SQL+PQL statements") {
    val session = SparkSpec.session.newSession()
    // proleptic java.time values on collect: java.sql.Timestamp rebases
    // pre-1582 dates to the hybrid Julian calendar (days off at year 0 —
    // DateTimeFromPartsAllZeros), Instants are exact
    session.conf.set("spark.sql.datetime.java8API.enabled", "true")
    val tests = GoldenDefs.loadCorpus()
    val results = GoldenRunner.runAll(tests, None, verbose = false, session)
    val unexpected = results.filterNot(_.ok).filterNot(isKnown)
    val healed = results.filter(_.ok).filter(isKnown)
    assert(unexpected.isEmpty,
      s"${unexpected.size} corpus statements newly failing:\n" +
        unexpected.take(20).map(r => s"[${r.table}/${r.name}] ${r.sql}\n  -> ${r.detail}")
          .mkString("\n"))
    assert(healed.isEmpty,
      "documented divergences now PASS — remove them from the ledger:\n" +
        healed.map(r => s"[${r.table}/${r.name}] ${r.sql}").mkString("\n"))
    val pass = results.count(_.ok)
    info(s"golden corpus: $pass/${results.size} pass, " +
      s"${results.size - pass} documented divergences")
    // 1,865 recorded statements (fixture statements only record on failure),
    // 8 documented divergences (r8 closed the two rangeq rows by matching
    // the reference's shared per-row quantum write time, and the two
    // grouped-output-order rows by emitting first-appearance order for
    // join-grouped / set-keyed aggregation like the reference's post-PQL
    // insertion-ordered aggregator)
    assert(pass >= 1857)
  }
}

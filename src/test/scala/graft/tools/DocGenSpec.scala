package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DocGenSpec extends SparkSpec {

  test("synthetic corpus is deterministic with planted adjacent duplicates") {
    val a = DocGen.frame(spark, 300).collect().map(r => (r.getLong(0), r.getString(1)))
    val b = DocGen.frame(spark, 300).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.toSeq == b.toSeq, "generation must be reproducible")
    val byId = a.toMap
    // every 97th doc duplicates its predecessor verbatim; neighbors of
    // non-planted docs are distinct
    assert(byId(97L) == byId(96L) && byId(194L) == byId(193L))
    assert(byId(0L) != byId(1L) && byId(50L) != byId(51L))
    // word shape: fixed width, vocab-prefixed tokens
    assert(byId(5L).split(" ").length == 40)
    assert(byId(5L).split(" ").forall(w => w.startsWith("w") && w.drop(1).forall(_.isDigit)))
  }

  test("GenCache materializes once and reuses the parquet") {
    val dir = graft.streaming.Ingest.scratch("docgen_cache") + "/c"
    GenCache.ensure(spark, 100, dir)(p => DocGen.frame(spark, 100, parts = p))
    val mtime = new java.io.File(dir, "_SUCCESS").lastModified()
    GenCache.ensure(spark, 100, dir)(_ => sys.error("must not regenerate"))
    assert(new java.io.File(dir, "_SUCCESS").lastModified() == mtime)
    assert(spark.read.parquet(dir).count() == 100)
  }
}

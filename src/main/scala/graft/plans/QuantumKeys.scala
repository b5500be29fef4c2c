package graft.plans

/** The quantum-key naming scheme and nesting lattice shared by the rewrite
  * rule ([[IndexRewrite]]) and the workload advisor ([[IndexAdvisor]]):
  *
  *  - `__q_<unit>_<ts>` — timestamp-typed `date_trunc` bucket
  *    ([[graft.index.GroupIndex.Quantum]]);
  *  - `__qs_<unit>_<ts>` — string-typed reference-dialect RFC3339 prefix
  *    cut ([[graft.index.GroupIndex.QuantumStr]]).
  *
  * Nesting (`trunc_coarse ∘ trunc_fine = trunc_coarse`) is what lets one
  * finer index serve every coarser unit by re-aggregation — the
  * reference's time-view hierarchy (`reference/time.go:74-225`). */
private[graft] object QuantumKeys {

  /** `__q_<unit>_<ts>` → (unit, ts column). Timestamp kind only. */
  def quantumParts(key: String): (String, String) = {
    val rest = key.stripPrefix("__q_")
    val i = rest.indexOf('_')
    (rest.take(i), rest.drop(i + 1))
  }

  /** Parse either quantum-key kind. Returns (isStringKind, unit, tsCol). */
  def parseQuantum(key: String): Option[(Boolean, String, String)] = {
    val (isStr, rest) =
      if (key.startsWith("__qs_")) (true, key.stripPrefix("__qs_"))
      else if (key.startsWith("__q_")) (false, key.stripPrefix("__q_"))
      else return None
    val i = rest.indexOf('_')
    if (i <= 0 || i == rest.length - 1) None
    else Some((isStr, rest.take(i), rest.drop(i + 1)))
  }

  /** Timestamp-unit nesting: holds along second→minute→hour→day→{week |
    * month→quarter→year} in a fixed timezone; week is only ever a rollup
    * TARGET (its buckets straddle month/quarter/year boundaries). */
  val quantumRank: Map[String, Int] = Map("second" -> 0, "minute" -> 1,
    "hour" -> 2, "day" -> 3, "week" -> 4, "month" -> 5, "quarter" -> 6,
    "year" -> 7)
  def quantumNests(fine: String, coarse: String): Boolean =
    fine != "week" && quantumRank.contains(fine) &&
      quantumRank.contains(coarse) && quantumRank(fine) < quantumRank(coarse)

  /** Dialect string-cut nesting: every shorter RFC3339 prefix is a cut of
    * every longer one, so rank order alone decides. */
  val strRank: Map[String, Int] =
    Seq("yy", "m", "d", "hh", "mi", "s", "ms", "us", "ns").zipWithIndex.toMap
  /** Rendered length of each dialect cut — the `substring` width a coarser
    * string key takes of a finer one. */
  val strOutLen: Map[String, Int] = Map("yy" -> 4, "m" -> 7, "d" -> 10,
    "hh" -> 13, "mi" -> 16, "s" -> 19, "ms" -> 23, "us" -> 26, "ns" -> 29)

  /** Does fine-KEY nest into coarse-KEY? Same ts column, same kind, and
    * unit nesting for that kind. */
  def quantumNestsK(fineKey: String, coarseKey: String): Boolean =
    (parseQuantum(fineKey), parseQuantum(coarseKey)) match {
      case (Some((false, fu, ft)), Some((false, cu, ct))) =>
        ft == ct && quantumNests(fu, cu)
      case (Some((true, fu, ft)), Some((true, cu, ct))) =>
        ft == ct && strRank.contains(fu) && strRank.contains(cu) &&
          strRank(fu) > strRank(cu)
      case _ => false
    }

  /** KEY k serves requested key r (same key, or k nests into r). */
  def serves(k: String, r: String): Boolean = k == r || quantumNestsK(k, r)

  /** The COARSEST single key able to serve every requested quantum key of
    * one (kind, ts) family — coarsest = fewest index rows. None when no
    * unit covers the set (cannot happen within one family: the finest
    * requested non-week unit, or a week-compatible finer one, always
    * does). */
  def coveringKey(requested: Seq[String]): Option[String] =
    requested.headOption.flatMap { h =>
      parseQuantum(h).flatMap { case (isStr, _, ts) =>
        val units =
          if (isStr) strRank.keys.toSeq.sortBy(strRank).reverse // finest first
          else quantumRank.keys.toSeq.sortBy(quantumRank)
        val names = units.map(u =>
          if (isStr) s"__qs_${u}_$ts" else s"__q_${u}_$ts")
        // coarsest candidate that serves all requested = LAST in
        // finest→coarsest order that still serves everything
        names.filter(k => requested.forall(serves(k, _))).lastOption
      }
    }
}

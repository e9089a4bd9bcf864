package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Predicate/filter operators (SURVEY.md §2.2, P1-P11).
  *
  * All are plain `Column` predicates so Catalyst pushes them into the scan
  * (`PushedFilters` in explain output) — the reference applies the same
  * exclusions by hand while walking directories (scene_scanner.py:49-63,
  * copy_scene_assets.py:57-59).
  */
object Filters {

  /** P1 — case-insensitive substring exclusion over a pattern list
    * (reference: scene_scanner.py:49-63 exclude_map_names). */
  def excludeSubstrings(c: Column, patterns: Seq[String]): Column =
    patterns.map(p => !contains(lower(c), lit(p.toLowerCase))).reduce(_ && _)

  /** P2 — system-folder anti-filter: name not in blacklist and not
    * `_`-prefixed (reference: scene_scanner.py:96-117). */
  def notSystemFolder(c: Column, blacklist: Seq[String]): Column =
    !c.isin(blacklist: _*) && !c.startsWith("_")

  /** P3 — fnmatch-style glob exclusion; globs translated to anchored
    * regexes (reference: scene_copy.py:68-92 should_exclude). */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("(?s)")
    glob.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append('.')
      case ch if "\\.[]{}()+-^$|".indexOf(ch) >= 0 => sb.append('\\').append(ch)
      case ch => sb.append(ch)
    }
    sb.toString
  }
  def excludeGlobs(c: Column, globs: Seq[String]): Column =
    globs.map(g => !c.rlike("^" + globToRegex(g) + "$")).reduce(_ && _)

  /** P5 — bounds-validity filter: extent within [minExtent, maxExtent]
    * (reference: navmesh_injector.py:284-296). */
  def validBounds(extent: Column, minExtent: Double, maxExtent: Double): Column =
    extent >= minExtent && extent <= maxExtent

  /** P10 — scene search: case-insensitive exact match; if nothing matches
    * exactly, fall back to substring candidates
    * (reference: scene_download.py:169-212). Implemented without collect:
    * both match sets are computed lazily and the exact set wins via a
    * cross-joined exact-hit count (1-row broadcast).
    */
  def searchWithFallback(df: DataFrame, nameCol: String, term: String): DataFrame = {
    val t = term.toLowerCase
    val exact = lower(col(nameCol)) === t
    val fuzzy = contains(lower(col(nameCol)), lit(t))
    val hasExact = df.agg(max(when(exact, 1).otherwise(0)).as("_has_exact"))
    df.crossJoin(broadcast(hasExact))
      .filter(when(col("_has_exact") === 1, exact).otherwise(fuzzy))
      .drop("_has_exact")
  }
}

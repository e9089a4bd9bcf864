package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint validation — the batch analog of the
  * reference's prerequisite validators (`core/validators.py:5-58`: map /
  * blueprint / NavMesh existence checks before running a job) and of the
  * monitor's failure-rate thresholds.
  *
  * All row-level rules evaluate in ONE aggregation pass over the table
  * (`sum(when(!rule, 1))` per rule — map-side partial aggregation, no
  * shuffle of the violating rows themselves). Referential integrity is a
  * left-anti join (orphan count), broadcast when the parent side is
  * dimension-sized.
  */
object Quality {

  final case class Rule(name: String, predicate: Column)

  /** One row per rule: (rule, violations, total). A NULL predicate result
    * counts as a violation — an unknown is not a pass; an EMPTY table
    * reports 0 violations (not NULL), so gates like `violations > 0`
    * behave on empty inputs. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    // rule names become aggregate column names in the wide row: duplicates
    // would silently cross-wire violation counts, and "_total" is the
    // internal total column
    val names = rules.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate rule names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    require(!names.contains("_total"), "rule name \"_total\" is reserved")
    val aggs = rules.map { r =>
      coalesce(sum(when(coalesce(r.predicate, lit(false)), 0L).otherwise(1L)), lit(0L))
        .as(r.name)
    }
    val total = count(lit(1)).as("_total")
    val wide = df.agg(aggs.head, (aggs.tail :+ total): _*)
    // wide (1 row) → long (rule per row), keeping a deterministic order
    val pairs = rules.map(r => struct(lit(r.name).as("rule"), col(r.name).as("violations")))
    wide.select(explode(array(pairs: _*)).as("p"), col("_total").as("total"))
      .select(col("p.rule").as("rule"), col("p.violations").as("violations"), col("total"))
  }

  /** Orphan rows in `child` whose key has no match in `parent`. */
  def fkOrphans(child: DataFrame, parent: DataFrame, childKey: String,
      parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti")
}

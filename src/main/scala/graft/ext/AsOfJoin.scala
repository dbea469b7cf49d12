package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (the time-series operator Spark lacks natively;
  * SURVEY.md §2.5 "beyond-reference north star"): for every left row,
  * the most recent right row with the same key and
  * `rightTs <= leftTs`.
  *
  * Implemented with the scale-correct union+window pattern instead of
  * a range join: tag both sides, union them, sort within key by time,
  * and carry the last-seen right row forward with
  * `last(_, ignoreNulls)`. One shuffle on the key, no cross product,
  * no range-condition nested-loop — at 100 TB this is the difference
  * between a merge pass and an O(n·m) disaster. Ties (equal
  * timestamps) resolve right-row-first so a same-instant right row is
  * visible to the left row, matching the `<=` contract.
  */
object AsOfJoin {

  /** Returns the left rows plus `_asof` — a struct of the matched
    * right row (null when no right row precedes). */
  def apply(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val lCols = left.columns
    val l = left.select(col(key).as("_k"),
      col(leftTs).cast("timestamp").as("_ts"),
      lit(0).as("_side"),
      struct(lCols.map(col).toIndexedSeq: _*).as("_l"),
      lit(null).cast(structType(right)).as("_r"))
    val r = right.select(col(key).as("_k"),
      col(rightTs).cast("timestamp").as("_ts"),
      lit(1).as("_side"),
      lit(null).cast(structType(left)).as("_l"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("_r"))
    // right rows sort BEFORE left rows at equal _ts (desc on _side)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts").asc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(lCols.map(c => col(s"_l.`$c`").as(c)).toIndexedSeq :+
        col("_asof"): _*)
  }

  private def structType(df: DataFrame) =
    org.apache.spark.sql.types.StructType(df.schema.fields)
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Point-in-time (as-of) join: for every left row, attach the latest
  * right row with the same key and right.ts <= left.ts — "state as of
  * the event" (dimension snapshots, feature freshness, CDC state at
  * event time).
  *
  * Spark has no ASOF JOIN; the naive formulations are a range join
  * (O(n·m) BroadcastNestedLoop) or a per-left-row subquery. This
  * implementation is the scalable composition: union both sides tagged,
  * ONE shuffle on (key), ONE ordered window pass filling each left row
  * with the last-seen right payload (`last(col, ignoreNulls)` over
  * rows-unbounded-preceding), then keep the left rows. Cost is
  * sort-shuffle of n+m rows — no quadratic blowup, AQE/skew handled like
  * any window.
  *
  * Tie semantics: right rows order BEFORE left rows at equal ts, so
  * right.ts == left.ts matches (the <= convention, same as DuckDB's
  * ASOF JOIN which serves as this operator's oracle).
  */
object AsOfJoin {

  def asOf(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String, suffix: String = "_asof"): DataFrame = {
    val leftPayload = left.columns.filterNot(c => keys.contains(c) || c == tsCol)
    val rightPayload = right.columns.filterNot(keys.contains)
    val rightOut = rightPayload.map(c => if (c == tsCol) c + suffix else
      if (leftPayload.contains(c)) c + suffix else c)

    // the right payload travels as ONE struct so the window's last()
    // attaches the whole latest right ROW — per-column last(ignoreNulls)
    // would stitch values from different rows whenever the latest row
    // holds a null in some column
    val l = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as("__isL"),
        lit(null).cast(StructType(rightPayload.map(c =>
          StructField(c, right.schema(c).dataType)).toIndexedSeq)).as("__r")) ++
        leftPayload.map(col): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("__isL"),
        struct(rightPayload.map(col).toIndexedSeq: _*).as("__r")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__isL").asc) // right first on ties → <=
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = l.unionByName(r)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    val unpacked = rightPayload.zip(rightOut).foldLeft(filled) { case (df, (c, o)) =>
      df.withColumn(o, col("__r").getField(c))
    }
    unpacked.filter(col("__isL") === 1).drop("__isL", "__r")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Global order index without a global window (SURVEY J1 line-zip support).
  *
  * `row_number().over(Window.orderBy(key))` funnels the ENTIRE table through
  * one partition to number it — correct at sf0.1, dead at 100×. This operator
  * composes the same index scale-safely:
  *   1. `repartitionByRange(key)` + `sortWithinPartitions(key)` — a total
  *      order across range partitions, each sorted in parallel;
  *   2. RDD `zipWithIndex` — one lightweight job counts rows per partition,
  *      then each partition numbers itself from its offset (per-partition
  *      offset composition; no data moves).
  *
  * The result is the exact 1-based rank the global window would produce (the
  * key is expected unique, as with line numbers), with the heavy lifting
  * spread over all partitions.
  */
object ZipIndex {

  /** Append `idxCol` = 1-based rank of `orderCol` (unique key). */
  def withOrderIndex(df: DataFrame, orderCol: String, idxCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(col(orderCol)).sortWithinPartitions(orderCol)
    val schema = StructType(sorted.schema.fields :+ StructField(idxCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }
}

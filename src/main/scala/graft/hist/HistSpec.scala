package graft.hist

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The histogram schema: axes + storage (+ metadata) — the Spark-side
  * `histref` (reference carries it as a `bh.Histogram` instance or a
  * picklable 3-tuple, `/root/reference/src/dask_histogram/boost.py:104-110`).
  * Fixed at construction except category growth, which the sparse
  * representation absorbs for free.
  */
final case class HistSpec(axes: Seq[Axis], storage: Storage = DoubleStorage,
    metadata: Map[String, String] = Map.empty) {
  require(axes.nonEmpty, "HistSpec needs at least one axis")

  def ndim: Int = axes.size
  def indexCols: Seq[String] = axes.indices.map(i => s"i$i")

  /** Schema of the sparse relational histogram DataFrame. */
  def schema: StructType = StructType(
    axes.zipWithIndex.map { case (a, i) => StructField(s"i$i", a.keyType) } ++
      storage.stateCols.map { n =>
        val isCountStorage =
          storage == Int64Storage || storage == AtomicInt64Storage
        StructField(n, if (isCountStorage && n == "value") LongType else DoubleType)
      })

  /** Empty histogram (computable like the reference's unfilled hist,
    * `tests/test_boost.py:13-26`). */
  def empty(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** State columns participating in histogram algebra (sums only —
    * derived finalizer columns are recomputed, not combined). */
  def stateColsForAlgebra: Seq[String] = storage.stateCols

  /** Total in-range dense bin count (numeric axes). */
  def denseBinCount(flow: Boolean): Long =
    axes.map(a => (a.nBins + (if (flow) 2 else 0)).toLong).product
}

package graft.hist

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Histogram sink/source: persist a filled sparse histogram AND its schema
  * (the `histref`) as parquet, and read both back — the Spark analog of
  * pickling a filled `bh.Histogram` (reference round-trip exercised at
  * `/root/reference/tests/test_boost.py:559-571`).
  *
  * Layout: `path/data/` holds the sparse bin rows exactly as produced by
  * [[Hist.fill]]; `path/spec/` holds a tiny typed sidecar table encoding
  * axes/storage/metadata. Both are plain parquet — readable by any engine,
  * no JSON parsing, and doubles round-trip bit-exactly (NaN/±inf included).
  * At 100 TB the data side is just a parquet write of an already-tiny
  * aggregate (O(bins) rows); the sidecar is O(axes) rows on one partition.
  */
object HistIO {

  private val specSchema = StructType(Seq(
    StructField("pos", IntegerType, nullable = false), // axis idx; -1 storage; -2 metadata
    StructField("kind", StringType, nullable = false),
    StructField("n", IntegerType),
    StructField("lo", DoubleType),
    StructField("hi", DoubleType),
    StructField("name", StringType),
    StructField("flag", BooleanType), // upperInclusive / growth
    StructField("edges", ArrayType(DoubleType, containsNull = false)),
    StructField("strs", ArrayType(StringType, containsNull = false)),
    StructField("longs", ArrayType(LongType, containsNull = false))))

  private def axisRow(pos: Int, a: Axis): Row = a match {
    case Regular(n, lo, hi, nm, ui) =>
      Row(pos, "regular", n, lo, hi, nm, ui, null, null, null)
    case Variable(e, nm, ui) =>
      Row(pos, "variable", null, null, null, nm, ui, e, null, null)
    case RegularCircular(n, lo, hi, nm) =>
      Row(pos, "circular", n, lo, hi, nm, null, null, null, null)
    case RegularLog(n, lo, hi, nm) =>
      Row(pos, "log", n, lo, hi, nm, null, null, null, null)
    case IntegerAxis(lo, hi, nm) =>
      Row(pos, "integer", null, null, null, nm, null, null, null, Seq(lo, hi))
    case BooleanAxis(nm) =>
      Row(pos, "boolean", null, null, null, nm, null, null, null, null)
    case StrCategory(cats, growth, nm) =>
      Row(pos, "strcat", null, null, null, nm, growth, null, cats, null)
    case IntCategory(cats, growth, nm) =>
      Row(pos, "intcat", null, null, null, nm, growth, null, null, cats)
  }

  private def rowAxis(r: Row): Axis = r.getString(1) match {
    case "regular" => Regular(r.getInt(2), r.getDouble(3), r.getDouble(4),
      r.getString(5), r.getBoolean(6))
    case "variable" => Variable(r.getSeq[Double](7), r.getString(5), r.getBoolean(6))
    case "circular" => RegularCircular(r.getInt(2), r.getDouble(3), r.getDouble(4),
      r.getString(5))
    case "log" => RegularLog(r.getInt(2), r.getDouble(3), r.getDouble(4),
      r.getString(5))
    case "integer" =>
      val lohi = r.getSeq[Long](9); IntegerAxis(lohi(0), lohi(1), r.getString(5))
    case "boolean" => BooleanAxis(r.getString(5))
    case "strcat" => StrCategory(r.getSeq[String](8), r.getBoolean(6), r.getString(5))
    case "intcat" => IntCategory(r.getSeq[Long](9), r.getBoolean(6), r.getString(5))
    case k => throw new IllegalArgumentException(s"unknown axis kind '$k'")
  }

  private val storageNames: Seq[(String, Storage)] = Seq(
    "double" -> DoubleStorage, "int64" -> Int64Storage,
    "atomic_int64" -> AtomicInt64Storage, "unlimited" -> UnlimitedStorage,
    "weight" -> WeightStorage, "mean" -> MeanStorage,
    "weighted_mean" -> WeightedMeanStorage)

  private def storageName(s: Storage): String =
    storageNames.collectFirst { case (n, x) if x == s => n }
      .getOrElse(throw new IllegalArgumentException(s"unregistered storage $s"))

  private def namedStorage(n: String): Storage =
    storageNames.collectFirst { case (`n`, x) => x }
      .getOrElse(throw new IllegalArgumentException(s"unknown storage '$n'"))

  /** Persist spec + sparse rows under `path` (overwrites). */
  def write(spec: HistSpec, h: DataFrame, path: String): Unit = {
    val spark = h.sparkSession
    h.write.mode("overwrite").parquet(s"$path/data")
    val rows =
      spec.axes.zipWithIndex.map { case (a, i) => axisRow(i, a) } ++
        Seq(Row(-1, storageName(spec.storage), null, null, null, null, null,
          null, null, null)) ++
        spec.metadata.toSeq.sorted.map { case (k, v) =>
          Row(-2, "meta", null, null, null, k, null, null, Seq(v), null) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), specSchema)
      .write.mode("overwrite").parquet(s"$path/spec")
  }

  /** Read back (spec, sparse rows). The data side stays lazy/distributed. */
  def read(spark: SparkSession, path: String): (HistSpec, DataFrame) = {
    val sr = spark.read.parquet(s"$path/spec").collect()
    val axes = sr.filter(_.getInt(0) >= 0).sortBy(_.getInt(0)).map(rowAxis).toSeq
    val storage = namedStorage(
      sr.find(_.getInt(0) == -1).map(_.getString(1))
        .getOrElse(throw new IllegalArgumentException(s"$path/spec has no storage row")))
    val metadata = sr.filter(_.getInt(0) == -2)
      .map(r => r.getString(5) -> r.getSeq[String](8).head).toMap
    (HistSpec(axes, storage, metadata), spark.read.parquet(s"$path/data"))
  }
}

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

  /** (name, optional parameter) — the parameterized shifted storages
    * carry their shift in the spec row's double slot. */
  private def storageNameParam(s: Storage): (String, Option[Double]) = s match {
    case ShiftedMeanStorage(sh) => ("shifted_mean", Some(sh))
    case ShiftedWeightedMeanStorage(sh) => ("shifted_weighted_mean", Some(sh))
    case other =>
      (storageNames.collectFirst { case (n, x) if x == other => n }
        .getOrElse(throw new IllegalArgumentException(
          s"unregistered storage $other")), None)
  }

  private def namedStorage(n: String, param: Option[Double]): Storage = n match {
    case "shifted_mean" => ShiftedMeanStorage(param.getOrElse(
      throw new IllegalArgumentException("shifted_mean row carries no shift")))
    case "shifted_weighted_mean" => ShiftedWeightedMeanStorage(param.getOrElse(
      throw new IllegalArgumentException(
        "shifted_weighted_mean row carries no shift")))
    case _ => storageNames.collectFirst { case (`n`, x) => x }
      .getOrElse(throw new IllegalArgumentException(s"unknown storage '$n'"))
  }

  /** Persist spec + sparse rows under `path` (overwrites). */
  def write(spec: HistSpec, h: DataFrame, path: String): Unit = {
    val spark = h.sparkSession
    // serialize the spec FIRST: it is the only part that can refuse
    // (unregistered storage), and refusing AFTER overwriting path/data
    // would leave new data paired with a stale or missing sidecar
    val (sName, sParam) = storageNameParam(spec.storage)
    val rows =
      spec.axes.zipWithIndex.map { case (a, i) => axisRow(i, a) } ++
        Seq(Row(-1, sName, null, sParam.map(Double.box).orNull, null, null,
          null, null, null, null)) ++
        spec.metadata.toSeq.sorted.map { case (k, v) =>
          Row(-2, "meta", null, null, null, k, null, null, Seq(v), null) }
    h.write.mode("overwrite").parquet(s"$path/data")
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), specSchema)
      .write.mode("overwrite").parquet(s"$path/spec")
  }

  /** Read back (spec, sparse rows). The data side stays lazy/distributed. */
  def read(spark: SparkSession, path: String): (HistSpec, DataFrame) = {
    val sr = spark.read.parquet(s"$path/spec").collect()
    val axes = sr.filter(_.getInt(0) >= 0).sortBy(_.getInt(0)).map(rowAxis).toSeq
    val sRow = sr.find(_.getInt(0) == -1)
      .getOrElse(throw new IllegalArgumentException(s"$path/spec has no storage row"))
    val storage = namedStorage(sRow.getString(1),
      if (sRow.isNullAt(3)) None else Some(sRow.getDouble(3)))
    val metadata = sr.filter(_.getInt(0) == -2)
      .map(r => r.getString(5) -> r.getSeq[String](8).head).toMap
    (HistSpec(axes, storage, metadata), spark.read.parquet(s"$path/data"))
  }
}

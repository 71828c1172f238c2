package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.hist._

/** Oracle-differential grid, mirroring the reference's strategy (dense
  * pytest.mark.parametrize grids against eager boost-histogram —
  * SURVEY.md §5): every (dims × storage × weight × partitioning) combo is
  * checked bin-for-bin against a driver-side Scala re-computation on the
  * same deterministic data.
  */
class GridDifferentialSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val n = 800
  // deterministic pseudo-random columns in roughly [-3, 3] / weights in (0,1)
  private def raw: Seq[(Double, Double, Double, Double, Double)] =
    Seq.tabulate(n) { i =>
      def u(salt: Int) = {
        val h = (i.toLong * 2654435761L + salt * 40503L) & 0xffffffffL
        h.toDouble / 4294967296.0
      }
      ((u(1) - 0.5) * 6, (u(2) - 0.5) * 6, (u(3) - 0.5) * 6, u(4), u(5) * 8)
    }

  private val axes1 = Seq(Regular(7, -3.0, 3.0))
  private val axes2 = axes1 :+ Variable(Seq(-3.0, -1.0, 0.5, 3.0))
  private val axes3 = axes2 :+ Regular(4, -2.0, 2.0)

  /** Driver-side mirror of the axis bin functions. */
  private def bin(ax: Axis, x: Double): Long = ax match {
    case Regular(m, lo, hi, _, inc) =>
      if (x.isNaN || (if (inc) x > hi else x >= hi)) m + 1L
      else if (inc && x == hi) m.toLong
      else if (x < lo) 0L
      else math.floor((x - lo) * m / (hi - lo)).toLong + 1L
    case Variable(es, _, inc) =>
      if (x.isNaN || (if (inc) x > es.last else x >= es.last)) es.size.toLong
      else if (inc && x == es.last) es.size.toLong - 1L
      else if (x < es.head) 0L
      else es.indices.init.find(i => x >= es(i) && x < es(i + 1)).get + 1L
    case other => fail(s"unexpected axis $other")
  }

  private def expected(axes: Seq[Axis], useW: Boolean, useS: Boolean,
      storage: Storage): Map[List[Long], Seq[Double]] =
    raw.groupBy { case (x, y, z, _, _) =>
      axes.zip(Seq(x, y, z)).map { case (ax, v) => bin(ax, v) }.toList
    }.map { case (k, rows) =>
      val ws = rows.map(r => (if (useW) r._4 else 1.0, r._5))
      val st = storage match {
        case DoubleStorage => Seq(ws.map(_._1).sum)
        case Int64Storage => Seq(ws.size.toDouble)
        case WeightStorage => Seq(ws.map(_._1).sum, ws.map(w => w._1 * w._1).sum)
        case MeanStorage =>
          Seq(ws.size.toDouble, ws.map(_._2).sum, ws.map(w => w._2 * w._2).sum)
        case WeightedMeanStorage =>
          Seq(ws.map(_._1).sum, ws.map(w => w._1 * w._1).sum,
            ws.map(w => w._1 * w._2).sum, ws.map(w => w._1 * w._2 * w._2).sum)
        case other => fail(s"unexpected storage $other")
      }
      k -> st
    }

  for {
    (axes, d) <- Seq(axes1 -> 1, axes2 -> 2, axes3 -> 3)
    storage <- Seq(DoubleStorage, Int64Storage, WeightStorage, MeanStorage,
      WeightedMeanStorage)
    parts <- Seq(1, 4, 7)
  } test(s"grid: ${d}D ${storage} partitions=$parts matches Scala oracle") {
    val useW = storage == DoubleStorage || storage == WeightStorage ||
      storage == WeightedMeanStorage
    val useS = storage == MeanStorage || storage == WeightedMeanStorage
    val df = raw.toDF("x", "y", "z", "w", "s").repartition(parts)
    val cols = Seq(col("x"), col("y"), col("z")).take(d)
    val got = Hist.fill(HistSpec(axes, storage), df, cols,
        weight = if (useW) Some(col("w")) else None,
        sample = if (useS) Some(col("s")) else None)
      .collect().map { r =>
        val k = (0 until d).map(r.getLong).toList
        val nStates = storage.stateCols.size
        val st: Seq[Double] = (0 until nStates).map { j =>
          r.get(d + j) match {
            case l: java.lang.Long => l.doubleValue()
            case x: java.lang.Double => x.doubleValue()
            case other => fail(s"unexpected state type $other")
          }
        }
        k -> st
      }.toMap
    val exp = expected(axes, useW, useS, storage)
    assert(got.keySet == exp.keySet)
    exp.foreach { case (k, vs) =>
      vs.zip(got(k)).zipWithIndex.foreach { case ((e, g), j) =>
        assert(math.abs(e - g) <= 1e-9 * math.max(1.0, math.abs(e)),
          s"bin $k state ${storage.stateCols(j)}: expected $e got $g")
      }
    }
  }
}

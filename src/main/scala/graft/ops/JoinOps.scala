package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-shape utilities for skewed data — the join-side complement to
  * [[DedupOps.exactDedupSalted]]'s skewed aggregation.
  */
object JoinOps {

  /** Salted inner equi-join for a SKEWED left side: a hot key (one user
    * with 10^8 events, one viral document) sends every matching left row
    * to ONE reducer in a plain shuffle join. Salting splits each left
    * key's rows across `salts` sub-keys and replicates the right side
    * once per salt, so the hot key's rows spread over `salts` reducers.
    * Result is EXACTLY the plain inner join (every left row still meets
    * every matching right row — its salt's replica).
    *
    * Cost: right side is scanned/shuffled `salts` times — use when the
    * right side is far smaller than the hot key's row count but too big
    * to broadcast (the broadcast join is the better answer below that,
    * and AQE's skew-join handles the sort-merge case when it can; this
    * operator is the explicit, planner-independent form).
    *
    * The salt is a DETERMINISTIC hash of the left row's content (not
    * `monotonically_increasing_id`, which changes across partial stage
    * retries — an indeterminate shuffle key risks lost/duplicated rows
    * when only some map tasks are recomputed, the SPARK-23207 class of
    * bug). Identical rows share a salt; that residual skew is bounded by
    * the multiplicity of fully-identical rows. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val saltCol = "__graft_join_salt"
    require(!left.columns.contains(saltCol) && !right.columns.contains(saltCol),
      s"inputs must not already carry a $saltCol column")
    val sl = left.withColumn(saltCol,
      pmod(xxhash64(left.columns.map(col): _*), lit(salts.toLong)))
    val sr = right.withColumn(saltCol,
      explode(sequence(lit(0L), lit(salts - 1L))))
    sl.join(sr, Seq(key, saltCol)).drop(saltCol)
  }
}

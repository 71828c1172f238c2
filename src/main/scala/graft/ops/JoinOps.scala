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
    * The salt is uniform per-row and need not be deterministic across
    * task retries: the right side carries EVERY salt value, so any
    * assignment yields the same join result. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val sl = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val sr = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    sl.join(sr, Seq(key, "__salt")).drop("__salt")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join helper (SURVEY.md §4.2, prompt's "salting for
  * skew"): when one join key carries a disproportionate share of rows,
  * a plain shuffle join sends the whole hot key to one task. Salting
  * splits the hot side's key into `salts` sub-keys and replicates the
  * build side across all salt values — the classic pre-AQE remedy, and
  * still the right tool when AQE's skew-join splitting can't apply
  * (e.g. aggregations after the join, or non-sort-merge plans).
  */
object Skew {

  /** Inner equi-join of `fact` (potentially skewed on `key`) with
    * `dim`, salted `salts` ways. Result is identical to
    * `fact.join(dim, key)` — only the physical distribution changes:
    * the hot key's rows spread across `salts` tasks.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    // salt MUST be deterministic per row content: a salt derived from
    // monotonically_increasing_id/rand changes when a map stage is
    // recomputed after a fetch failure, double-counting or dropping
    // rows whose reducers already committed. Hashing the row's own
    // columns is stable under any retry/speculation.
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin: a __salt column already exists on an input — it would be " +
        "silently overwritten and dropped; rename it first")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.toIndexedSeq.map(col): _*), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
